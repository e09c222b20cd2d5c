"""Multi-host bootstrap: jax.distributed + slice-health check.

The reference has no distributed story at all (SURVEY.md §5); the north star
needs 2-host v5e serving. JAX's builtin runtime is the TPU-native backend:
`jax.distributed.initialize` wires the hosts over DCN, after which
`jax.devices()` spans the full slice and the pjit/shard_map code in
parallel/tp.py runs unchanged — XLA routes the psum/all-gather collectives
over ICI within a host and DCN across hosts.

Usage (same binary on every host):

    from gguf_tpu.parallel import init_distributed, make_mesh
    init_distributed()                       # env-driven on Cloud TPU
    mesh = make_mesh(tp=jax.device_count())  # or tp x dp of your choice

For non-TPU-VM setups pass coordinator_address/num_processes/process_id
explicitly (mirrors jax.distributed.initialize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     health_check: bool = True,
                     initialization_timeout: int = 300) -> dict:
    """Initialize the multi-host runtime and (optionally) run a whole-slice
    health check. Returns a summary dict. Safe to call single-host (no-op
    when jax.process_count() stays 1 and no coordinator is given).

    initialization_timeout bounds how long ranks wait for missing peers at
    bring-up (passed through to jax.distributed.initialize); a dead host is
    a RuntimeError here, not an indefinite hang at the first collective."""
    # env check first: jax.process_count() would initialize the XLA backend
    # and make jax.distributed.initialize() unusable afterwards
    if coordinator_address or num_processes or _looks_multihost():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=initialization_timeout)

    info = {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
    if health_check and info["global_devices"] > 1:
        info["psum_ok"] = _psum_health_check()
    return info


def _looks_multihost() -> bool:
    """Environment says this process is part of a multi-host slice. Cloud
    TPU pods usually set no COORDINATOR_ADDRESS — JAX auto-discovers peers
    from TPU metadata — so also trigger on the TPU pod variables the VM
    images export (missing any of these silently left a pod running as N
    independent single-host processes)."""
    import os

    def multi(var):  # comma-separated peer list with >1 entry
        v = os.environ.get(var, "")
        return len([h for h in v.split(",") if h.strip()]) > 1

    return bool(os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_NUM_SLICES")
                or multi("TPU_WORKER_HOSTNAMES")
                or multi("TPU_PROCESS_ADDRESSES"))


def _psum_health_check() -> bool:
    """One tiny psum across every chip in the slice: catches a dead ICI
    link / wedged host before a model load is attempted. The input is
    built per-process from host-local data (a plain host array cannot be
    fed to a mesh containing other hosts' non-addressable devices)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))

    def f(x):
        return jax.lax.psum(x, "all")

    sharding = NamedSharding(mesh, P("all"))
    if jax.process_count() > 1:
        x = jax.make_array_from_process_local_data(
            sharding, np.ones(len(jax.local_devices()), np.int32),
            (len(devs),))
    else:
        x = jax.device_put(jnp.ones(len(devs), jnp.int32), sharding)
    got = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("all"),
                                out_specs=P()))(x)
    return int(np.asarray(got)[0]) == len(devs)
