"""Round-3 probe: is the plane layout's activation lane-permute eating the
kernel win? Interleaved in one session:

  new        shipped mmq_q4_k (plane layout, permute included)
  new_noperm shipped kernel with permute_acts_q4k monkeypatched to identity
             (math-wrong, timing-valid) — isolates the permute cost
  old        the pre-plane kernel (git 576956e) on the old element-order
             layout (reconstructed from disk bytes)
  perm_alone the bare permute_acts_q4k on (16, 4096) f32 in a fori_loop

Usage: python -u benchmarks/probe_permute_cost.py
"""

import functools
import importlib.util
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[probe {time.time()-t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


import jax
import jax.numpy as jnp

from gguf_tpu.quant import quantize_q4_k
from gguf_tpu.quant.layouts import q4_k_to_soa, QuantTensor
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

M = K = 4096
N = 16
WBYTES = M * (K // 256) * 144
rng = np.random.default_rng(0)
a = rng.standard_normal((M, K)).astype(np.float16)
qb = quantize_q4_k(a)
w_new = jax.device_put(q4_k_to_soa(qb, M, K))
x0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))

# old kernel module + old layout (reconstruct: its to_soa differs only in
# qs packing — emulate by re-packing the plane qs back to the old order)
spec = importlib.util.spec_from_file_location("old_mmq", "/tmp/old_mmq_q4_k.py")
old_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_mod)
from gguf_tpu.quant.layouts import _unpack_nibbles_plane, _repack_nibbles

qs_plane = np.asarray(w_new.qs).T.reshape(-1, 128)       # (nb, 128)
codes = _unpack_nibbles_plane(qs_plane)                  # element order
qs_old = _repack_nibbles(codes).reshape(M, K // 2)
w_old = QuantTensor(fmt="q4_k", d_bits=w_new.d_bits,
                    dmin_bits=w_new.dmin_bits, sc=w_new.sc, mn=w_new.mn,
                    qs=jax.device_put(jnp.asarray(
                        np.ascontiguousarray(qs_old.T))))


def timed(op, w):
    return slope_time(mmq_loop(op, N, M, x0), (w, x0), reps=3)


def run_variants():
    import gguf_tpu.ops.mmq_q4_k as mq

    new_op = functools.partial(mq.mmq_q4_k, act_quant=False,
                               precision="fast")
    old_op = functools.partial(old_mod.mmq_q4_k, act_quant=False,
                               precision="fast")

    results = {"new": [], "new_noperm": [], "old": [], "perm_alone": []}

    # no-perm variant: monkeypatch the module-level permute to identity
    # before the fresh jit traces (math-wrong, timing-valid)
    real_perm = mq.permute_acts_q4k
    f_noperm = functools.partial(mq.mmq_q4_k.__wrapped__, act_quant=False,
                                 precision="fast", block_m=2048,
                                 block_k=1024, out_dtype=jnp.float32)
    noperm_op = jax.jit(lambda w, x: f_noperm(w, x))

    def perm_loop(iters):
        def many(x):
            def body(i, carry):
                acc, xx = carry
                out = real_perm(xx)
                return acc + out, x + acc[:1, :1] * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, K), jnp.float32), x))
            return acc.sum()
        return many

    for rnd in range(3):
        mq.permute_acts_q4k = real_perm
        t = timed(new_op, w_new)
        results["new"].append(t)
        log(f"round {rnd} new: {t*1e6:.2f} us ({WBYTES/t/1e9:.0f} GB/s)")

        mq.permute_acts_q4k = lambda b: b
        t = timed(noperm_op, w_new)
        results["new_noperm"].append(t)
        log(f"round {rnd} new_noperm: {t*1e6:.2f} us "
            f"({WBYTES/t/1e9:.0f} GB/s)")
        mq.permute_acts_q4k = real_perm

        t = timed(old_op, w_old)
        results["old"].append(t)
        log(f"round {rnd} old: {t*1e6:.2f} us ({WBYTES/t/1e9:.0f} GB/s)")

        t = slope_time(perm_loop, (x0,), reps=3)
        results["perm_alone"].append(t)
        log(f"round {rnd} perm_alone: {t*1e6:.2f} us")

    for name, secs in results.items():
        med = float(np.median(secs))
        out = {"probe": f"permute_cost {name}",
               "us_median": round(med * 1e6, 2),
               "us_rounds": [round(s * 1e6, 2) for s in secs]}
        if name != "perm_alone":
            out["gbps_median"] = round(WBYTES / med / 1e9, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    run_variants()
