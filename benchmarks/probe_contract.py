"""Round-4 probe: decompose the reference-numeric-contract path's cost.

VERDICT r3 #3b: act_quant=q8_1 + precision=high runs q4_k at 149.6 GB/s vs
419 fast — 2.8x. Two suspects, measured here by differencing the 2x2 combo
(interleaved round-robin, one session):

  fake-quant overhead = t(act=T, fast) - t(act=F, fast)
      the XLA-side Q8_1 fake-quant chain (ops/activation.py) on the tiny
      (16, K) activation — FLOP-free but a long op chain per call.
  HIGHEST-dot overhead = t(act=F, high) - t(act=F, fast)
      precision=high keeps f32 operands through the MXU (bf16x3-style
      multi-pass); the dot is the kernel's largest single cost at n=16, so
      3 passes ~ 3x dot time — an algebraic floor for f32-exact results
      (2 bf16 operand splits still need 3 cross products).

Context for the fix: the reference contract itself is 1%-of-max tolerance
vs the byte-exact golden (/root/reference/utils/test_utils.py:4-8;
test_mmq_q4_k.py:40); exact Q8_1 fake-quant + bf16 dots (act=T, fast)
stays well inside it (bf16 operand rounding ~2^-9 relative), so that combo
is the fast implementation of the reference contract, with act=T+high kept
as the f32-exactness mode.

Usage: python -u benchmarks/probe_contract.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[probe {time.time()-t0:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.ops.mmq_q4_k import mmq_q4_k
from gguf_tpu.quant import quantize_q4_k
from gguf_tpu.quant.layouts import q4_k_to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

M = K = 4096
N = 16
WBYTES = M * (K // 256) * 144


def emit(obj):
    print(json.dumps(obj), flush=True)


def main():
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")

    rng = np.random.default_rng(3)
    wq = quantize_q4_k(rng.standard_normal((M, K)).astype(np.float32))
    soa = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, M, K))
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    log("weights ready")

    combos = {
        "aF_fast": dict(act_quant=False, precision="fast"),
        "aT_fast": dict(act_quant=True, precision="fast"),
        "aF_high": dict(act_quant=False, precision="high"),
        "aT_high": dict(act_quant=True, precision="high"),
    }
    results = {k: [] for k in combos}
    for rnd in range(3):
        for name, kw in combos.items():
            op = functools.partial(mmq_q4_k, **kw)
            try:
                sec = slope_time(
                    mmq_loop(lambda w_, x_: op(w_, x_), N, M, x),
                    (soa, x), lo=10, hi=110)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({WBYTES/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:200]}")
                results[name].append(None)
    med = {}
    for name, secs in results.items():
        good = [s for s in secs if s]
        if not good:
            emit({"probe": f"contract {name}", "error": "all rounds failed"})
            continue
        med[name] = float(np.median(good))
        emit({"probe": f"contract {name}",
              "us_median": round(med[name] * 1e6, 2),
              "gbps_median": round(WBYTES / med[name] / 1e9, 1),
              "us_rounds": [round(s * 1e6, 2) for s in good],
              "shape": "4096x4096 n=16 q4_k"})
    if len(med) == 4:
        emit({"probe": "contract decomposition",
              "fakequant_overhead_us":
                  round((med["aT_fast"] - med["aF_fast"]) * 1e6, 2),
              "highest_dot_overhead_us":
                  round((med["aF_high"] - med["aF_fast"]) * 1e6, 2),
              "interaction_us": round(
                  (med["aT_high"] - med["aT_fast"] - med["aF_high"]
                   + med["aF_fast"]) * 1e6, 2)})


if __name__ == "__main__":
    main()
