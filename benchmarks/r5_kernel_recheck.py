"""Round-5 recheck: q2_k/q3_k with the constant-indicator bsum (same-stage
vs the suite numbers measured minutes earlier with the iota form), plus
the per-format tile sanity VERDICT r4 #7 asks for (q8_0/q6_k/q2_k at the
7B decode shape: capped-table (4096, 1024) vs the (2048, 1024) default —
the table was swept on q4_k only).

Usage: python -u benchmarks/r5_kernel_recheck.py
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

from gguf_tpu.ops import MMQ
from gguf_tpu.quant import (quantize_q2_k, quantize_q3_k, quantize_q6_k,
                            quantize_q8_0)
from gguf_tpu.quant.layouts import to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

M, K, N = 4096, 4096, 16
BPB = {"q2_k": 84, "q3_k": 110, "q6_k": 210, "q8_0": 34 * 8}
QUANT = {"q2_k": quantize_q2_k, "q3_k": quantize_q3_k,
         "q6_k": quantize_q6_k, "q8_0": quantize_q8_0}
rng = np.random.default_rng(9)


def emit(obj):
    print(json.dumps(obj), flush=True)


def build(fmt):
    a = rng.standard_normal((M, K)).astype(np.float16)
    w = jax.device_put(to_soa(fmt, QUANT[fmt](a), M, K))
    x0 = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    return w, x0


if __name__ == "__main__":
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")
    jobs = []
    for fmt in ("q2_k", "q3_k", "q6_k", "q8_0"):
        w, x0 = build(fmt)
        tiles = [(2048, 1024), (4096, 1024)]
        for bm, bk in tiles:
            op = functools.partial(MMQ[fmt], act_quant=False,
                                   precision="fast", block_m=bm, block_k=bk)
            jobs.append((f"{fmt} bm={bm} bk={bk}", fmt, op, w, x0))
    results = {name: [] for name, *_ in jobs}
    for rnd in range(3):
        for name, fmt, op, w, x0 in jobs:
            try:
                sec = slope_time(mmq_loop(op, N, M, x0), (w, x0), reps=3)
                results[name].append(sec)
                wb = M * (K // 256) * BPB[fmt]
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({wb/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:250]}")
    for name, secs in results.items():
        good = [x for x in secs if x]
        fmt = name.split()[0]
        wb = M * (K // 256) * BPB[fmt]
        if not good:
            emit({"probe": f"r5recheck {name}", "error": "all failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"r5recheck {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(wb / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in good],
              "shape": f"{M}x{K} n={N}"})
