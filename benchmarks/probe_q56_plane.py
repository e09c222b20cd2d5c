"""Time the plane-layout q4_k/q5_k/q6_k kernels in one session (3 rounds
round-robin) — the r2 archived numbers for comparison: q4_k 419-464,
q5_k 299-356, q6_k 364-395 GB/s at 4096x4096.

Usage: python -u benchmarks/probe_q56_plane.py
"""

import functools
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

from gguf_tpu.ops import MMQ
from gguf_tpu.quant import (quantize_q4_k, quantize_q5_k, quantize_q6_k,
                            quantize_q8_0)
from gguf_tpu.quant.layouts import to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

M = K = 4096
N = 16
BYTES = {"q8_0": (K // 32) * 34, "q4_k": (K // 256) * 144,
         "q5_k": (K // 256) * 176, "q6_k": (K // 256) * 210}
QUANTS = {"q8_0": quantize_q8_0, "q4_k": quantize_q4_k,
          "q5_k": quantize_q5_k, "q6_k": quantize_q6_k}

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, K)).astype(np.float16)
    x0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    ws = {f: jax.device_put(to_soa(f, q(a), M, K))
          for f, q in QUANTS.items()}
    results = {f: [] for f in QUANTS}
    for rnd in range(3):
        for fmt, w in ws.items():
            op = functools.partial(MMQ[fmt], precision="fast",
                                   act_quant=False)
            sec = slope_time(mmq_loop(op, N, M, x0), (w, x0))
            results[fmt].append(sec)
            log(f"round {rnd} {fmt}: {sec*1e6:.2f} us "
                f"({M*BYTES[fmt]/sec/1e9:.0f} GB/s)")
    for fmt, secs in results.items():
        med = float(np.median(secs))
        print(json.dumps({
            "probe": f"plane-layout mmq_{fmt} 4096x4096 @ n=16",
            "us_median": round(med * 1e6, 2),
            "gbps_median": round(M * BYTES[fmt] / med / 1e9, 1),
            "us_rounds": [round(s * 1e6, 2) for s in secs]}), flush=True)
