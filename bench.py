"""Headline benchmark — prints ONE JSON line.

Metric: effective weight bandwidth of the flagship mmq_q4_k kernel on the
BASELINE config (4096x4096 GEMM, 16 decode tokens): GGUF weight bytes read
per second of kernel time. `vs_baseline` is the speedup over what the
non-quantized path would do — the same GEMM from bf16 weights via XLA's
native matmul on the same chip (reads 3.6x the bytes). Timing runs on-device
(kernel looped inside one jit) because each dispatch through this
environment's TPU relay costs ~25 ms from the host.

Run `python benchmarks/suite.py` for the full per-format sweep.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gguf_tpu.ops import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import to_soa

    _ = np.asarray(jnp.zeros((1, 1)))  # absorb the relay's first-d2h cost

    m = k = 4096
    n = 16
    iters = 50
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, k)).astype(np.float16)
    w = jax.device_put(to_soa("q4_k", quantize_q4_k(a), m, k))
    wbytes = m * (k // 256) * 144
    b = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    def timed(fn, *args):
        def many(*args):
            def body(i, acc):
                return acc + fn(i, *args)
            return jax.lax.fori_loop(0, iters, body, 0.0)

        f = jax.jit(many)
        f(*args).block_until_ready()
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            f(*args).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_mmq = timed(
        lambda i, w, b: mmq_q4_k(
            w, b + i.astype(jnp.float32) * 1e-8, precision="fast",
            act_quant=False)[0, 0],
        w, b)

    # baseline: the same decode GEMM from bf16 weights (what a non-quantized
    # serving stack pays), XLA native matmul
    wb16 = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32)).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    t_ref = timed(
        lambda i, wb16, bb: ((bb + i.astype(jnp.bfloat16) * 1e-8) @ wb16)[0, 0].astype(jnp.float32),
        wb16, bb)

    print(json.dumps({
        "metric": "mmq_q4_k 4096x4096 GEMM @16 decode tokens, effective weight bandwidth",
        "value": round(wbytes / t_mmq / 1e9, 2),
        "unit": "GB/s",
        "vs_baseline": round(t_ref / t_mmq, 3),
    }))


if __name__ == "__main__":
    main()
