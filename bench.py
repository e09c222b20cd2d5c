"""Headline benchmark — prints ONE JSON line.

Metric: effective weight bandwidth of the flagship mmq_q4_k kernel on the
BASELINE config (4096x4096 GEMM, 16 decode tokens): GGUF weight bytes read
per second of kernel time. `vs_baseline` is the speedup over the
non-quantized path — the same decode GEMM from bf16 weights via XLA's native
matmul on the same chip (which reads 3.6x the bytes per token).

Timing methodology (this environment's TPU is behind a relay where
`block_until_ready` returns before the device is done and a device->host
readback costs ~29 ms): run the op in a jit'd fori_loop with a loop-carried
data dependency (so XLA cannot collapse iterations algebraically or DCE the
matmul down to the consumed slice), consume the FULL output into an f32
accumulator, sync via np.asarray readback, and report the slope
(T(hi_iters) - T(lo_iters)) / (hi - lo) — median over repeats — which
cancels the fixed relay/dispatch cost.

Run `python benchmarks/suite.py` for the full per-format sweep.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gguf_tpu.utils.benchmark import mmq_loop, slope_time

    from gguf_tpu.ops import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import to_soa

    m = k = 4096
    n = 16
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, k)).astype(np.float16)
    w = jax.device_put(to_soa("q4_k", quantize_q4_k(a), m, k))
    wbytes = m * (k // 256) * 144
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    # the shared loop-carried-dependency recipe (one definition; see
    # gguf_tpu/utils/benchmark.py for why naive timing is invalid here)
    t_mmq = slope_time(
        mmq_loop(lambda w_, x_: mmq_q4_k(w_, x_, precision="fast",
                                         act_quant=False), n, m, x0),
        (w, x0))

    # baseline: the same decode GEMM from bf16 weights (what a non-quantized
    # serving stack pays per token), XLA native matmul, same harness
    wb16 = jnp.asarray(rng.standard_normal((k, m)), jnp.bfloat16)
    xb = x0.astype(jnp.bfloat16)

    def mk_ref(iters):
        def many(w, x):
            def body(i, carry):
                acc, xx = carry
                out = (xx @ w).astype(jnp.float32)
                return acc + out, x + (acc[:, :1] * 1e-30).astype(jnp.bfloat16)
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((n, m), jnp.float32), x))
            return acc.sum()
        return many

    t_ref = slope_time(mk_ref, (wb16, xb))

    print(json.dumps({
        "metric": "mmq_q4_k 4096x4096 GEMM @16 decode tokens, effective weight bandwidth",
        "value": round(wbytes / t_mmq / 1e9, 2),
        "unit": "GB/s",
        "vs_baseline": round(t_ref / t_mmq, 3),
    }))


if __name__ == "__main__":
    main()
