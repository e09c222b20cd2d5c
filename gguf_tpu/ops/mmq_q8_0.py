"""Fused dequantize+matmul for Q8_0 weights.

Capability match of /root/reference/kernels/mmq_q8_0.py (mmq_q8_0_triton :14,
mmq_q8_0 :102): C = (A @ B.T).T, A = Q8_0 (M, K) weights, B = (N, K) float,
output (N, M). K must be a multiple of 32 (reference :124).

Same TPU-first structure as mmq_q4_k.py (see design notes there): K-major SoA
weight tiles via BlockSpecs, per-32-block fp16 scales widened to f32 in
integer ops and expanded bit-exactly with the bf16x3 selector matmul, one
large MXU contraction per grid step with an f32 VMEM accumulator, activation
quantization hoisted out of the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layouts import QuantTensor
from .activation import fake_quantize_q8_1
from .common import (
    choose_bm, fp16_bits_to_f32, pad_cols, pad_rows, pick_block,
    round_up, running_interpreted,
)

BLOCK = 32


def _kernel(fast, d_ref, qs_ref, b_ref, out_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = fp16_bits_to_f32(d_ref[:])                  # (TK/32, TM)
    nb, tm = d.shape
    q = qs_ref[:].astype(jnp.float32)
    w = (q.reshape(nb, BLOCK, tm) * d[:, None, :]).reshape(nb * BLOCK, tm)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        b_ref[:], wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act_quant", "block_m", "block_k", "out_dtype", "precision"),
)
def mmq_q8_0(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for Q8_0 weights A (M, K SoA) and float B (N, K)."""
    assert w.fmt == "q8_0"
    m, k = w.shape
    n = b.shape[0]
    assert b.shape[1] == k, (b.shape, w.shape)
    assert k % BLOCK == 0, f"K must be a multiple of {BLOCK}, got {k}"
    assert block_m % 128 == 0

    if act_quant:
        b = fake_quantize_q8_1(b)
    fast = precision == "fast"
    b = b.astype(jnp.bfloat16 if fast else jnp.float32)

    # N-tiling: prefill (large B*T) must be tiled or the accumulator and
    # dequant intermediates overflow the ~16MB VMEM budget
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    b = pad_rows(b, n_pad)
    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    # the d tile needs >= 8 sublanes (bk/32 >= 8) unless it spans the full K
    bk = pick_block(k, block_k, 256) if k % 256 == 0 and k >= 256 else k

    d_bits = pad_cols(w.d_bits, m_pad)
    qs = pad_cols(w.qs, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    out = pl.pallas_call(
        functools.partial(_kernel, fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk // BLOCK, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * (k // BLOCK) * 34 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, qs, b)

    return out[:n, :m]
