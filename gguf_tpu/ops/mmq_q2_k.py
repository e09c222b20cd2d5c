"""Fused dequantize+matmul for Q2_K weights.

There is no Q2_K kernel in the upstream reference (its MMQ family stops at
Q8_0/Q4_K/Q6_K — /root/reference/kernels/); this extends the same kernel
contract (mmq_q4_k.py:240: C = (A @ B.T).T, A = quantized (M, K) weights,
B = (N, K) float activations) to llama.cpp's smallest K-quant.

Shape notes vs mmq_q4_k.py: Q2_K's affine params (scale AND min) are per
16 elements — twice the granularity of Q4_K — so the broadcast-multiply
views are (SBt*16, 16, TM) and the min-term matmul contracts over K/16-row
activation sums. The 2-bit codes unpack 4-per-byte with a whole-tile
shift/mask concat (common.py:unpack_crumbs_tile); at 2 bits there is no
second bit plane, making this the cheapest dequant chain of the family
(2 VPU ops per code vs 3-4 for the 4/5/6-bit formats).
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
    choose_bm, fp16_bits_to_f32, ink_block_sums, pad_cols, pad_rows,
    pick_block, regroup_rows, round_up, running_interpreted,
    unpack_crumbs_tile,
)
from .mmq_q4_k import INK_GLUE_MAX_N

QK_K = 256


def _affine16_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref):
    """Per-16-block affine params, f32: scale = d*sc, min = dmin*mn (the
    per-superblock fp16 d/dmin rows come 8-row padded per K-step)."""
    d = fp16_bits_to_f32(d_ref[:sbt, :])                     # (SBt, TM)
    dmin = fp16_bits_to_f32(dmin_ref[:sbt, :])
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)     # (SBt*16, TM)
    mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
    tm = sc.shape[-1]
    scale16 = (d[:, None, :] * sc.reshape(sbt, 16, tm)).reshape(sbt * 16, tm)
    min16 = (dmin[:, None, :] * mn.reshape(sbt, 16, tm)).reshape(sbt * 16, tm)
    return scale16, min16


def _kernel(fast, ink, sbt, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, b_ref,
            *rest):
    # rest = (bsum_ref, out_ref, acc_ref) in glue mode / (out_ref, acc_ref)
    # in ink mode (bsum computed in-kernel from the natural-order b tile)
    bsum_ref = None if ink else rest[0]
    out_ref, acc_ref = rest[-2], rest[-1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale16, min16 = _affine16_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    tm = scale16.shape[-1]
    q = unpack_crumbs_tile(qs_ref[:], sbt).astype(jnp.float32)   # (TK, TM)
    w = (q.reshape(sbt * 16, 16, tm) * scale16[:, None, :]).reshape(sbt * 256, tm)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    if ink:   # decode path: bsum + bf16 cast in-kernel (q2_k has no
        # activation permute — its unpack lands in element order)
        bt = b_ref[:]                                        # (BN, BK) f32
        bsum = ink_block_sums(bt, sbt * 16, 4)               # (BN, SBt*16)
        bb = bt.astype(wd.dtype)
        min_dims = (((1,), (0,)), ((), ()))
    else:
        bb = b_ref[:]
        bsum = bsum_ref[:]
        min_dims = (((0,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        bb, wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # min term: bsum x min16 -> (N, TM)
    acc_ref[:] -= jax.lax.dot_general(
        bsum, min16, min_dims,
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act_quant", "block_m", "block_k", "out_dtype", "precision"),
)
def mmq_q2_k(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for Q2_K weights A (M, K SoA layout) and float B (N, K).

    Returns (N, M). K must be a multiple of 256 (the superblock size).
    precision='high' keeps f32 MXU passes; 'fast' uses single-pass bf16.
    """
    assert w.fmt == "q2_k"
    m, k = w.shape
    n = b.shape[0]
    assert b.shape[1] == k, (b.shape, w.shape)
    assert k % QK_K == 0, f"K must be a multiple of {QK_K}, got {k}"
    assert block_m % 128 == 0

    if act_quant:
        b = fake_quantize_q8_1(b)
    b = b.astype(jnp.float32)
    fast = precision == "fast"
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    ink = n_pad <= INK_GLUE_MAX_N
    if ink:
        bsum_t = None
    else:
        # per-16-block activation sums for the min term (exact: fake-
        # quantized values are d*q, so the half-block sum = dB*sum_16(qb))
        bsum = jnp.sum(b.reshape(n, k // 16, 16), axis=-1)
        if fast:
            b = b.astype(jnp.bfloat16)
        bsum_t = pad_rows(bsum, n_pad).T                     # (K/16, n_pad)
    b = pad_rows(b, n_pad)

    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K
    sb = k // QK_K

    g8 = max(8, round_up(sbt, 8))
    steps = k // bk
    d_bits = regroup_rows(pad_cols(w.d_bits, m_pad), sbt, steps, g8)
    dmin_bits = regroup_rows(pad_cols(w.dmin_bits, m_pad), sbt, steps, g8)
    sc = pad_cols(w.sc, m_pad)
    mn = pad_cols(w.mn, m_pad)
    qs = pad_cols(w.qs, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    specs = [
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 16, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 16, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 4, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
    ]
    tail = ()
    if not ink:
        specs.append(pl.BlockSpec((sbt * 16, bn), lambda ni, i, j: (j, ni),
                                  memory_space=pltpu.VMEM))
        tail = (bsum_t,)

    out = pl.pallas_call(
        functools.partial(_kernel, fast, ink, sbt),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * sb * 84 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, dmin_bits, sc, mn, qs, b, *tail)

    return out[:n, :m]
