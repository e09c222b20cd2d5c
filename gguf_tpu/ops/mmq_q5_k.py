"""Fused dequantize+matmul for Q5_K weights.

No counterpart exists in the reference (it stops at Q8_0/Q4_K/Q6_K); this
extends the same TPU-first kernel family (see mmq_q4_k.py for the design
notes) to llama.cpp's Q5_K, completing Q5_K_M checkpoint support.

Identical structure to mmq_q4_k — Q5_K shares Q4_K's affine sub-block math
x = d*sc*q - dmin*mn, 6-bit scale packing, the bsum min-term trick, AND the
plane qs layout (quant/layouts.py _repack_nibbles_plane) with its
pltpu.repeat tiled scale multiply and activation permutation
(permute_acts_q4k — same nibble structure, same transpose). The only
addition is the 5th code bit: qh byte row j holds, at bit b, the 5th bit
of the element landing at unpack row b*32 + j, so the 8-way bitplane
shift/mask concatenates in the SAME plane-row order as the nibbles.
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
    choose_bm, pad_cols, pad_rows, pick_block,
    regroup_rows, round_up, running_interpreted,
)
from .mmq_q4_k import (
    INK_GLUE_MAX_N, _ink_b_prep, _plane_perm_np, _scale_prep,
    permute_acts_q4k,
)

QK_K = 256


def _unpack_scaled_q5(sbt, qs_ref, qh_ref, scale32, min32):
    """Plane unpack + affine dequant (same structure as mmq_q4_k): every
    row's 32-block id is (row % 8), so the per-32 scale AND min are
    copy-tiles and the min rides the scale multiply as an fma (zero extra
    per-element ops — the r4 min-fold, mmq_q4_k.py:_unpack_scaled); the
    5th bit comes from qh's 8-way bitplane in the same plane-row order."""
    lo_i = qs_ref[:].astype(jnp.int32)                       # (SBt*128, TM)
    hi_i = qh_ref[:].astype(jnp.int32)                       # (SBt*32, TM)
    parts = []
    for s in range(sbt):
        sl = lo_i[s * 128:(s + 1) * 128, :]
        hs = hi_i[s * 32:(s + 1) * 32, :]
        se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
        me = pltpu.repeat(min32[s * 8:(s + 1) * 8, :], 16, axis=0)
        # micro elision (r5): bit 7 needs no mask on u8 sources
        f_lo = jnp.concatenate([(hs >> b) & 1 for b in range(4)], axis=0)
        f_hi = jnp.concatenate(
            [(hs >> b) & 1 for b in range(4, 7)] + [hs >> 7], axis=0)
        q_lo = (sl & 0xF) | (f_lo << 4)
        q_hi = (sl >> 4) | (f_hi << 4)
        parts.append(q_lo.astype(jnp.float32) * se - me)
        parts.append(q_hi.astype(jnp.float32) * se - me)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _kernel(fast, sbt, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, qh_ref,
            b_ref, out_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale32, min32 = _scale_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    w = _unpack_scaled_q5(sbt, qs_ref, qh_ref, scale32, min32)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        b_ref[:], wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_ink(fast, sbt, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, qh_ref,
                b_ref, p_ref, out_ref, acc_ref):
    """Decode-width variant: natural-order f32 b; plane permute + bsum +
    bf16 cast in-kernel (mmq_q4_k.py module docstring)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale32, min32 = _scale_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    w = _unpack_scaled_q5(sbt, qs_ref, qh_ref, scale32, min32)
    bp = _ink_b_prep(fast, sbt, b_ref, p_ref)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        bp.astype(wd.dtype), wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act_quant", "block_m", "block_k", "out_dtype", "precision"),
)
def mmq_q5_k(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for Q5_K weights A (M, K SoA) and float B (N, K)."""
    assert w.fmt == "q5_k"
    m, k = w.shape
    n = b.shape[0]
    assert b.shape[1] == k, (b.shape, w.shape)
    assert k % QK_K == 0, f"K must be a multiple of {QK_K}, got {k}"
    assert block_m % 128 == 0

    if act_quant and precision == "high" and n <= 16:
        # int8-MXU block-partial contract path (mmq_q4_k.py:_kernel_i8):
        # q5_k rides the q4_k machinery with the fifth-bit plane added
        # in-kernel — codes 0..31 exact in int8
        from .mmq_q4_k import _mmq_q4_k_i8

        return _mmq_q4_k_i8(w, b, block_m, block_k, out_dtype)

    if act_quant:
        b = fake_quantize_q8_1(b)
    b = b.astype(jnp.float32)
    fast = precision == "fast"
    # N-tiling: decode fits one tile; prefill (large B*T) must be tiled or
    # the dequant intermediates + accumulator overflow the ~16MB VMEM budget
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    ink = n_pad <= INK_GLUE_MAX_N
    if ink:
        b = pad_rows(b, n_pad)
    else:
        b = permute_acts_q4k(b)  # plane qs layout, same pattern as q4_k
        if fast:
            b = b.astype(jnp.bfloat16)
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
    qh = pad_cols(w.qh, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    specs = [
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
    ]
    if ink:
        kern = functools.partial(_kernel_ink, fast, sbt)
        specs.append(pl.BlockSpec((QK_K, QK_K), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        tail = (jnp.asarray(_plane_perm_np(), jnp.bfloat16),)
    else:
        kern = functools.partial(_kernel, fast, sbt)
        tail = ()

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * sb * 176 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, dmin_bits, sc, mn, qs, qh, b, *tail)

    return out[:n, :m]
