"""Fused dequantize+matmul for Q2_K weights.

There is no Q2_K kernel in the upstream reference (its MMQ family stops at
Q8_0/Q4_K/Q6_K — /root/reference/kernels/); this extends the same kernel
contract (mmq_q4_k.py:240: C = (A @ B.T).T, A = quantized (M, K) weights,
B = (N, K) float activations) to llama.cpp's smallest K-quant.

Round-4 rework (VERDICT r3 #4 — q2_k was the slowest kernel of the 12 at
180-233 GB/s): the qs codes now live in PLANE order (layouts.py
_Q23_PLANE_E — unpacked row u of a superblock carries element
(u%16)*16 + (u//64)*4 + (u%64)//16, so every row's 16-block id is u%16).
The per-16 scale/min multiply then becomes a pltpu.repeat copy-tile per
64-row crumb plane instead of the (SBt*16, 16, TM) reshape-broadcast the
round-2 kernel used — the same Mosaic-lowering win the Q4_K/Q6_K plane
layouts measured (~14%, benchmarks/probe_q4k_ab.py). The matching
activation-column permutation runs as one XLA transpose at prefill widths
and as an in-kernel (N, 256) x (256, 256) 0/1-matrix MXU matmul at decode
widths (exact selection — mmq_q4_k.py ink path rationale).

Shape notes vs mmq_q4_k.py: Q2_K's affine params (scale AND min) are per
16 elements — twice the granularity of Q4_K — so the min-term matmul
contracts over K/16-row activation sums. At 2 bits there is no second bit
plane, making this the cheapest dequant chain of the family.
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
    block16_indicator as _block16_indicator,
    choose_bm, fp16_bits_to_f32, pad_cols, pad_rows,
    pick_block, regroup_rows, round_up, running_interpreted,
)
from .mmq_q4_k import INK_GLUE_MAX_N

QK_K = 256


def permute_acts_q23(b: jax.Array) -> jax.Array:
    """Reorder activation columns to the q2/q3 plane qs layout: within each
    superblock, element (c*16 + s*4 + a) moves to column (s*64 + a*16 + c).
    One XLA transpose on the small (N, K) side."""
    n, k = b.shape
    return b.reshape(n, k // QK_K, 16, 4, 4).transpose(0, 1, 3, 4, 2) \
            .reshape(n, k)


def _plane_perm_np_q23():
    """(256, 256) 0/1 numpy matrix P with b_plane = b_natural @ P per
    superblock (permute_acts_q23's column map as an MXU op)."""
    import numpy as np

    p = np.zeros((QK_K, QK_K), np.float32)
    c, s, a = np.meshgrid(np.arange(16), np.arange(4), np.arange(4),
                          indexing="ij")
    p[(c * 16 + s * 4 + a).ravel(), (s * 64 + a * 16 + c).ravel()] = 1.0
    return p


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


def _unpack_affine_q2k(sbt, qs_ref, scale16, min16, fold_min=True):
    """Plane crumb unpack + affine dequant: per superblock, 4 shift/mask
    planes of 64 rows, each dequantized by the repeat-tiled per-16-block
    scale/min rows.

    r5 (probe_kq_ops): this kernel is VPU element-rate-bound, so ops ARE
    time. Two measured removals:
    - micro elision: plane sh=0 needs no shift and sh=6 no mask (u8
      source guarantees clear high bits);
    - fold_min=False drops the `- me` from the per-element fma entirely
      (+11.8% alone): the decode path restores the min as one small
      bsum x min16 dot per K-step instead (kqops nome/combo lines).
      The r4 "min-fold always wins" finding was q4_k-specific — with 5
      chain ops per element and per-16 granularity the tradeoff
      reverses. Prefill keeps the fold (MXU-bound, chain time hidden)."""
    vi = qs_ref[:].astype(jnp.int32)
    parts = []
    for s in range(sbt):
        sl = vi[s * 64:(s + 1) * 64, :]
        se = pltpu.repeat(scale16[s * 16:(s + 1) * 16, :], 4, axis=0)
        me = pltpu.repeat(min16[s * 16:(s + 1) * 16, :], 4, axis=0) \
            if fold_min else None
        for sh in (0, 2, 4, 6):
            q = (sl & 3 if sh == 0
                 else sl >> 6 if sh == 6
                 else (sl >> sh) & 3).astype(jnp.float32)
            parts.append(q * se - me if fold_min else q * se)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _ink_b_prep_q23(fast, sbt, b_ref, p_ref):
    return _ink_b_prep_q23_val(fast, sbt, b_ref[:], p_ref)


def _ink_b_prep_q23_val(fast, sbt, bt, p_ref):
    """Decode-path activation glue, in-kernel: per-superblock (BN, 256) x
    (256, 256) 0/1-matrix permute dots (exact selection). (A fused
    block-diagonal one-dot variant measured 31% slower in its
    bsum-augmented form — its zeros cost real MXU tile loads; q4k_glue
    ink_bigg, r4 session.)"""
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    bc = bt.astype(jnp.bfloat16) if fast else bt
    pm = p_ref[:].astype(bc.dtype)
    return jnp.concatenate(
        [jax.lax.dot_general(
            bc[:, s * QK_K:(s + 1) * QK_K], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
         for s in range(sbt)], axis=1)


def _kernel(fast, ink, sbt, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, b_ref,
            *rest):
    # rest = (out_ref, acc_ref) in glue mode / (p_ref, ind_ref, out_ref,
    # acc_ref) in ink mode (plane permute + per-16 bsum indicator
    # constants run in-kernel)
    out_ref, acc_ref = rest[-2], rest[-1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale16, min16 = _affine16_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    w = _unpack_affine_q2k(sbt, qs_ref, scale16, min16, fold_min=not ink)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    if ink:
        bt = b_ref[:]
        bb = _ink_b_prep_q23_val(fast, sbt, bt, rest[0]).astype(wd.dtype)
        # min term off the per-element chain (r5 nome): one small
        # bsum16 x min16 dot per K-step on the NATURAL-order b tile.
        # bsum via the CONSTANT (bk, nblk16) 0/1 indicator operand — the
        # first shipped form built an iota mask + HIGHEST dot per step,
        # which ate the chain saving (suite r5: q2_k 259 vs the probe's
        # 293; q3_k regressed outright)
        # precision follows the kernel mode: fast = bf16 b codes through
        # a DEFAULT dot; high keeps f32 + HIGHEST so the affine-min term
        # stays at the documented f32 contract accuracy (self-review r5)
        bc2 = bt.astype(jnp.bfloat16) if fast else bt
        bsum16 = jax.lax.dot_general(
            bc2, rest[1][:].astype(bc2.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                       # (BN, SBt*16)
        acc_ref[:] -= jax.lax.dot_general(
            bsum16, min16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    else:
        bb = b_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        bb, wd, (((1,), (0,)), ((), ())),
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
    if not ink:
        b = permute_acts_q23(b)
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
    if ink:
        specs.append(pl.BlockSpec((QK_K, QK_K), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((bk, sbt * 16), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        tail = (jnp.asarray(_plane_perm_np_q23(), jnp.bfloat16),
                _block16_indicator(bk))

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
