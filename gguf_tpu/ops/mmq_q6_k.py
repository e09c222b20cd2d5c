"""Fused dequantize+matmul for Q6_K weights.

Capability match of /root/reference/kernels/mmq_q6_k.py (mul_mat_q6_k_triton
:72, mmq_q6_k :197): C = (A @ B.T).T, A = Q6_K (M, K) weights, B = (N, K)
float, output (N, M). K must be a multiple of 256.

TPU-first notes beyond mmq_q4_k.py: the Triton kernel reconstructs each
6-bit code with masked per-lane loads and relies on an out-of-bounds
sentinel byte 0b10101010 so masked lanes decode to zero weight (reference
:63-66). Here out-of-bounds never happens (tiles are superblock-aligned and
M is zero-padded: d = 0 makes padded columns contribute nothing), and the
6-bit reconstruction is whole-tile int32 shift/mask/concat ops:
q = (ql_nibble | qh_2bit << 4) - 32.

ql/qh are stored in PLANE order (quant/layouts.py _Q6K_PLANE_LO /
_Q6K_ELEM_AT_ROW) so every unpack row's 16-block id is (row % 16) and the
per-16-block scale multiply is a pltpu.repeat copy-tile per 128-row plane
instead of a 3D reshape-broadcast — the same ~14%-of-kernel Mosaic
lowering win measured for Q4_K (benchmarks/probe_q4k_ab.py). The matching
activation permutation (permute_acts_q6k) is one XLA transpose on the
small (N, K) side.
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
    regroup_rows, round_up, running_interpreted,
)
from .mmq_q4_k import INK_GLUE_MAX_N

QK_K = 256


def permute_acts_q6k(b: jax.Array) -> jax.Array:
    """Reorder activation columns to match the Q6_K plane layout: within
    each superblock, element (blk*16 + h*8 + p) moves to column
    (h*128 + p*16 + blk)."""
    n, k = b.shape
    return b.reshape(n, k // QK_K, 16, 2, 8).transpose(0, 1, 3, 4, 2) \
            .reshape(n, k)


def _plane_perm_np_q6k():
    """(256, 256) 0/1 numpy matrix P with b_plane = b_natural @ P per
    superblock (the permute_acts_q6k column map as an MXU op — see
    mmq_q4_k.py module docstring for the measured rationale)."""
    import numpy as np

    p = np.zeros((QK_K, QK_K), np.float32)
    blk, h, pp = np.meshgrid(np.arange(16), np.arange(2), np.arange(8),
                             indexing="ij")
    p[(blk * 16 + h * 8 + pp).ravel(), (h * 128 + pp * 16 + blk).ravel()] = 1.0
    return p


def _kernel(fast, sbt, d_ref, sc_ref, ql_ref, qh_ref, b_ref, out_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # per-16-block scales, f32 (sub-scales are int8, exact in f32);
    # d rows come 8-row padded per K-step (see wrapper)
    d = fp16_bits_to_f32(d_ref[:sbt, :])                     # (SBt, TM)
    tm = d.shape[-1]
    sc16 = sc_ref[:].astype(jnp.float32)                     # (SBt*16, TM)
    scale16 = (d[:, None, :] * sc16.reshape(sbt, 16, tm)).reshape(sbt * 16, tm)

    # plane unpack + scale: every row's 16-block id is (row % 16), so the
    # per-16 scale is the 8x copy-tile of the superblock's 16 scale rows
    lo_i = ql_ref[:].astype(jnp.int32)                       # (SBt*128, TM)
    hi_i = qh_ref[:].astype(jnp.int32)                       # (SBt*64, TM)
    parts = []
    for s in range(sbt):
        sl = lo_i[s * 128:(s + 1) * 128, :]
        hs = hi_i[s * 64:(s + 1) * 64, :]
        se = pltpu.repeat(scale16[s * 16:(s + 1) * 16, :], 8, axis=0)
        # the -32 offset rides the scale multiply as an fma against a
        # 16-row-amortized 32*scale bias (r4 min-fold: one int sub per
        # element saved; see mmq_q4_k.py:_unpack_scaled)
        b32 = pltpu.repeat(32.0 * scale16[s * 16:(s + 1) * 16, :], 8,
                           axis=0)
        # micro elisions (r5, probe_kq_ops): top crumb (hs >> 6) and the
        # hi nibble (sl >> 4) need no mask on u8 sources
        h01 = jnp.concatenate([hs & 3, (hs >> 2) & 3], axis=0)
        h23 = jnp.concatenate([(hs >> 4) & 3, hs >> 6], axis=0)
        q_lo = (sl & 0xF) | (h01 << 4)
        q_hi = (sl >> 4) | (h23 << 4)
        parts.append(q_lo.astype(jnp.float32) * se - b32)
        parts.append(q_hi.astype(jnp.float32) * se - b32)
    w = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        b_ref[:], wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_ink(fast, sbt, d_ref, sc_ref, ql_ref, qh_ref, b_ref, p_ref,
                out_ref, acc_ref):
    """Decode-width variant: b arrives in NATURAL column order (f32); the
    plane permute + bf16 cast run in-kernel as per-superblock 0/1-matrix
    matmuls (no bsum — Q6_K is symmetric). See mmq_q4_k.py docstring."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d = fp16_bits_to_f32(d_ref[:sbt, :])
    tm = d.shape[-1]
    sc16 = sc_ref[:].astype(jnp.float32)
    scale16 = (d[:, None, :] * sc16.reshape(sbt, 16, tm)).reshape(sbt * 16, tm)

    lo_i = ql_ref[:].astype(jnp.int32)
    hi_i = qh_ref[:].astype(jnp.int32)
    parts = []
    for s in range(sbt):
        sl = lo_i[s * 128:(s + 1) * 128, :]
        hs = hi_i[s * 64:(s + 1) * 64, :]
        se = pltpu.repeat(scale16[s * 16:(s + 1) * 16, :], 8, axis=0)
        # the -32 offset rides the scale multiply as an fma against a
        # 16-row-amortized 32*scale bias (r4 min-fold: one int sub per
        # element saved; see mmq_q4_k.py:_unpack_scaled)
        b32 = pltpu.repeat(32.0 * scale16[s * 16:(s + 1) * 16, :], 8,
                           axis=0)
        # micro elisions (r5, probe_kq_ops): top crumb (hs >> 6) and the
        # hi nibble (sl >> 4) need no mask on u8 sources
        h01 = jnp.concatenate([hs & 3, (hs >> 2) & 3], axis=0)
        h23 = jnp.concatenate([(hs >> 4) & 3, hs >> 6], axis=0)
        q_lo = (sl & 0xF) | (h01 << 4)
        q_hi = (sl >> 4) | (h23 << 4)
        parts.append(q_lo.astype(jnp.float32) * se - b32)
        parts.append(q_hi.astype(jnp.float32) * se - b32)
    w = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    bt = b_ref[:]                                  # (BN, BK) f32, natural
    bc = bt.astype(jnp.bfloat16) if fast else bt
    gm = p_ref[:].astype(bc.dtype)     # block-diag glue (mmq_q4_k.py)
    bp = jax.lax.dot_general(
        bc, gm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
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
def mmq_q6_k(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for Q6_K weights A (M, K SoA) and float B (N, K)."""
    assert w.fmt == "q6_k"
    m, k = w.shape
    n = b.shape[0]
    assert b.shape[1] == k, (b.shape, w.shape)
    assert k % QK_K == 0, f"K must be a multiple of {QK_K}, got {k}"
    assert block_m % 128 == 0

    if act_quant:
        b = fake_quantize_q8_1(b)
    b = b.astype(jnp.float32)
    fast = precision == "fast"
    # N-tiling: prefill (large B*T) must be tiled or the accumulator and
    # dequant intermediates overflow the ~16MB VMEM budget
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    ink = n_pad <= INK_GLUE_MAX_N
    if not ink:
        b = permute_acts_q6k(b)
        if fast:
            b = b.astype(jnp.bfloat16)
    b = pad_rows(b, n_pad)
    bm = choose_bm(w.ql.shape[-1], block_m)
    m_pad = round_up(max(m, w.ql.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K
    sb = k // QK_K

    g8 = max(8, round_up(sbt, 8))
    steps = k // bk
    d_bits = regroup_rows(pad_cols(w.d_bits, m_pad), sbt, steps, g8)
    sc = pad_cols(w.sc, m_pad)
    ql = pad_cols(w.ql, m_pad)
    qh = pad_cols(w.qh, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    specs = [
        # d: this K-step's (8-row padded) superblock scales
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 16, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 4, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
    ]
    if ink:
        kern = functools.partial(_kernel_ink, fast, sbt)
        from .mmq_q4_k import _glue_matrix

        specs.append(pl.BlockSpec((bk, bk), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        tail = (_glue_matrix(bk, _plane_perm_np_q6k(), None),)
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
            bytes_accessed=m_pad * sb * 210 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, sc, ql, qh, b, *tail)

    return out[:n, :m]
