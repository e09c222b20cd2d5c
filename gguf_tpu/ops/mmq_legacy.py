"""Fused dequantize+matmul for the legacy 32-block formats (Q4_0/Q4_1/
Q5_0/Q5_1).

The upstream reference has no kernels for these (its MMQ set is
q8_0/q4_k/q6_k — kernels/mmq_q8_0.py:102, mmq_q4_k.py:240); they complete
llama.cpp-ecosystem format coverage. Same TPU-first structure as
mmq_q4_k.py (see design notes there): K-major SoA tiles, whole-tile nibble
unpack (+ q5_k-style fifth-bit plane for the 5-bit variants), one MXU
contraction per grid step with an f32 VMEM accumulator.

The per-32-block affine correction never touches K:
  _1 variants: x = d*q + m   ->  C += sum_blk m32[blk,m] * bsum[blk,n]
  _0 variants: x = d*(q-off) ->  C -= off * sum_blk d32[blk,m] * bsum[blk,n]
both a single small (K/32, N) x (K/32, TM) matmul against the per-32-block
activation sums — the same min-term trick as Q4_K, with the _0 offsets
riding the scale plane so the VPU never subtracts 8/16 per element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layouts import QuantTensor
from .activation import fake_quantize_q8_1
from .common import (  # noqa: F401
    unpack_bitplanes_tile,
    choose_bm, fp16_bits_to_f32, ink_block_sums, pad_cols, pad_rows,
    pick_block, round_up, running_interpreted, unpack_nibbles_tile,
)
from .mmq_q4_k import INK_GLUE_MAX_N

QK_K = 256
BLOCK = 32


def _kernel(fast, ink, fp16_bsum, sbt, five_bit, affine, offset, *refs):
    refs = list(refs)
    d_ref = refs.pop(0)
    mn_ref = refs.pop(0) if affine else None
    qs_ref = refs.pop(0)
    qh_ref = refs.pop(0) if five_bit else None
    if ink:   # decode path: bsum + bf16 cast in-kernel (element order —
        # the legacy formats have no activation permute)
        b_ref, out_ref, acc_ref = refs
        bsum_ref = None
    else:
        b_ref, bsum_ref, out_ref, acc_ref = refs

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d32 = fp16_bits_to_f32(d_ref[:])                        # (TK/32, TM)
    nb, tm = d32.shape

    q = unpack_nibbles_tile(qs_ref[:], sbt)                 # (TK, TM) i32
    if five_bit:
        hib = unpack_bitplanes_tile(qh_ref[:], sbt)         # (SBt*256, TM)
        q = q | (hib << 4)

    w = (q.astype(jnp.float32).reshape(nb, BLOCK, tm)
         * d32[:, None, :]).reshape(nb * BLOCK, tm)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    corr = (fp16_bits_to_f32(mn_ref[:]) if affine
            else d32 * jnp.float32(-offset))
    if ink:
        from ..quant.layouts import fp16_round

        bt = b_ref[:]                                       # (BN, BK) f32
        bsum = ink_block_sums(bt, nb, 5)                    # (BN, TK/32)
        if fp16_bsum:   # the Q8_1 `s` field is fp16 — match its rounding
            bsum = fp16_round(bsum)
        bb = bt.astype(wd.dtype)
        corr_dims = (((1,), (0,)), ((), ()))
    else:
        bb = b_ref[:]
        bsum = bsum_ref[:]
        corr_dims = (((0,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        bb, wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # affine/offset term: one small matmul against per-32-block act sums
    acc_ref[:] += jax.lax.dot_general(
        bsum, corr, corr_dims,
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt", "act_quant", "block_m", "block_k", "out_dtype",
                     "precision"),
)
def _mmq_legacy(
    w: QuantTensor,
    b: jax.Array,
    *,
    fmt: str,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for legacy-format weights A (M, K SoA) and float B
    (N, K). Returns (N, M). K must be a multiple of 256 (the SoA layout's
    repacking group; the loader pads all matrices to that anyway)."""
    assert w.fmt == fmt
    five_bit = fmt.startswith("q5")
    affine = fmt.endswith("_1")
    offset = 0.0 if affine else (8.0 if fmt == "q4_0" else 16.0)

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
        bsum = jnp.sum(b.reshape(n, k // 32, 32), axis=-1)
        if act_quant:
            # llama.cpp's vec_dot_q4_1_q8_1 consumes Q8_1's s =
            # fp16(d8*sum q8); rounding the block sums through fp16
            # reproduces that contract exactly (the affine/offset term
            # otherwise drifts ~1e-2 under cancellation vs byte goldens)
            from ..quant.layouts import f32_to_fp16_bits, fp16_bits_to_f32 as _u
            bsum = _u(f32_to_fp16_bits(bsum))
        if fast:
            b = b.astype(jnp.bfloat16)
        bsum_t = pad_rows(bsum, n_pad).T                    # (K/32, n_pad)
    b = pad_rows(b, n_pad)

    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K

    d_bits = pad_cols(w.d_bits, m_pad)
    qs = pad_cols(w.qs, m_pad)
    sc32 = pl.BlockSpec((bk // 32, bm), lambda ni, i, j: (j, i),
                        memory_space=pltpu.VMEM)
    operands = [d_bits]
    in_specs = [sc32]
    if affine:
        operands.append(pad_cols(w.dmin_bits, m_pad))
        in_specs.append(sc32)
    operands.append(qs)
    in_specs.append(pl.BlockSpec((bk // 2, bm), lambda ni, i, j: (j, i),
                                 memory_space=pltpu.VMEM))
    if five_bit:
        operands.append(pad_cols(w.qh, m_pad))
        in_specs.append(pl.BlockSpec((bk // 8, bm), lambda ni, i, j: (j, i),
                                     memory_space=pltpu.VMEM))
    operands.append(b)
    in_specs.append(pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j),
                                 memory_space=pltpu.VMEM))
    if not ink:
        operands.append(bsum_t)
        in_specs.append(pl.BlockSpec((bk // 32, bn), lambda ni, i, j: (j, ni),
                                     memory_space=pltpu.VMEM))

    grid = (n_pad // bn, m_pad // bm, k // bk)
    bytes_per_row = w.packed_bytes_per_row()

    out = pl.pallas_call(
        functools.partial(_kernel, fast, ink, act_quant, sbt, five_bit,
                          affine, offset),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * bytes_per_row + n_pad * k * 2
            + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(*operands)

    return out[:n, :m]


def _make(fmt):
    def fn(w, b, **kw):
        return _mmq_legacy(w, b, fmt=fmt, **kw)
    fn.__name__ = f"mmq_{fmt}"
    fn.__doc__ = _mmq_legacy.__doc__
    return fn


mmq_q4_0 = _make("q4_0")
mmq_q4_1 = _make("q4_1")
mmq_q5_0 = _make("q5_0")
mmq_q5_1 = _make("q5_1")
