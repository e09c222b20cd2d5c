"""Fused dequantize+matmul for the IQ4 codebook formats (IQ4_NL / IQ4_XS).

The upstream reference has no IQ-series kernels (its MMQ set is
q8_0/q4_k/q6_k — kernels/mmq_q8_0.py:102, mmq_q4_k.py:240); these complete
llama.cpp-ecosystem coverage of the 4-bit nonlinear formats. Same TPU-first
structure as mmq_q4_k.py: K-major SoA tiles, whole-tile nibble unpack, one
MXU contraction per grid step with an f32 VMEM accumulator.

The only new in-kernel step is the 16-entry codebook lookup. A gather would
serialize on TPU (see the measured scatter/gather trap in the design notes),
so the table rides in four packed i32 constants and each nibble resolves via
two selects + a variable byte shift (~9 VPU int ops/elem, comparable to the
Q5_K fifth-bit reassembly). Both formats are purely symmetric — the codebook
values carry the signs — so there is no affine-correction matmul at all,
making these the leanest kernels in the MMQ family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layouts import QuantTensor, iq4_lookup
from .activation import fake_quantize_q8_1
from .mmq_q4_k import INK_GLUE_MAX_N
from .common import (
    choose_bm, fp16_bits_to_f32, pad_cols, pad_rows, pick_block,
    regroup_rows, round_up, running_interpreted, unpack_nibbles_tile,
)

QK_K = 256
BLOCK = 32


def _kernel(fast, ink, sbt, xs, *refs):
    refs = list(refs)
    d_ref = refs.pop(0)
    sc_ref = refs.pop(0) if xs else None
    qs_ref, b_ref, out_ref, acc_ref = refs

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = unpack_nibbles_tile(qs_ref[:], sbt)                 # (TK, TM) i32
    v = iq4_lookup(q).astype(jnp.float32)

    if xs:
        # per-superblock d (8-row padded group) x per-32 signed 6-bit scale
        d = fp16_bits_to_f32(d_ref[:sbt, :])                # (SBt, TM)
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)  # (SBt*8, TM)
        tm = sc.shape[-1]
        scale32 = (d[:, None, :] * sc.reshape(sbt, 8, tm)).reshape(sbt * 8, tm)
        nb = sbt * 8
    else:
        scale32 = fp16_bits_to_f32(d_ref[:])                # (TK/32, TM)
        nb, tm = scale32.shape

    w = (v.reshape(nb, BLOCK, tm) * scale32[:, None, :]).reshape(nb * BLOCK, tm)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    # ink (decode): b arrives f32 and the bf16 cast rides the VMEM tile
    bb = b_ref[:].astype(wd.dtype) if ink else b_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        bb, wd, (((1,), (0,)), ((), ())),
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
def _mmq_iq4(
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
    """C = (A @ B.T).T for IQ4 weights A (M, K SoA) and float B (N, K).
    Returns (N, M). K must be a multiple of 256 (the SoA repacking group)."""
    assert w.fmt == fmt
    xs = fmt == "iq4_xs"

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
    ink = fast and n_pad <= INK_GLUE_MAX_N
    if fast and not ink:
        b = b.astype(jnp.bfloat16)
    b = pad_rows(b, n_pad)

    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K

    qs = pad_cols(w.qs, m_pad)
    operands = []
    in_specs = []
    if xs:
        g8 = max(8, round_up(sbt, 8))
        steps = k // bk
        operands.append(regroup_rows(pad_cols(w.d_bits, m_pad), sbt, steps, g8))
        in_specs.append(pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i),
                                     memory_space=pltpu.VMEM))
        operands.append(pad_cols(w.sc, m_pad))
        in_specs.append(pl.BlockSpec((sbt * 8, bm), lambda ni, i, j: (j, i),
                                     memory_space=pltpu.VMEM))
    else:
        operands.append(pad_cols(w.d_bits, m_pad))
        in_specs.append(pl.BlockSpec((bk // 32, bm), lambda ni, i, j: (j, i),
                                     memory_space=pltpu.VMEM))
    operands += [qs, b]
    in_specs += [
        pl.BlockSpec((bk // 2, bm), lambda ni, i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j),
                     memory_space=pltpu.VMEM),
    ]

    grid = (n_pad // bn, m_pad // bm, k // bk)
    bytes_per_row = w.packed_bytes_per_row()

    out = pl.pallas_call(
        functools.partial(_kernel, fast, ink, sbt, xs),
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
        return _mmq_iq4(w, b, fmt=fmt, **kw)
    fn.__name__ = f"mmq_{fmt}"
    fn.__doc__ = _mmq_iq4.__doc__
    return fn


mmq_iq4_nl = _make("iq4_nl")
mmq_iq4_xs = _make("iq4_xs")
