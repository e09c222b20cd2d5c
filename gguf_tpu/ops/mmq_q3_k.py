"""Fused dequantize+matmul for Q3_K weights.

There is no Q3_K kernel in the upstream reference (its MMQ family stops at
Q8_0/Q4_K/Q6_K — /root/reference/kernels/); this extends the same kernel
contract (mmq_q6_k.py:197: C = (A @ B.T).T) to llama.cpp's 3.4375-bpw
format.

Structure is Q6_K's (signed per-16 scales, no min term) with a cheaper code
reconstruction: q = (low2 | hbit << 2) - 4, where the low-2-bit plane
unpacks 4-per-byte (common.py:unpack_crumbs_tile) and the third bit comes
from a q5_k-style 8-bit-plane slab (the on-disk hmask layout is already the
SoA shape — quant/layouts.py:q3_k_to_soa). The signed scales were offset by
-32 at load, so the kernel skips that subtraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layouts import QuantTensor
from .activation import fake_quantize_q8_1
from .mmq_q4_k import INK_GLUE_MAX_N
from .common import (  # noqa: F401
    unpack_bitplanes_tile,
    choose_bm, fp16_bits_to_f32, pad_cols, pad_rows, pick_block,
    regroup_rows, round_up, running_interpreted, unpack_crumbs_tile,
)

QK_K = 256


def _kernel(fast, ink, sbt, d_ref, sc_ref, qs_ref, qh_ref, b_ref, out_ref,
            acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # per-16-block signed scales, f32 (int8 sub-scales are exact in f32)
    d = fp16_bits_to_f32(d_ref[:sbt, :])                     # (SBt, TM)
    tm = d.shape[-1]
    sc16 = sc_ref[:].astype(jnp.float32)                     # (SBt*16, TM)
    scale16 = (d[:, None, :] * sc16.reshape(sbt, 16, tm)).reshape(sbt * 16, tm)

    low2 = unpack_crumbs_tile(qs_ref[:], sbt)                # (TK, TM) i32

    # third bit plane (shared slab unpack, common.unpack_bitplanes_tile)
    hib = unpack_bitplanes_tile(qh_ref[:], sbt)              # (SBt*256, TM)

    q = ((low2 | (hib << 2)) - 4).astype(jnp.float32)        # codes in [-4, 4)
    w = (q.reshape(sbt * 16, 16, tm) * scale16[:, None, :]).reshape(sbt * 256, tm)

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
    static_argnames=("act_quant", "block_m", "block_k", "out_dtype", "precision"),
)
def mmq_q3_k(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
) -> jax.Array:
    """C = (A @ B.T).T for Q3_K weights A (M, K SoA) and float B (N, K)."""
    assert w.fmt == "q3_k"
    m, k = w.shape
    n = b.shape[0]
    assert b.shape[1] == k, (b.shape, w.shape)
    assert k % QK_K == 0, f"K must be a multiple of {QK_K}, got {k}"
    assert block_m % 128 == 0

    if act_quant:
        b = fake_quantize_q8_1(b)
    fast = precision == "fast"
    b = b.astype(jnp.float32)
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
    sb = k // QK_K

    g8 = max(8, round_up(sbt, 8))
    steps = k // bk
    d_bits = regroup_rows(pad_cols(w.d_bits, m_pad), sbt, steps, g8)
    sc = pad_cols(w.sc, m_pad)
    qs = pad_cols(w.qs, m_pad)
    qh = pad_cols(w.qh, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    out = pl.pallas_call(
        functools.partial(_kernel, fast, ink, sbt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sbt * 16, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 4, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * sb * 110 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, sc, qs, qh, b)

    return out[:n, :m]
