"""Fused dequantize+matmul for Q8_0 weights.

Capability match of /root/reference/kernels/mmq_q8_0.py (mmq_q8_0_triton :14,
mmq_q8_0 :102): C = (A @ B.T).T, A = Q8_0 (M, K) weights, B = (N, K) float,
output (N, M). K must be a multiple of 32 (reference :124).

Same TPU-first structure as mmq_q4_k.py (see design notes there): K-major SoA
weight tiles via BlockSpecs, per-32-block fp16 scales widened to f32 in
integer ops, one large MXU contraction per grid step with an f32 VMEM
accumulator, activation quantization hoisted out of the kernel.

When K is a multiple of 256 the loader stores qs in PLANE order (256-row
groups with block id = row % 8, quant/layouts.py q8_0_to_soa) so the per-32
scale multiply is a pltpu.repeat copy-tile instead of a 3D reshape-broadcast
— the same ~14% Mosaic lowering win measured for the K-quant plane layouts
(benchmarks/probe_q4k_ab.py). At decode widths (n <= mmq_q4_k.INK_GLUE_MAX_N)
the matching activation permute and the bf16 cast run in-kernel as
per-group 0/1-matrix MXU matmuls (mmq_q4_k.py module docstring has the
measured rationale: the XLA glue cost ~7 us/call at 4096^2 where the kernel
itself took ~11 us); prefill keeps the XLA-side permute. K not divisible by
256 (the reference's K=32..128 sweep) rides the element-order kernel
unchanged.
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
from .mmq_q4_k import INK_GLUE_MAX_N

BLOCK = 32
QK_G = 256   # plane group: 8 blocks


def permute_acts_q8_0(b: jax.Array) -> jax.Array:
    """Reorder activation columns to match the Q8_0 plane layout: within
    each 256-group, element (g*32 + p) moves to column (p*8 + g)."""
    n, k = b.shape
    return b.reshape(n, k // QK_G, 8, 32).transpose(0, 1, 3, 2).reshape(n, k)


def _plane_perm_np_q8():
    """(256, 256) 0/1 numpy matrix P with b_plane = b_natural @ P per
    256-group."""
    import numpy as np

    p = np.zeros((QK_G, QK_G), np.float32)
    g, pp = np.meshgrid(np.arange(8), np.arange(32), indexing="ij")
    p[(g * 32 + pp).ravel(), (pp * 8 + g).ravel()] = 1.0
    return p


def _kernel(fast, d_ref, qs_ref, b_ref, out_ref, acc_ref):
    """Element-order kernel (K % 256 != 0): 3D reshape-broadcast scale."""
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


def _unpack_scaled_q8(sbt, d_ref, qs_ref):
    """Plane scale multiply: every row's 32-block id is (row % 8), so the
    per-32 scale is the 32x copy-tile of the group's 8 scale rows."""
    d = fp16_bits_to_f32(d_ref[:])                  # (sbt*8, TM)
    q = qs_ref[:].astype(jnp.float32)               # (sbt*256, TM)
    parts = []
    for s in range(sbt):
        se = pltpu.repeat(d[s * 8:(s + 1) * 8, :], 32, axis=0)
        parts.append(q[s * QK_G:(s + 1) * QK_G, :] * se)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _kernel_plane(fast, sbt, d_ref, qs_ref, b_ref, out_ref, acc_ref):
    """Plane-order kernel: b arrives PRE-permuted (prefill path)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_scaled_q8(sbt, d_ref, qs_ref)
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        b_ref[:], wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_ink(fast, sbt, d_ref, qs_ref, b_ref, p_ref, out_ref, acc_ref):
    """Plane decode kernel: natural-order f32 b; permute + bf16 cast run
    in-kernel as per-group 0/1-matrix matmuls."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_scaled_q8(sbt, d_ref, qs_ref)
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    bt = b_ref[:]                                   # (BN, BK) f32, natural
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

    # N-tiling: prefill (large B*T) must be tiled or the accumulator and
    # dequant intermediates overflow the ~16MB VMEM budget
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    plane = w.q8_plane   # stored flag, NOT a shape rule (layouts.py)
    ink = plane and n_pad <= INK_GLUE_MAX_N
    b = b.astype(jnp.float32)
    if plane and not ink:
        b = permute_acts_q8_0(b)
    if fast and not ink:
        b = b.astype(jnp.bfloat16)
    b = pad_rows(b, n_pad)
    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    # the d tile needs >= 8 sublanes (bk/32 >= 8) unless it spans the full K
    bk = pick_block(k, block_k, QK_G) if plane and k >= QK_G else k
    sbt = bk // QK_G

    d_bits = pad_cols(w.d_bits, m_pad)
    qs = pad_cols(w.qs, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    specs = [
        pl.BlockSpec((bk // BLOCK, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j), memory_space=pltpu.VMEM),
    ]
    if ink:
        kern = functools.partial(_kernel_ink, fast, sbt)
        from .mmq_q4_k import _glue_matrix

        specs.append(pl.BlockSpec((bk, bk), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        tail = (_glue_matrix(bk, _plane_perm_np_q8(), None),)
    elif plane:
        kern = functools.partial(_kernel_plane, fast, sbt)
        tail = ()
    else:
        kern = functools.partial(_kernel, fast)
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
            bytes_accessed=m_pad * (k // BLOCK) * 34 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, qs, b, *tail)

    return out[:n, :m]
