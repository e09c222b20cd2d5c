"""Fused decode attention over the INT8 KV cache (Pallas).

The XLA formulation of GQA decode attention — dequantize the whole cache to
f32 in HBM, then batched einsums of (h/kvh*t, hd) x (hd, S) per (batch,
kv-head) pair — costs ~100us/layer at batch 16, S 256 on v5e: the
dequantized cache (4x the int8 bytes) round-trips through HBM every step
and the per-pair matmuls are too small for the MXU's weight-load pipeline.

This kernel fuses the whole per-batch attention into one Pallas program
(grid over batch only — measured 2.5x faster than one program per
(batch, kv-head): tiny grid steps pay DMA issue latency they can't hide):
int8 K/V tiles are dequantized to bf16 in VMEM with the scales folded into
the scores / probabilities (never into the big operands), the per-kv-head
dots run back to back on the MXU, and the causal-masked softmax runs in f32
on the VPU. Nothing round-trips to HBM.

There is no CUDA counterpart in the reference (it has no attention at all,
SURVEY.md §0); this is new TPU-native capability required by the serving
engine. The causal mask follows the same per-slot-position contract as
models/llama.py:attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import running_interpreted

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(t, kvh, scale, fast, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            pos_ref, out_ref):
    """One batch element: q (1, KVH, Q, hd), K/V (1, KVH, S, hd) int8,
    scales (1, KVH, 1, S), pos (B, 1) in SMEM. Q = h/kvh * t query rows per
    kv head, laid out head-major (row r is query token r % t)."""
    dt = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    pos = pos_ref[pl.program_id(0), 0]

    for g in range(kvh):
        q = q_ref[0, g].astype(dt)                       # (Q, hd)
        k = k_ref[0, g].astype(dt)                       # (S, hd)
        v = v_ref[0, g].astype(dt)
        ks = ks_ref[0, g].astype(jnp.float32)            # (1, S)
        vs = vs_ref[0, g].astype(jnp.float32)

        qn, s = q.shape[0], k.shape[0]
        # scores = (q . k) * k_scale / sqrt(hd), contraction over hd
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        scores = scores * (ks * scale)                   # (Q, S)

        # causal: query row r is token (pos + r % t); key column s_idx is
        # valid when s_idx <= pos + r % t
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (qn, s), 0) % t
        col = jax.lax.broadcasted_iota(jnp.int32, (qn, s), 1)
        scores = jnp.where(col <= pos + row_tok, scores, NEG_INF)

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        pv = (p * vs).astype(dt)                         # fold v_scale
        out_ref[0, g] = jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


@functools.partial(jax.jit, static_argnames=("t", "precision"))
def decode_attention(
    q: jax.Array,        # (B, H, t, hd) — rope already applied
    k: jax.Array,        # (B, KVH, S, hd) int8 cache
    k_scale: jax.Array,  # (B, KVH, S) f32
    v: jax.Array,
    v_scale: jax.Array,
    pos: jax.Array,      # (B,) int32 position of the first of the t tokens
    *,
    t: int,
    precision: str = "fast",
) -> jax.Array:
    """Fused GQA decode attention; returns (B, H, t, hd) f32. The t new
    tokens' K/V must already be written to the cache at pos..pos+t-1."""
    b, h, tt, hd = q.shape
    assert tt == t
    _, kvh, s, _ = k.shape
    g = h // kvh

    # (B, KVH, G*t, hd), rows head-major then token
    qr = q.reshape(b, kvh, g * t, hd)
    scale = 1.0 / (hd ** 0.5)

    out = pl.pallas_call(
        functools.partial(_kernel, t, kvh, scale, precision == "fast"),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, g * t, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, s, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, s), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, s, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, 1, s), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos: whole (B, 1)
        ],
        out_specs=pl.BlockSpec((1, kvh, g * t, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g * t, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=running_interpreted(),
    )(qr, k, k_scale.reshape(b, kvh, 1, s), v,
      v_scale.reshape(b, kvh, 1, s), pos.reshape(b, 1).astype(jnp.int32))

    return out.reshape(b, h, t, hd)


def _kernel_upd(t, kvh, g, scale, fast, cross, q_ref, kn_ref, vn_ref, k_ref,
                ks_ref, v_ref, vs_ref, pos_ref, out_ref, ko_ref, kso_ref,
                vo_ref, vso_ref):
    """decode_attention_update: per batch element, quantize + insert the t
    new K/V rows into the (aliased) int8 cache block, then attend over the
    updated values. Fusing the insert here removes the separate XLA update
    pass and the copies XLA otherwise inserts around the Pallas operand
    boundary (~5x the cache bytes of traffic per layer showed in the HLO).

    Two bodies:
    - cross (t == 1): head-vectorized insert, then ONE (H, hd) x
      (hd, KVH*S) scores matmul across ALL kv heads with off-block entries
      masked to -inf before softmax (cross-head probabilities are exactly
      zero) and ONE (H, KVH*S) x (KVH*S, hd) PV matmul. The KVH-fold FLOP
      waste is trivial at decode sizes and beats the per-head loop by 3x at
      MHA shapes (which is op-issue bound: B*KVH tiny dot sequences).
    - loop (t > 1, short prefill chunks): per-kv-head insert + dots. The
      cross form's waste grows with t, and Mosaic cannot lower the
      unaligned mid-dim value slices the vectorized multi-token insert
      needs (negative-VMEM-offset check failure in lower_to_llo)."""
    dt = jnp.bfloat16 if fast else jnp.float32
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    pos = pos_ref[pl.program_id(0), 0]
    s = k_ref.shape[2]
    hd = k_ref.shape[3]

    if cross:
        # ---- head-vectorized cache insert (t == 1) ----
        row_s = jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
        col_s3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)

        def upd(c_ref, sc_ref2, new):      # new (KVH, 1, hd) f32
            amax = jnp.max(jnp.abs(new), axis=-1)
            sc_new = amax / 127.0
            safe = jnp.where(sc_new == 0, 1.0, sc_new)
            qn = jnp.clip(jnp.rint(new / safe[..., None]), -127, 127
                          ).astype(jnp.int8)
            c = jnp.where(row_s == pos, qn[:, 0:1, :], c_ref[0])
            sc = jnp.where(col_s3 == pos, sc_new[:, 0][:, None, None],
                           sc_ref2[0])
            return c, sc

        k, ks = upd(k_ref, ks_ref, kn_ref[0])
        v, vs = upd(v_ref, vs_ref, vn_ref[0])
        ko_ref[0] = k
        kso_ref[0] = ks
        vo_ref[0] = v
        vso_ref[0] = vs

        R = kvh * g
        q = q_ref[0].reshape(R, hd).astype(dt)
        k2 = k.reshape(kvh * s, hd).astype(dt)
        v2 = v.reshape(kvh * s, hd).astype(dt)
        scores = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (R, KVH*S)
        scores = scores * (ks.reshape(1, kvh * s).astype(jnp.float32) * scale)
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, kvh * s), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (R, kvh * s), 1)
        own = (cc // s) == (rr // g)
        causal = (cc % s) <= pos
        scores = jnp.where(own & causal, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs.reshape(1, kvh * s).astype(jnp.float32)).astype(dt)
        out = jax.lax.dot_general(
            pv, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_ref[0] = out.reshape(kvh, g, hd)
        return

    # ---- per-head insert + attention (t > 1) ----
    row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    col_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    for gi in range(kvh):
        def upd(c_ref, sc_ref2, new):      # new (t, hd) f32
            amax = jnp.max(jnp.abs(new), axis=-1)
            sc_new = amax / 127.0
            safe = jnp.where(sc_new == 0, 1.0, sc_new)
            qn = jnp.clip(jnp.rint(new / safe[:, None]), -127, 127
                          ).astype(jnp.int8)
            c = c_ref[0, gi]
            sc = sc_ref2[0, gi]
            for j in range(t):
                c = jnp.where(row == pos + j, qn[j][None, :], c)
                sc = jnp.where(col_s == pos + j, sc_new[j], sc)
            return c, sc

        k, ks = upd(k_ref, ks_ref, kn_ref[0, gi])
        v, vs = upd(v_ref, vs_ref, vn_ref[0, gi])
        ko_ref[0, gi] = k
        kso_ref[0, gi] = ks
        vo_ref[0, gi] = v
        vso_ref[0, gi] = vs

        q = q_ref[0, gi].astype(dt)
        qn_rows = q.shape[0]
        scores = jax.lax.dot_general(
            q, k.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        scores = scores * (ks.astype(jnp.float32) * scale)
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (qn_rows, s), 0) % t
        col = jax.lax.broadcasted_iota(jnp.int32, (qn_rows, s), 1)
        scores = jnp.where(col <= pos + row_tok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs.astype(jnp.float32)).astype(dt)
        out_ref[0, gi] = jax.lax.dot_general(
            pv, v.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


@functools.partial(jax.jit, static_argnames=("t", "precision"))
def decode_attention_update(
    q: jax.Array,        # (B, H, t, hd) — rope applied
    k_new: jax.Array,    # (B, KVH, t, hd) f32 — rope applied
    v_new: jax.Array,    # (B, KVH, t, hd) f32
    k: jax.Array,        # (B, KVH, S, hd) int8 cache (donated/aliased)
    k_scale: jax.Array,  # (B, KVH, S) f32
    v: jax.Array,
    v_scale: jax.Array,
    pos: jax.Array,      # (B,) int32
    *,
    t: int,
    precision: str = "fast",
):
    """Fused cache-insert + GQA decode attention. Quantizes the t new K/V
    rows to int8 in-kernel, writes them into the cache at pos..pos+t-1
    (cache buffers aliased in/out — no extra HBM copies), and attends over
    the updated cache. Returns (out (B, H, t, hd) f32, k, k_scale, v,
    v_scale)."""
    b, h, tt, hd = q.shape
    assert tt == t
    _, kvh, s, _ = k.shape
    g = h // kvh
    qr = q.reshape(b, kvh, g * t, hd)
    scale = 1.0 / (hd ** 0.5)

    ks4 = k_scale.reshape(b, kvh, 1, s)
    vs4 = v_scale.reshape(b, kvh, 1, s)
    blk = lambda *shape: pl.BlockSpec(
        (1, *shape), lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    # cross-head single-matmul body wins at decode (t == 1); the per-head
    # loop wins once t grows (the KVH-fold cross FLOP waste scales with t).
    # It also needs S % 128 == 0: the (KVH, 1, S) -> (1, KVH*S) scale
    # reshape merges into the lane dim, which Mosaic only lowers at
    # 128-multiples ("unsupported shape cast" otherwise).
    cross = t == 1 and s % 128 == 0
    out, ko, kso, vo, vso = pl.pallas_call(
        functools.partial(_kernel_upd, t, kvh, g, scale,
                          precision == "fast", cross),
        grid=(b,),
        in_specs=[
            blk(kvh, g * t, hd),            # q
            blk(kvh, t, hd),                # k_new
            blk(kvh, t, hd),                # v_new
            blk(kvh, s, hd),                # k cache
            blk(kvh, 1, s),                 # k_scale
            blk(kvh, s, hd),                # v cache
            blk(kvh, 1, s),                 # v_scale
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos (B, 1)
        ],
        out_specs=(blk(kvh, g * t, hd), blk(kvh, s, hd), blk(kvh, 1, s),
                   blk(kvh, s, hd), blk(kvh, 1, s)),
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, g * t, hd), jnp.float32),
            jax.ShapeDtypeStruct(k.shape, jnp.int8),
            jax.ShapeDtypeStruct((b, kvh, 1, s), jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.int8),
            jax.ShapeDtypeStruct((b, kvh, 1, s), jnp.float32),
        ),
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=running_interpreted(),
    )(qr, k_new, v_new, k, ks4, v, vs4, pos.reshape(b, 1).astype(jnp.int32))

    return (out.reshape(b, h, t, hd), ko, kso.reshape(b, kvh, s),
            vo, vso.reshape(b, kvh, s))
