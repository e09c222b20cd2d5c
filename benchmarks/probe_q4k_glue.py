"""Round-3 probe: eliminate the mmq_q4_k XLA wrapper glue.

probe_q4k_parts showed the shipping kernel pays ~19% over its assembled
in-kernel equivalent — the delta is the XLA-side per-call glue: the
per-32-block activation sums (bsum) and the plane-order column permute of
b, each a separate small XLA op chain per mmq call. Both can move inside
the kernel, where b's tile is already in VMEM:

  minsep      parts-probe baseline: b PRE-permuted outside, bsum an input
              stream (the shipping decomposition) — kernel time only
  minsep+glue same, but the timing loop also runs the XLA bsum+permute per
              iteration (what the model actually pays per call)
  ink_resh    b enters NATURAL order; in-kernel bsum (contiguous 32-col
              reduce) + in-kernel permute via lane reshape/transpose
  ink_pmat    same but permute via a (256, 256) permutation-matrix batched
              matmul (bf16 exact on 0/1 values, MXU-cheap, guaranteed to
              lower)

Usage: python -u benchmarks/probe_q4k_glue.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[probe {time.time()-t0:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gguf_tpu.ops.common import fp16_bits_to_f32
from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BM, BK, N, STEPS = 2048, 1024, 16, 4
NBLK = BK // 32
SBT = BK // 256


def emit(obj):
    print(json.dumps(obj), flush=True)


def _time(op, args, label, glue=None):
    """Times op in a fori_loop; if glue is given, it is applied to the raw
    b each iteration (the XLA-side per-call work the kernel variant needs)."""
    def make(iters):
        def many(*a):
            b = a[-1]

            def body(i, carry):
                acc, xx = carry
                args_i = a[:-1] + ((glue(xx),) if glue else (xx,))
                out = op(*args_i)
                return acc + out, b + acc[:1, :1].astype(b.dtype) * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, BM), jnp.float32), b))
            return acc.sum()
        return many

    sec = slope_time(make, args, lo=10, hi=210)
    elems = STEPS * BK * BM
    gbps = elems * 4.5 / 8 / sec / 1e9
    emit({"probe": f"q4k_glue {label}", "us": round(sec * 1e6, 2),
          "q4k_equiv_gbps": round(gbps, 1)})
    return sec


rng = np.random.default_rng(1)
b_nat = jnp.asarray(rng.standard_normal((N, STEPS * BK)), jnp.float32)
w_u8 = jnp.asarray(rng.integers(0, 255, (STEPS * BK // 2, BM)), jnp.uint8)
# fp16 bit patterns restricted to finite normals (0x2000-0x3FFF): the r3 run
# drew from [0, 2**15) which includes inf/NaN encodings (>= 0x7C00) — both
# the ref op and the kernel then computed NaN and the archived max_rel_err
# line was NaN (RESULTS line 79, superseded by the r4 re-run).
d16 = jnp.asarray(rng.integers(2**13, 2**14, (STEPS * 8, BM)), jnp.uint16)
dm16 = jnp.asarray(rng.integers(2**13, 2**14, (STEPS * 8, BM)), jnp.uint16)
sc_u8 = jnp.asarray(rng.integers(0, 63, (STEPS * NBLK, BM)), jnp.uint8)
mn_u8 = jnp.asarray(rng.integers(0, 63, (STEPS * NBLK, BM)), jnp.uint8)

w_spec = pl.BlockSpec((BK // 2, BM), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
s_spec = pl.BlockSpec((NBLK, BM), lambda i: (i, 0), memory_space=pltpu.VMEM)
d_spec = pl.BlockSpec((8, BM), lambda i: (i, 0), memory_space=pltpu.VMEM)
bK_spec = pl.BlockSpec((N, BK), lambda i: (0, i), memory_space=pltpu.VMEM)
bs_spec = pl.BlockSpec((NBLK, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
o_spec = pl.BlockSpec((N, BM), lambda i: (0, 0), memory_space=pltpu.VMEM)
o_shape = jax.ShapeDtypeStruct((N, BM), jnp.float32)


def prep_scales(d_ref, dm_ref, sc_ref, mn_ref):
    d = fp16_bits_to_f32(d_ref[:SBT, :])
    dmin = fp16_bits_to_f32(dm_ref[:SBT, :])
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale32 = (d[:, None, :] * sc.reshape(SBT, 8, BM)).reshape(NBLK, BM)
    min32 = (dmin[:, None, :] * mn.reshape(SBT, 8, BM)).reshape(NBLK, BM)
    return scale32, min32


def unpack_scaled(w_ref, scale32):
    vi = w_ref[:].astype(jnp.int32)
    parts = []
    for s in range(SBT):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
        parts.append((sl & 0xF).astype(jnp.float32) * se)
        parts.append((sl >> 4).astype(jnp.float32) * se)
    return jnp.concatenate(parts, 0)


# ------------------------------------------------------- minsep (baseline)
def minsep_kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, bs_ref,
                o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, min32 = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    wsc = unpack_scaled(w_ref, scale32)
    acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    acc_ref[:] -= jax.lax.dot_general(
        bs_ref[:], min32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


bP_spec = pl.BlockSpec((N, BK), lambda i: (0, i), memory_space=pltpu.VMEM)


def minsep_op(w, d, dm, sc, mn, bs, b):
    return pl.pallas_call(
        minsep_kern, grid=(STEPS,),
        in_specs=[w_spec, d_spec, d_spec, s_spec, s_spec, bP_spec, bs_spec],
        out_specs=o_spec, out_shape=o_shape,
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
    )(w, d, dm, sc, mn, b, bs)


def xla_glue(b):
    """The shipping wrapper's per-call XLA work: bsum + plane permute +
    bf16 cast (mmq_q4_k.py:permute_acts_q4k)."""
    n, k = b.shape
    bsum = jnp.sum(b.reshape(n, k // 32, 32), axis=-1).T
    bp = b.reshape(n, k // 256, 8, 2, 16).transpose(0, 1, 3, 4, 2) \
          .reshape(n, k).astype(jnp.bfloat16)
    return bp, bsum


def minsep_glue_op(w, d, dm, sc, mn, b):
    bp, bs = xla_glue(b)
    return minsep_op(w, d, dm, sc, mn, bs, bp)


# -------------------------------------------------- in-kernel variants
def block_sums(bt):
    """Per-32-column sums of (N, BK) via an MXU dot against an iota-built
    0/1 matrix — Mosaic rejects 3D lane reshapes, the MXU does this free."""
    kk = jax.lax.broadcasted_iota(jnp.int32, (BK, NBLK), 0)
    bb = jax.lax.broadcasted_iota(jnp.int32, (BK, NBLK), 1)
    s = ((kk >> 5) == bb).astype(jnp.float32)
    return jnp.dot(bt, s, preferred_element_type=jnp.float32)  # (N, NBLK)


# permutation matrix: out col h*128 + p*8 + g <- in col g*32 + h*16 + p
_P = np.zeros((256, 256), np.float32)
for g in range(8):
    for h in range(2):
        for p in range(16):
            _P[g * 32 + h * 16 + p, h * 128 + p * 8 + g] = 1.0
P256 = jnp.asarray(_P, jnp.bfloat16)


def ink_pmat_kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, p_ref,
                  o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, min32 = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    wsc = unpack_scaled(w_ref, scale32)
    bt = b_ref[:]
    bsum = block_sums(bt)
    # (N, 256) x (256, 256) permute per superblock on the MXU (loop —
    # batched dot_general does not lower in Mosaic)
    bb = bt.astype(jnp.bfloat16)
    bp = jnp.concatenate(
        [jnp.dot(bb[:, s * 256:(s + 1) * 256], p_ref[:],
                 preferred_element_type=jnp.float32)
         for s in range(SBT)], axis=1).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(bp, wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    acc_ref[:] -= jax.lax.dot_general(
        bsum, min32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


p_spec = pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM)


def ink_pmat_op(w, d, dm, sc, mn, b):
    return pl.pallas_call(
        ink_pmat_kern, grid=(STEPS,),
        in_specs=[w_spec, d_spec, d_spec, s_spec, s_spec, bK_spec, p_spec],
        out_specs=o_spec, out_shape=o_shape,
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
    )(w, d, dm, sc, mn, b, P256)


# ---- round-4 variant: the WHOLE glue (permute + bsum) as ONE dot against
# a fused block-diagonal 0/1 matrix (ops/mmq_q4_k.py:_glue_matrix) — the
# glue cost at decode widths is dot-ISSUE-dominated (5 small dots/step in
# ink_pmat), not FLOP-dominated.
def ink_bigg_kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, g_ref,
                  o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, min32 = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    wsc = unpack_scaled(w_ref, scale32)
    bb = b_ref[:].astype(jnp.bfloat16)
    bo = jnp.dot(bb, g_ref[:], preferred_element_type=jnp.float32)
    bp = bo[:, :BK].astype(jnp.bfloat16)
    bsum = bo[:, BK:BK + NBLK]
    acc_ref[:] += jnp.dot(bp, wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    acc_ref[:] -= jax.lax.dot_general(
        bsum, min32, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _bigg():
    from gguf_tpu.ops.mmq_q4_k import _glue_matrix, _plane_perm_np
    return _glue_matrix(BK, _plane_perm_np(), 5)


g_spec = pl.BlockSpec((BK, BK + 128), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)


def ink_bigg_op(w, d, dm, sc, mn, b):
    return pl.pallas_call(
        ink_bigg_kern, grid=(STEPS,),
        in_specs=[w_spec, d_spec, d_spec, s_spec, s_spec, bK_spec, g_spec],
        out_specs=o_spec, out_shape=o_shape,
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
    )(w, d, dm, sc, mn, b, _bigg())


if __name__ == "__main__":
    # correctness cross-check first (cheap, interpreter-free: tiny on-chip)
    bp_ref, bs_ref_v = xla_glue(b_nat)
    ref = minsep_op(w_u8, d16, dm16, sc_u8, mn_u8, bs_ref_v, bp_ref)
    ok = []
    for name, op in [("ink_pmat", ink_pmat_op), ("ink_bigg", ink_bigg_op)]:
        try:
            got = op(w_u8, d16, dm16, sc_u8, mn_u8, b_nat)
            err = float(jnp.max(jnp.abs(got - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-9))
            emit({"probe": f"q4k_glue {name} max_rel_err", "err": err,
                  "ref_finite": bool(jnp.isfinite(ref).all())})
            ok.append((name, op))
        except Exception as e:  # noqa: BLE001
            emit({"probe": f"q4k_glue {name} FAILED",
                  "error": repr(e)[:200]})
    log("correctness done")
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        sys.exit(0)

    bp0, bs0 = xla_glue(b_nat)
    _time(lambda w, d, dm, sc, mn, bs, bp: minsep_op(w, d, dm, sc, mn, bs,
                                                     bp),
          (w_u8, d16, dm16, sc_u8, mn_u8, bs0, bp0), "minsep_kernel_only")
    log("minsep done")
    _time(minsep_glue_op, (w_u8, d16, dm16, sc_u8, mn_u8, b_nat),
          "minsep+xla_glue")
    log("minsep+glue done")
    for name, op in ok:
        _time(op, (w_u8, d16, dm16, sc_u8, mn_u8, b_nat), name)
        log(f"{name} done")
