"""Round-3 probe, part 3: where does the real mmq_q4_k lose ~8.6us/4096^2
vs the bare unpack+scale+dot chain (probe_int4b: 711 GB/s q4_k-equiv)?

Builds the kernel up piece by piece at the real shapes (bk=1024, bm=2048,
n=16, 4 K-steps) and times each on-chip:

  base        unpack + scale32 multiply + bf16 dot      (probe2's u8_scaled)
  +prep       scale32/min32 computed in-kernel from d/dmin fp16 bits + sc/mn
              u8 streams (the real kernel's scale prep)
  +min_sep    separate f32 min-term dot per step (the real kernel's form)
  +min_sepbf  separate min-term dot in bf16 (mode-switch probe)
  +min_fused  min term CONCATENATED into the main dot: parts list grows a
              -min32 row group, b grows matching bsum rows -> ONE dot/step
  real        the shipping mmq_q4_k at the same logical shape (same session,
              fair baseline)

Usage: python -u benchmarks/probe_q4k_parts.py
"""

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
NBLK = BK // 32          # 32 per step
SBT = BK // 256          # 4 superblocks per step


def emit(obj):
    print(json.dumps(obj), flush=True)


def _time(op, args, label, extra=None):
    def make(iters):
        def many(*a):
            b = a[-1]

            def body(i, carry):
                acc, xx = carry
                out = op(*a[:-1], xx)
                return acc + out, b + acc[:1, :1].astype(b.dtype) * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, BM), jnp.float32), b))
            return acc.sum()
        return many

    sec = slope_time(make, args, lo=10, hi=210)
    elems = STEPS * BK * BM
    gbps = elems * 4.5 / 8 / sec / 1e9
    out = {"probe": f"q4k_parts {label}", "us": round(sec * 1e6, 2),
           "q4k_equiv_gbps": round(gbps, 1)}
    if extra:
        out.update(extra)
    emit(out)
    return sec


rng = np.random.default_rng(1)
b_bf = jnp.asarray(rng.standard_normal((N, BK)), jnp.bfloat16)
w_u8 = jnp.asarray(rng.integers(0, 255, (STEPS * BK // 2, BM)), jnp.uint8)
s32f = jnp.asarray(rng.standard_normal((STEPS * NBLK, BM)), jnp.float32)
d16 = jnp.asarray(rng.integers(0, 2**15, (STEPS * 8, BM)), jnp.uint16)
dm16 = jnp.asarray(rng.integers(0, 2**15, (STEPS * 8, BM)), jnp.uint16)
sc_u8 = jnp.asarray(rng.integers(0, 63, (STEPS * NBLK, BM)), jnp.uint8)
mn_u8 = jnp.asarray(rng.integers(0, 63, (STEPS * NBLK, BM)), jnp.uint8)
bsum_f = jnp.asarray(rng.standard_normal((STEPS * NBLK, N)), jnp.float32)

w_spec = pl.BlockSpec((BK // 2, BM), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
s_spec = pl.BlockSpec((NBLK, BM), lambda i: (i, 0), memory_space=pltpu.VMEM)
d_spec = pl.BlockSpec((8, BM), lambda i: (i, 0), memory_space=pltpu.VMEM)
b_spec = pl.BlockSpec((N, BK), lambda i: (0, 0), memory_space=pltpu.VMEM)
bs_spec = pl.BlockSpec((NBLK, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
o_spec = pl.BlockSpec((N, BM), lambda i: (0, 0), memory_space=pltpu.VMEM)
o_shape = jax.ShapeDtypeStruct((N, BM), jnp.float32)


def unpack_parts(w_ref):
    vi = w_ref[:].astype(jnp.int32)
    parts = []
    for s in range(SBT):
        sl = vi[s * 128:(s + 1) * 128, :]
        parts.append(sl & 0xF)
        parts.append(sl >> 4)
    return parts


def pcall(kern, in_specs, *arrs):
    return pl.pallas_call(
        kern, grid=(STEPS,), in_specs=in_specs, out_specs=o_spec,
        out_shape=o_shape,
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
    )(*arrs)


# ------------------------------------------------------------------ base
def base_kern(w_ref, s_ref, b_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    q = jnp.concatenate(unpack_parts(w_ref), 0).astype(jnp.float32)
    wsc = (q.reshape(NBLK, 32, BM) * s_ref[:][:, None, :]).reshape(BK, BM)
    acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def base_op(w, s, b):
    return pcall(base_kern, [w_spec, s_spec, b_spec], w, s, b)


# ------------------------------------------------------------------ +prep
def prep_scales(d_ref, dm_ref, sc_ref, mn_ref):
    d = fp16_bits_to_f32(d_ref[:SBT, :])
    dmin = fp16_bits_to_f32(dm_ref[:SBT, :])
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
    scale32 = (d[:, None, :] * sc.reshape(SBT, 8, BM)).reshape(NBLK, BM)
    min32 = (dmin[:, None, :] * mn.reshape(SBT, 8, BM)).reshape(NBLK, BM)
    return scale32, min32


def prep_kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, _ = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    q = jnp.concatenate(unpack_parts(w_ref), 0).astype(jnp.float32)
    wsc = (q.reshape(NBLK, 32, BM) * scale32[:, None, :]).reshape(BK, BM)
    acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def prep_op(w, d, dm, sc, mn, b):
    return pcall(prep_kern,
                 [w_spec, d_spec, d_spec, s_spec, s_spec, b_spec],
                 w, d, dm, sc, mn, b)


# -------------------------------------------------------------- +min_sep
def minsep_kern(bf16_min, w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref,
                bs_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, min32 = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    q = jnp.concatenate(unpack_parts(w_ref), 0).astype(jnp.float32)
    wsc = (q.reshape(NBLK, 32, BM) * scale32[:, None, :]).reshape(BK, BM)
    acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    if bf16_min:
        acc_ref[:] -= jax.lax.dot_general(
            bs_ref[:].astype(jnp.bfloat16), min32.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        acc_ref[:] -= jax.lax.dot_general(
            bs_ref[:], min32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def minsep_op(w, d, dm, sc, mn, bs, b):
    import functools
    return pcall(functools.partial(minsep_kern, False),
                 [w_spec, d_spec, d_spec, s_spec, s_spec, b_spec, bs_spec],
                 w, d, dm, sc, mn, b, bs)


def minsepbf_op(w, d, dm, sc, mn, bs, b):
    import functools
    return pcall(functools.partial(minsep_kern, True),
                 [w_spec, d_spec, d_spec, s_spec, s_spec, b_spec, bs_spec],
                 w, d, dm, sc, mn, b, bs)


# ------------------------------------------------------------- +min_fused
# b gains NBLK extra columns carrying bsum for this step; weight parts gain
# a -min32 row group: one dot computes main + min together.
def minfused_kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, bx_ref, o_ref,
                  acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    scale32, min32 = prep_scales(d_ref, dm_ref, sc_ref, mn_ref)
    q = jnp.concatenate(unpack_parts(w_ref), 0).astype(jnp.float32)
    wsc = (q.reshape(NBLK, 32, BM) * scale32[:, None, :]).reshape(BK, BM)
    minpad = jnp.concatenate(
        [-min32, jnp.zeros((128 - NBLK, BM), jnp.float32)], 0)
    wall = jnp.concatenate([wsc, minpad], 0)          # (BK+128, BM)
    acc_ref[:] += jnp.dot(bx_ref[:], wall.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


bx_spec = pl.BlockSpec((N, BK + 128), lambda i: (0, i),
                       memory_space=pltpu.VMEM)


def minfused_op(w, d, dm, sc, mn, bx):
    return pcall(minfused_kern,
                 [w_spec, d_spec, d_spec, s_spec, s_spec, bx_spec],
                 w, d, dm, sc, mn, bx)


# ------------------------------------------------------------ nocat_scratch
# jnp.concatenate of the 8 scaled planes costs a full (BK, BM) copy pass;
# write each scaled plane into a bf16 VMEM scratch slice instead (the bf16
# convert rides the same write), then one dot from the scratch.
def nocat_kern(w_ref, s_ref, b_ref, o_ref, acc_ref, w_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    vi = w_ref[:].astype(jnp.int32)
    for s in range(SBT):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(s_ref[s * 8:(s + 1) * 8, :], 16, axis=0)
        lo = (sl & 0xF).astype(jnp.float32) * se
        hi = (sl >> 4).astype(jnp.float32) * se
        w_scr[2 * s * 128:(2 * s + 1) * 128, :] = lo.astype(jnp.bfloat16)
        w_scr[(2 * s + 1) * 128:(2 * s + 2) * 128, :] = hi.astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(b_ref[:], w_scr[:],
                          preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def nocat_op(w, s, b):
    return pl.pallas_call(
        nocat_kern, grid=(STEPS,), in_specs=[w_spec, s_spec, b_spec],
        out_specs=o_spec, out_shape=o_shape,
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32),
                        pltpu.VMEM((BK, BM), jnp.bfloat16)],
    )(w, s, b)


# ----------------------------------------------------------------- dots8
# no concat at all: one (N, 256) x (256, BM) dot per superblock pair of
# planes, accumulated — trades the copy pass for 4x more (shorter) MXU ops
def dots8_kern(w_ref, s_ref, b_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    vi = w_ref[:].astype(jnp.int32)
    for s in range(SBT):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(s_ref[s * 8:(s + 1) * 8, :], 16, axis=0)
        lo = ((sl & 0xF).astype(jnp.float32) * se).astype(jnp.bfloat16)
        hi = ((sl >> 4).astype(jnp.float32) * se).astype(jnp.bfloat16)
        wpair = jnp.concatenate([lo, hi], 0)          # (256, BM)
        acc_ref[:] += jnp.dot(b_ref[:, s * 256:(s + 1) * 256], wpair,
                              preferred_element_type=jnp.float32)

    @pl.when(i == STEPS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def dots8_op(w, s, b):
    return pcall(dots8_kern, [w_spec, s_spec, b_spec], w, s, b)


if __name__ == "__main__":
    _time(base_op, (w_u8, s32f, b_bf), "base")
    log("base done")
    _time(nocat_op, (w_u8, s32f, b_bf), "nocat_scratch")
    log("nocat done")
    _time(dots8_op, (w_u8, s32f, b_bf), "dots8")
    log("dots8 done")
    _time(prep_op, (w_u8, d16, dm16, sc_u8, mn_u8, b_bf), "+prep")
    log("+prep done")
    _time(minsep_op, (w_u8, d16, dm16, sc_u8, mn_u8, bsum_f, b_bf),
          "+min_sep_f32")
    log("+min_sep_f32 done")
    _time(minsepbf_op, (w_u8, d16, dm16, sc_u8, mn_u8, bsum_f, b_bf),
          "+min_sep_bf16")
    log("+min_sep_bf16 done")
    bx = jnp.asarray(rng.standard_normal((N, STEPS * (BK + 128))),
                     jnp.bfloat16)
    _time(minfused_op, (w_u8, d16, dm16, sc_u8, mn_u8, bx), "+min_fused")
    log("+min_fused done")

    # the shipping kernel, same logical GEMM (m=4096 so 2 M-tiles = 8 steps;
    # report /2 for per-4-step comparability)
    from gguf_tpu.ops.mmq_q4_k import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import q4_k_to_soa

    m, k = 4096, 4096
    wq = quantize_q4_k(rng.standard_normal((m, k)).astype(np.float32))
    soa = q4_k_to_soa(wq, m, k)
    soa = jax.tree_util.tree_map(jnp.asarray, soa)
    x = jnp.asarray(rng.standard_normal((N, k)), jnp.float32)

    import functools
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast")

    def make(iters):
        def many(wt, xx):
            def body(i, carry):
                acc, v = carry
                out = op(wt, v)
                return acc + out, x + acc[:, :1] * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, m), jnp.float32), xx))
            return acc.sum()
        return many

    sec = slope_time(make, (soa, x), lo=10, hi=210)
    emit({"probe": "q4k_parts real_mmq_q4_k (4096x4096, /2 for per-4step)",
          "us": round(sec * 1e6, 2), "us_per_4steps": round(sec * 5e5, 2),
          "gbps": round(m * (k // 256) * 144 / sec / 1e9, 2)})
    log("real kernel done")
