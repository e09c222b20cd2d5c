"""Round-3 probe, part 5: race correct-math Q4_K kernel structures in ONE
session (cross-session chip load swamps 30%+ deltas; a bf16 GEMM rides
along as the load normalizer).

  s0_old   old structure: element-order layout, 3D reshape-broadcast scale
  s1_plane per-plane repeat+multiply before the concat   (shipping now)
  s2_cat   concat raw planes -> one convert -> one multiply by a
           concatenation of per-superblock repeats
  s3_bk256 bk=256: one superblock/step -> ONE global pltpu.repeat + one
           multiply (probe-part-4 'rep' structure with correct math)
  bf16     plain bf16 GEMM 4096x4096 n=16 (load control)

All Q4_K variants run the full math (scale prep from fp16 bits + min term)
on synthetic arrays at M=K=4096, n=16, bm=2048.

Usage: python -u benchmarks/probe_q4k_struct.py
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

BM, N = 2048, 16
M, K = 4096, 4096
rng = np.random.default_rng(1)


def emit(obj):
    print(json.dumps(obj), flush=True)


def make_variant(bk, style):
    nblk = bk // 32
    sbt = bk // 256
    steps = K // bk
    g8 = max(8, sbt)

    def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, bs_ref, b_ref, o_ref,
             acc_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        d = fp16_bits_to_f32(d_ref[:sbt, :])
        dmin = fp16_bits_to_f32(dm_ref[:sbt, :])
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        scale32 = (d[:, None, :] * sc.reshape(sbt, 8, BM)).reshape(nblk, BM)
        min32 = (dmin[:, None, :] * mn.reshape(sbt, 8, BM)).reshape(nblk, BM)

        vi = w_ref[:].astype(jnp.int32)
        if style == "old":
            parts = []
            for s in range(sbt):
                sl = vi[s * 128:(s + 1) * 128, :]
                parts.append(sl & 0xF)
                parts.append(sl >> 4)
            q = (jnp.concatenate(parts, 0) if len(parts) > 1
                 else parts[0]).astype(jnp.float32)
            wsc = (q.reshape(nblk, 32, BM) * scale32[:, None, :]
                   ).reshape(bk, BM)
        elif style == "plane":
            parts = []
            for s in range(sbt):
                sl = vi[s * 128:(s + 1) * 128, :]
                se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
                parts.append((sl & 0xF).astype(jnp.float32) * se)
                parts.append((sl >> 4).astype(jnp.float32) * se)
            wsc = (jnp.concatenate(parts, 0) if len(parts) > 1
                   else parts[0])
        elif style == "cat":
            parts = []
            for s in range(sbt):
                sl = vi[s * 128:(s + 1) * 128, :]
                parts.append(sl & 0xF)
                parts.append(sl >> 4)
            q = (jnp.concatenate(parts, 0) if len(parts) > 1
                 else parts[0]).astype(jnp.float32)
            ses = [pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 32, axis=0)
                   for s in range(sbt)]
            se = jnp.concatenate(ses, 0) if len(ses) > 1 else ses[0]
            wsc = q * se
        elif style == "bk256":
            sl = vi
            se = pltpu.repeat(scale32, 16, axis=0)       # (128, BM)
            lo = (sl & 0xF).astype(jnp.float32) * se
            hi = (sl >> 4).astype(jnp.float32) * se
            wsc = jnp.concatenate([lo, hi], 0)
        acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        acc_ref[:] -= jax.lax.dot_general(
            bs_ref[:], min32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                      jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    bs = jnp.asarray(rng.standard_normal((K // 32, N)), jnp.float32)

    w_spec = pl.BlockSpec((bk // 2, BM), lambda mi, i: (i, mi),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((g8, BM), lambda mi, i: (i, mi),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((nblk, BM), lambda mi, i: (i, mi),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((N, bk), lambda mi, i: (0, i),
                          memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((nblk, N), lambda mi, i: (i, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((N, BM), lambda mi, i: (0, mi),
                          memory_space=pltpu.VMEM)

    def op(w, d, dm, sc, mn, bs, b):
        return pl.pallas_call(
            kern, grid=(M // BM, steps),
            in_specs=[w_spec, d_spec, d_spec, s_spec, s_spec, bs_spec,
                      b_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(w, d, dm, sc, mn, bs, b)

    return op, (w, d16, dm16, sc8, mn8, bs, b)


def bf16_control():
    wb = jnp.asarray(rng.standard_normal((K, M)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    def op(wb, b):
        return jnp.dot(b, wb, preferred_element_type=jnp.float32)

    return op, (wb, b)


def time_op(op, args):
    def make(iters):
        def many(*a):
            b = a[-1]

            def body(i, carry):
                acc, xx = carry
                out = op(*a[:-1], xx)
                return acc + out, b + acc[:1, :1].astype(b.dtype) * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, M), jnp.float32), b))
            return acc.sum()
        return many

    return slope_time(make, args, lo=10, hi=210)


if __name__ == "__main__":
    variants = {
        "bf16": bf16_control(),
        "s0_old": make_variant(1024, "old"),
        "s1_plane": make_variant(1024, "plane"),
        "s2_cat": make_variant(1024, "cat"),
        "s3_bk256": make_variant(256, "bk256"),
    }
    results = {k: [] for k in variants}
    bytes_q4k = M * (K // 256) * 144
    bytes_bf16 = M * K * 2
    for rnd in range(3):
        for name, (op, args) in variants.items():
            nb = bytes_bf16 if name == "bf16" else bytes_q4k
            try:
                sec = time_op(op, args)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({nb/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:200]}")
                results[name].append(None)
    for name, secs in results.items():
        good = [s for s in secs if s]
        if not good:
            emit({"probe": f"q4k_struct {name}", "error": "failed"})
            continue
        med = float(np.median(good))
        nb = bytes_bf16 if name == "bf16" else bytes_q4k
        emit({"probe": f"q4k_struct {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(nb / med / 1e9, 1),
              "us_rounds": [round(s * 1e6, 2) for s in good]})
