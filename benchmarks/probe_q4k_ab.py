"""Round-3 probe, part 4: interleaved A/B of Q4_K chain variants.

Cross-session chip load varies hugely here (relay warm 88s vs 270s between
consecutive runs), so each variant is measured THREE times round-robin in
one session and reported as median + all rounds; the shipping kernel rides
in every round as the control.

Variants (full Q4_K math: unpack + scale prep + scale mult + min term):
  real       shipping mmq_q4_k (act_quant=False, precision=fast)
  flat       mini-structure kernel, same math, 1D grid, min term separate
  i32x       flat but qs streamed as i32 words (loader-repack simulation):
             extract 8 nibble planes with shift/mask, NO u8->i32 convert.
             Element order differs from GGUF order by a fixed permutation
             handled at load/activation side; here random data stands in.
  rep        flat but scale expansion via pltpu.repeat instead of the 3D
             reshape-broadcast multiply.
  bigk       flat with bk=2048 (fewer, larger steps).

Usage: python -u benchmarks/probe_q4k_ab.py
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


def emit(obj):
    print(json.dumps(obj), flush=True)


rng = np.random.default_rng(1)


def flat_variant(bk, unpack_kind, scale_kind):
    nblk = bk // 32
    sbt = bk // 256
    steps = K // bk

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

        if unpack_kind == "u8":
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(sbt):
                sl = vi[s * 128:(s + 1) * 128, :]
                parts.append(sl & 0xF)
                parts.append(sl >> 4)
        else:                                   # i32 words, 8 planes each
            vi = w_ref[:]
            parts = [(vi >> (4 * j)) & 0xF for j in range(8)]
        q = jnp.concatenate(parts, 0).astype(jnp.float32)

        if scale_kind == "reshape":
            wsc = (q.reshape(nblk, 32, BM) * scale32[:, None, :]
                   ).reshape(bk, BM)
        else:                                   # pltpu.repeat expansion
            se = pltpu.repeat(scale32, 32, axis=0)
            if unpack_kind != "u8":
                pass  # plane order: scale rows pre-permuted at load time
            wsc = q * se
        acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        acc_ref[:] -= jax.lax.dot_general(
            bs_ref[:], min32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    if unpack_kind == "u8":
        w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
        w_spec = pl.BlockSpec((bk // 2, BM), lambda mi, i: (i, mi),
                              memory_space=pltpu.VMEM)
    else:
        w = jnp.asarray(
            rng.integers(0, 2**31 - 1, (K // 8, M)), jnp.int32)
        w_spec = pl.BlockSpec((bk // 8, BM), lambda mi, i: (i, mi),
                              memory_space=pltpu.VMEM)
    g8 = max(8, sbt)
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                      jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    bs = jnp.asarray(rng.standard_normal((K // 32, N)), jnp.float32)

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


def real_op_and_args():
    from gguf_tpu.ops.mmq_q4_k import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import q4_k_to_soa

    wq = quantize_q4_k(rng.standard_normal((M, K)).astype(np.float32))
    soa = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, M, K))
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast")
    return op, (soa, x)


if __name__ == "__main__":
    variants = {
        "real": real_op_and_args(),
        "flat": flat_variant(1024, "u8", "reshape"),
        "i32x": flat_variant(1024, "i32", "reshape"),
        "rep": flat_variant(1024, "u8", "repeat"),
        "bigk": flat_variant(2048, "u8", "reshape"),
    }
    results = {k: [] for k in variants}
    bytes_q4k = M * (K // 256) * 144
    for rnd in range(3):
        for name, (op, args) in variants.items():
            try:
                sec = time_op(op, args)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({bytes_q4k/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:200]}")
                results[name].append(None)
    for name, secs in results.items():
        good = [s for s in secs if s]
        if not good:
            emit({"probe": f"q4k_ab {name}", "error": "all rounds failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"q4k_ab {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(bytes_q4k / med / 1e9, 1),
              "us_rounds": [round(s * 1e6, 2) for s in good]})
