"""On-chip probes for the round-3 Q4_K kernel re-attack (VERDICT #2/#3).

Questions answered on the REAL chip (CPU timings meaningless here):

1. Does Mosaic lower jnp.int4 VMEM tiles + int4->f32 convert at all, and
   at what per-element cost vs the u8 shift/mask chain? If the convert is
   cheap, Q4_K collapses to a q8_0-shaped chain (convert + scale) with the
   +8 offset folded into the existing min-term matmul.
2. What is the achievable HBM *read* bandwidth (the roofline denominator)?
   A read-only Pallas stream: each grid step reads one tile and folds it
   into a small VMEM checksum; writes are negligible. Sweeps sizes.
3. Conversion micro-costs at tile scale: u8->i32 (current), i32-word
   extract (repacked layout), int4->f32 (hardware unpack), int4->int8.

Usage: python -u benchmarks/probe_int4.py [--fast]
Appends one JSON line per probe to stdout (copy into RESULTS_v5e.jsonl).
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

from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))  # relay warm-up
log("relay warm")


def emit(obj):
    print(json.dumps(obj), flush=True)


# ---------------------------------------------------------------- probe 1:
# int4 smoke test: load int4 tile, convert to f32, scale, write back.
def int4_smoke():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.float32) * 2.0

    x = jnp.arange(-8, 8, dtype=jnp.int32).reshape(1, 16)
    x = jnp.broadcast_to(x, (64, 16)).reshape(64, 16)
    try:
        x4 = x.astype(jnp.int4)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 16), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x4)
        ok = bool(np.allclose(np.asarray(out), np.asarray(x) * 2.0))
        emit({"probe": "int4_convert_smoke", "ok": ok})
        return ok
    except Exception as e:  # noqa: BLE001
        emit({"probe": "int4_convert_smoke", "ok": False,
              "error": repr(e)[:300]})
        return False


# ---------------------------------------------------------------- probe 2:
# int4 dot smoke: int4 weights -> f32 -> bf16, dot against bf16 activations.
def int4_dot_smoke():
    def kern(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.float32).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    wi = rng.integers(-8, 8, (512, 256)).astype(np.int32)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    try:
        w4 = jnp.asarray(wi).astype(jnp.int4)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x, jnp.bfloat16), w4)
        ref = x.astype(np.float32) @ wi.astype(np.float32)
        err = float(np.max(np.abs(np.asarray(out) - ref)) /
                    (np.abs(ref).max() + 1e-9))
        emit({"probe": "int4_dot_smoke", "ok": err < 0.02, "rel_err": err})
        return err < 0.02
    except Exception as e:  # noqa: BLE001
        emit({"probe": "int4_dot_smoke", "ok": False, "error": repr(e)[:300]})
        return False


# ---------------------------------------------------------------- probe 3:
# HBM read roofline: read-only stream over a big array, tiny checksum out.
def hbm_read_bw(size_mb):
    rows = size_mb * 1024 * 1024 // (4 * 512)
    bm, bk = 2048, 512
    x = jnp.ones((rows, bk), jnp.float32)

    def kern(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += x_ref[:].reshape(bm // 8, 8, bk).sum(0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def stream(xx):
        return pl.pallas_call(
            kern,
            grid=(rows // bm,),
            in_specs=[pl.BlockSpec((bm, bk), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, bk), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, bk), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, bk), jnp.float32)],
        )(xx)

    def make(iters):
        def many(xx):
            def body(i, carry):
                acc, v = carry
                out = stream(v)
                return acc + out, xx + acc[:1, :1] * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((8, bk), jnp.float32), xx))
            return acc.sum()
        return many

    sec = slope_time(make, (x,), lo=5, hi=45)
    nbytes = rows * bk * 4
    gbps = nbytes / sec / 1e9
    emit({"probe": f"hbm_read_stream {size_mb}MB f32", "gbps": round(gbps, 1),
          "time_us": round(sec * 1e6, 1)})
    return gbps


# ---------------------------------------------------------------- probe 4:
# convert micro-costs at tile scale: each kernel streams the same logical
# 4096x2048 i32-elements worth of codes and runs chain -> bf16 -> one dot,
# so differences isolate the unpack path.
def convert_cost(kind):
    bm, bk = 2048, 1024
    n = 16
    steps = 4
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, bk)), jnp.bfloat16)

    if kind == "u8_shift":      # current layout: (bk/2, bm) u8 bytes
        w = jnp.asarray(rng.integers(0, 255, (steps * bk // 2, bm)), jnp.uint8)

        def kern(w_ref, b_ref, o_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(bk // 256):
                sl = vi[s * 128:(s + 1) * 128, :]
                parts.append(sl & 0xF)
                parts.append(sl >> 4)
            q = jnp.concatenate(parts, axis=0).astype(jnp.float32)
            acc_ref[:] += jnp.dot(b_ref[:],
                                  q.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]

        spec = pl.BlockSpec((bk // 2, bm), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    elif kind == "i32_extract":  # repacked: (bk/8, bm) i32 words, 8 nibbles
        w = jnp.asarray(
            rng.integers(0, 2**31 - 1, (steps * bk // 8, bm)), jnp.int32)

        def kern(w_ref, b_ref, o_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            vi = w_ref[:]
            parts = [(vi >> (4 * j)) & 0xF for j in range(8)]
            q = jnp.concatenate(parts, axis=0).astype(jnp.float32)
            acc_ref[:] += jnp.dot(b_ref[:],
                                  q.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]

        spec = pl.BlockSpec((bk // 8, bm), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    elif kind == "int4":        # (bk, bm) int4, hardware convert
        w = jnp.asarray(rng.integers(-8, 8, (steps * bk, bm)),
                        jnp.int32).astype(jnp.int4)

        def kern(w_ref, b_ref, o_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            q = w_ref[:].astype(jnp.float32)
            acc_ref[:] += jnp.dot(b_ref[:],
                                  q.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]

        spec = pl.BlockSpec((bk, bm), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    elif kind == "int4_bf16":   # int4 -> bf16 direct convert
        w = jnp.asarray(rng.integers(-8, 8, (steps * bk, bm)),
                        jnp.int32).astype(jnp.int4)

        def kern(w_ref, b_ref, o_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            q = w_ref[:].astype(jnp.bfloat16)
            acc_ref[:] += jnp.dot(b_ref[:], q,
                                  preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]

        spec = pl.BlockSpec((bk, bm), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    elif kind == "i8_baseline":  # q8_0-like: (bk, bm) i8, convert + dot
        w = jnp.asarray(rng.integers(-127, 127, (steps * bk, bm)), jnp.int8)

        def kern(w_ref, b_ref, o_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            q = w_ref[:].astype(jnp.float32)
            acc_ref[:] += jnp.dot(b_ref[:],
                                  q.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]

        spec = pl.BlockSpec((bk, bm), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    else:
        raise ValueError(kind)

    def op(ww, bb):
        return pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[spec,
                      pl.BlockSpec((n, bk), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, bm), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, bm), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, bm), jnp.float32)],
        )(ww, bb)

    try:
        def make(iters):
            def many(ww, bb):
                def body(i, carry):
                    acc, xx = carry
                    out = op(ww, xx)
                    return acc + out, bb + acc[:1, :1].astype(bb.dtype) * 0
                acc, _ = jax.lax.fori_loop(
                    0, iters, body, (jnp.zeros((n, bm), jnp.float32), bb))
                return acc.sum()
            return many

        sec = slope_time(make, (w, b), lo=10, hi=110)
        elems = steps * bk * bm
        emit({"probe": f"convert_chain {kind}",
              "us": round(sec * 1e6, 2),
              "elems_per_us": round(elems / (sec * 1e6) / 1e6, 2),
              "note": "4 K-steps of (1024,2048), chain->bf16->dot n=16"})
        return sec
    except Exception as e:  # noqa: BLE001
        emit({"probe": f"convert_chain {kind}", "error": repr(e)[:300]})
        return None


if __name__ == "__main__":
    fast = "--fast" in sys.argv
    ok4 = int4_smoke()
    log("int4 smoke done")
    if ok4:
        int4_dot_smoke()
        log("int4 dot smoke done")
    for mb in ([256] if fast else [64, 256, 512]):
        hbm_read_bw(mb)
        log(f"hbm read {mb}MB done")
    kinds = ["i8_baseline", "u8_shift", "i32_extract"]
    if ok4:
        kinds += ["int4", "int4_bf16"]
    for kk in kinds:
        convert_cost(kk)
        log(f"convert {kk} done")
    log("all probes done")
