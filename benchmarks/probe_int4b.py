"""Round-3 probes, part 2.

1. HBM read roofline, fixed harness: the loop-carried perturbation is a
   single-tile dynamic_update_slice (part 1's full-array add rewrote the
   whole buffer each iteration and corrupted the 256/512MB points).
2. int4 inside the kernel via pltpu.bitcast from the streamed u8/i32 tile
   (creating S4 arrays on the host trips a relay bug), then hardware
   int4->f32/bf16 convert. If the convert is ~1 slot/elem the Q4_K unpack
   chain collapses to q8_0 shape.
3. Scaled chains: the part-1 chains lacked the per-32-block scale multiply;
   these add it, so (chain - part1 chain) isolates the scaling tax, and
   int4 vs u8 isolates the unpack tax, both at full kernel shape.

Usage: python -u benchmarks/probe_int4b.py
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

from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")


def emit(obj):
    print(json.dumps(obj), flush=True)


# ---------------------------------------------------------------- probe 1:
def hbm_read_bw(size_mb):
    bm, bk = 2048, 512
    rows = size_mb * 1024 * 1024 // (4 * bk)
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
                # perturb ONE tile so the stream can't be hoisted, without
                # rewriting the whole buffer
                v = jax.lax.dynamic_update_slice(
                    v, out[:8, :] * 1e-30 + v[:8, :], (0, 0))
                return acc + out, v
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((8, bk), jnp.float32), xx))
            return acc.sum()
        return many

    sec = slope_time(make, (x,), lo=5, hi=45)
    gbps = rows * bk * 4 / sec / 1e9
    emit({"probe": f"hbm_read_stream {size_mb}MB f32 (fixed harness)",
          "gbps": round(gbps, 1), "time_us": round(sec * 1e6, 1)})


# ---------------------------------------------------------------- probe 2:
def int4_bitcast_smoke():
    """Bitcast a u8 VMEM tile to int4 inside the kernel; check the value
    mapping (which nibble lands at which row) and that convert works."""
    def kern(x_ref, o_ref):
        x4 = pltpu.bitcast(x_ref[:], jnp.int4)      # (rows*2, cols)?
        o_ref[:] = x4.astype(jnp.float32)

    rows, cols = 8, 128
    rng = np.random.default_rng(0)
    xb = rng.integers(0, 256, (rows, cols)).astype(np.uint8)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows * 2, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(xb))
        got = np.asarray(out)
        lo = (xb & 0xF).astype(np.int8)
        lo = np.where(lo > 7, lo - 16, lo)
        hi = (xb >> 4).astype(np.int8)
        hi = np.where(hi > 7, hi - 16, hi)
        # try both interleave orders to learn the layout
        order_lo_hi_rows = np.concatenate(
            [np.stack([lo[r], hi[r]]) for r in range(rows)], 0)
        ok_interleave = bool(np.array_equal(got, order_lo_hi_rows))
        order_hi_lo_rows = np.concatenate(
            [np.stack([hi[r], lo[r]]) for r in range(rows)], 0)
        ok_swapped = bool(np.array_equal(got, order_hi_lo_rows))
        emit({"probe": "int4_bitcast_smoke", "ok": True,
              "lo_then_hi_rows": ok_interleave, "hi_then_lo_rows": ok_swapped,
              "sample_got": got[:4, :4].tolist(),
              "sample_lo": lo[:2, :4].tolist(),
              "sample_hi": hi[:2, :4].tolist()})
        return True
    except Exception as e:  # noqa: BLE001
        emit({"probe": "int4_bitcast_smoke", "ok": False,
              "error": repr(e)[:300]})
        return False


# ---------------------------------------------------------------- probe 3:
# full-shape scaled chains: (bk,bm) tile per step, per-32-block scale
# multiply included -> directly comparable to the real mmq_q4_k step time.
def scaled_chain(kind):
    bm, bk = 2048, 1024
    n = 16
    steps = 4
    nblk = bk // 32
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, bk)), jnp.bfloat16)
    s32 = jnp.asarray(rng.standard_normal((steps * nblk, bm)), jnp.float32)
    sspec = pl.BlockSpec((nblk, bm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    if kind == "u8_scaled":
        w = jnp.asarray(rng.integers(0, 255, (steps * bk // 2, bm)), jnp.uint8)
        wspec = pl.BlockSpec((bk // 2, bm), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

        def unpack(w_ref):
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(bk // 256):
                sl = vi[s * 128:(s + 1) * 128, :]
                parts.append(sl & 0xF)
                parts.append(sl >> 4)
            return jnp.concatenate(parts, axis=0).astype(jnp.float32)
    elif kind == "int4_scaled":
        # streamed as u8, bitcast to int4 in-kernel, hardware convert
        w = jnp.asarray(rng.integers(0, 255, (steps * bk // 2, bm)), jnp.uint8)
        wspec = pl.BlockSpec((bk // 2, bm), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

        def unpack(w_ref):
            x4 = pltpu.bitcast(w_ref[:], jnp.int4)
            return x4.astype(jnp.float32)
    elif kind == "int4_bf16_scaled":
        w = jnp.asarray(rng.integers(0, 255, (steps * bk // 2, bm)), jnp.uint8)
        wspec = pl.BlockSpec((bk // 2, bm), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

        def unpack(w_ref):
            x4 = pltpu.bitcast(w_ref[:], jnp.int4)
            return x4.astype(jnp.bfloat16)
    else:
        raise ValueError(kind)

    def kern(w_ref, s_ref, b_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        q = unpack(w_ref)
        scale = s_ref[:]
        if q.dtype == jnp.bfloat16:
            scale = scale.astype(jnp.bfloat16)
        wsc = (q.reshape(nblk, 32, bm) * scale[:, None, :]).reshape(bk, bm)
        acc_ref[:] += jnp.dot(b_ref[:], wsc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        @pl.when(i == steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def op(ww, ss, bb):
        return pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=[wspec, sspec,
                      pl.BlockSpec((n, bk), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, bm), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, bm), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n, bm), jnp.float32)],
        )(ww, ss, bb)

    try:
        def make(iters):
            def many(ww, ss, bb):
                def body(i, carry):
                    acc, xx = carry
                    out = op(ww, ss, xx)
                    return acc + out, bb + acc[:1, :1].astype(bb.dtype) * 0
                acc, _ = jax.lax.fori_loop(
                    0, iters, body, (jnp.zeros((n, bm), jnp.float32), bb))
                return acc.sum()
            return many

        sec = slope_time(make, (w, s32, b), lo=10, hi=110)
        elems = steps * bk * bm
        q4k_equiv_bytes = elems * 4.5 / 8          # 4.5 bits/elem
        emit({"probe": f"scaled_chain {kind}",
              "us": round(sec * 1e6, 2),
              "q4k_equiv_gbps": round(q4k_equiv_bytes / sec / 1e9, 1),
              "note": "4 K-steps (1024,2048) unpack+scale+dot n=16"})
    except Exception as e:  # noqa: BLE001
        emit({"probe": f"scaled_chain {kind}", "error": repr(e)[:300]})


if __name__ == "__main__":
    for mb in [64, 256, 512]:
        hbm_read_bw(mb)
        log(f"hbm read {mb}MB done")
    ok = int4_bitcast_smoke()
    log(f"int4 bitcast smoke done ok={ok}")
    kinds = ["u8_scaled"] + (["int4_scaled", "int4_bf16_scaled"] if ok else [])
    for kk in kinds:
        scaled_chain(kk)
        log(f"scaled {kk} done")
    log("all done")
