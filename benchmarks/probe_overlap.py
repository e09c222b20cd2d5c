"""Round-4 probe: does VPU dequant overlap the MXU dot inside a Pallas body?

DESIGN.md §2a claims the Q4_K kernel is at a hardware wall: dequant (VPU,
~13.2us for a 4096x2048 tile) and the dot (MXU, ~8.7us) serialize, so the
kernel floor is their SUM (21.9us -> ~440 GB/s) instead of their MAX
(~13.2us -> ~725 GB/s ~ 95% of the measured achievable HBM stream).
VERDICT r3 #1: that claim was never tested directly. This probe attacks it
three ways, most-decisive first:

Part 1 — ISOLATION: one kernel body computes (a) only a (16,1024)x(1024,2048)
bf16 dot from a resident VMEM tile, (b) only the full Q4_K-shaped dequant
chain (u8 -> i32 -> 8 shift/mask planes -> f32 x repeat-tiled scale -> bf16)
on independent data, (c) both, dataflow-independent, (d) both with the ops
manually interleaved in 4 chunks. All operands live in VMEM (constant block
index maps; no HBM streaming) so the measurement is pure compute issue.
  time(both) ~= max(dot, vpu)  -> the units CAN overlap; restructure kernel.
  time(both) ~= dot + vpu      -> issue-level serialization; the wall is real.

Part 2 — SOFTWARE-PIPELINED REAL MATH: the flat Q4_K kernel (full math:
unpack + scale prep + scale mult + min term, random byte standins) with the
K-step body split into per-chunk dequant+dot pairs ordered so chunk c's dot
is adjacent to chunk c+1's independent dequant (chunks=2: K=512 dots,
chunks=4: K=256). Also stacks the two r3 wins that were measured separately:
i32-word qs storage (no u8->i32 convert; q4k_ab i32x 487 GB/s) + repeat-tiled
scales (q4k_ab rep 487 GB/s), alone and chunked.

Part 3 — INNER PIPELINE: pltpu.emit_pipeline over K inside the kernel (qs in
ANY/HBM, explicit double-buffered inner grid) in case Mosaic schedules an
inner pipeline differently from a grid-step body.

Every variant is slope-timed (utils/benchmark.py) and emitted as a JSON line
for RESULTS_v5e.jsonl. Reference lineage: the fused-kernel-at-roofline
premise, /root/reference/kernels/mmq_q4_k.py:118-229.

Usage: python -u benchmarks/probe_overlap.py [part1|part2|part3|all]
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

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.ops.common import fp16_bits_to_f32
from gguf_tpu.utils.benchmark import slope_time

M, K, N = 4096, 4096, 16
BM = 2048
BK = 1024
SBT = BK // 256          # superblocks per K step
NBLK = BK // 32          # 32-blocks per K step
BYTES_Q4K = M * (K // 256) * 144

rng = np.random.default_rng(7)


def emit(obj):
    print(json.dumps(obj), flush=True)


# --------------------------------------------------------------------------
# Part 1: isolation — pure-compute bodies, constant block maps, grid=(steps,)
# --------------------------------------------------------------------------

ISO_STEPS = 32


def _chain(x_i32, s_ref, lo, hi):
    """The Q4_K dequant chain on superblocks [lo, hi): 128-row u8 slices ->
    two nibble planes -> f32 * repeat-tiled scale -> list of f32 parts."""
    parts = []
    for sb in range(lo, hi):
        sl = x_i32[sb * 128:(sb + 1) * 128, :]
        se = pltpu.repeat(s_ref[sb * 8:(sb + 1) * 8, :], 16, axis=0)
        parts.append((sl & 0xF).astype(jnp.float32) * se)
        parts.append((sl >> 4).astype(jnp.float32) * se)
    return parts


def iso_variant(kind):
    """kind in {dot, vpu, both, both_ilv}.

    LICM hazard (hit by the first run of this probe, archived as the 0.32us
    iso_vpu line): with constant block index maps the dequant chain's inputs
    are grid-step-invariant and Mosaic hoists the WHOLE chain out of the
    32-step grid loop (the dot survives only because it accumulates). A
    dynamic-sublane-slice fix and a @pl.when parity-branch fix both crashed
    the Mosaic compiler for the big-concat variants. Final design: the u8
    source STREAMS through an alternating block index map (i % 2 over a
    1024-row buffer) — the loaded data changes every step so nothing can
    hoist, the body stays exactly the shape that compiles, and the 1MB
    alternating DMA hides under the chain compute."""

    def kern(w_ref, x_ref, s_ref, b_ref, o_ref, acc_ref, acc2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def chain():
            vi = x_ref[:].astype(jnp.int32)
            parts = []
            for sb in range(SBT):
                sl = vi[sb * 128:(sb + 1) * 128, :]
                se = pltpu.repeat(s_ref[sb * 8:(sb + 1) * 8, :], 16, axis=0)
                parts.append((sl & 0xF).astype(jnp.float32) * se)
                parts.append((sl >> 4).astype(jnp.float32) * se)
            return jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)

        if kind == "dot":
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif kind == "vpu":
            acc2_ref[:] = chain()
        elif kind == "both":
            acc2_ref[:] = chain()
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:  # both_ilv: alternate independent dot/dequant chunks
            vi = x_ref[:].astype(jnp.int32)
            for c in range(SBT):
                sl = vi[c * 128:(c + 1) * 128, :]
                se = pltpu.repeat(s_ref[c * 8:(c + 1) * 8, :], 16, axis=0)
                wd = jnp.concatenate(
                    [(sl & 0xF).astype(jnp.float32) * se,
                     (sl >> 4).astype(jnp.float32) * se],
                    axis=0).astype(jnp.bfloat16)
                acc2_ref[c * 256:(c + 1) * 256, :] = wd
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:, c * 256:(c + 1) * 256],
                    w_ref[c * 256:(c + 1) * 256, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(i == ISO_STEPS - 1)
        def _():
            if kind == "dot":
                o_ref[:] = acc_ref[:]
            elif kind == "vpu":
                o_ref[:] = acc2_ref[:N, :].astype(jnp.float32)
            else:
                o_ref[:] = acc_ref[:] + acc2_ref[:N, :].astype(jnp.float32)

    w = jnp.asarray(rng.standard_normal((BK, BM)), jnp.bfloat16)
    x = jnp.asarray(rng.integers(0, 255, (BK, BM)), jnp.uint8)
    s0 = jnp.asarray(rng.standard_normal((SBT * 8, BM)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((N, BK)), jnp.bfloat16)

    const2 = lambda i: (0, 0)
    op = lambda w, x, s, b: pl.pallas_call(
        kern, grid=(ISO_STEPS,),
        in_specs=[
            pl.BlockSpec((BK, BM), const2, memory_space=pltpu.VMEM),
            # alternating half: streamed, so the chain can never hoist
            pl.BlockSpec((BK // 2, BM), lambda i: (i % 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SBT * 8, BM), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BK), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, BM), const2, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, BM), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32),
                        pltpu.VMEM((BK, BM), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(w, x, s, b)

    def make(iters):
        def many(w, x, s, b):
            def body(i, carry):
                acc, ss, bb = carry
                out = op(w, x, ss, bb)
                return (acc + out,
                        s + out[:1, :] * 1e-30,
                        b + (out[:, :BK] * 1e-30).astype(jnp.bfloat16))
            acc, _, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, BM), jnp.float32), s, b))
            return acc.sum()
        return many

    return make, (w, x, s0, b0)


# --------------------------------------------------------------------------
# Part 2: software-pipelined real-math flat kernels
# --------------------------------------------------------------------------

def flat_variant(chunks, storage="u8", ablate=None):
    """Full Q4_K math, bk=1024 steps over K, bm=2048; the K-step body runs
    `chunks` dequant+dot pairs (chunk dots are K=1024/chunks deep), ordered
    so each dot is adjacent to the NEXT chunk's independent dequant. storage
    'i32' streams qs as i32 words (8 nibble planes per word, no u8->i32
    convert — plane order handled at load time in a real kernel)."""
    steps = K // BK
    ck = BK // chunks            # K depth per chunk
    csb = SBT // chunks if storage == "u8" else None
    assert chunks in (1, 2, 4)

    def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, bs_ref, b_ref, o_ref,
             acc_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        d = fp16_bits_to_f32(d_ref[:SBT, :])
        dmin = fp16_bits_to_f32(dm_ref[:SBT, :])
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        scale32 = (d[:, None, :] * sc.reshape(SBT, 8, BM)).reshape(NBLK, BM)
        min32 = (dmin[:, None, :] * mn.reshape(SBT, 8, BM)).reshape(NBLK, BM)

        if storage == "u8":
            vi = w_ref[:].astype(jnp.int32)

            def dequant(c):
                parts = []
                for sb in range(c * csb, (c + 1) * csb):
                    sl = vi[sb * 128:(sb + 1) * 128, :]
                    se = pltpu.repeat(scale32[sb * 8:(sb + 1) * 8, :], 16,
                                      axis=0)
                    if ablate == "drop_scale":
                        parts.append((sl & 0xF).astype(jnp.float32))
                        parts.append((sl >> 4).astype(jnp.float32))
                    else:
                        parts.append((sl & 0xF).astype(jnp.float32) * se)
                        parts.append((sl >> 4).astype(jnp.float32) * se)
                return jnp.concatenate(parts, 0) if len(parts) > 1 \
                    else parts[0]
        else:
            vi = w_ref[:]        # i32 words: 8 nibble planes each
            rows = BK // 8       # i32 rows per step
            crow = rows // chunks

            def dequant(c):
                sl = vi[c * crow:(c + 1) * crow, :]
                parts = []
                for j in range(8):
                    se = pltpu.repeat(
                        scale32[(j // 2) * 8:(j // 2) * 8 + 8, :],
                        crow // 8, axis=0)
                    parts.append(
                        ((sl >> (4 * j)) & 0xF).astype(jnp.float32) * se)
                return jnp.concatenate(parts, 0) if len(parts) > 1 \
                    else parts[0]

        deq = dequant(0)
        for c in range(chunks):
            nxt = dequant(c + 1) if c + 1 < chunks else None
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:, c * ck:(c + 1) * ck], deq.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            deq = nxt
        if ablate != "drop_minterm":
            acc_ref[:] -= jax.lax.dot_general(
                bs_ref[:], min32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(i == steps - 1)
        def _():
            o_ref[:] = acc_ref[:]

    if storage == "u8":
        w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
        w_spec = pl.BlockSpec((BK // 2, BM), lambda mi, i: (i, mi),
                              memory_space=pltpu.VMEM)
    else:
        w = jnp.asarray(rng.integers(0, 2**31 - 1, (K // 8, M)), jnp.int32)
        w_spec = pl.BlockSpec((BK // 8, BM), lambda mi, i: (i, mi),
                              memory_space=pltpu.VMEM)
    g8 = max(8, SBT)
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)), jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    bs = jnp.asarray(rng.standard_normal((K // 32, N)), jnp.float32)

    d_spec = pl.BlockSpec((g8, BM), lambda mi, i: (i, mi),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((NBLK, BM), lambda mi, i: (i, mi),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((N, BK), lambda mi, i: (0, i),
                          memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((NBLK, N), lambda mi, i: (i, 0),
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

    return op, (w, d16, dm16, sc8, mn8, bs, b0)


def real_op_and_args():
    from gguf_tpu.ops.mmq_q4_k import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import q4_k_to_soa

    wq = quantize_q4_k(rng.standard_normal((M, K)).astype(np.float32))
    soa = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, M, K))
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast")
    return op, (soa, x)


# --------------------------------------------------------------------------
# Part 3: emit_pipeline inner pipeline over K
# --------------------------------------------------------------------------

def empipe_variant():
    steps = K // BK

    g8 = max(8, SBT)

    def kern(w_hbm, sc_hbm, mn_hbm, d_hbm, dm_hbm, b_hbm, bs_hbm, o_ref,
             acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def inner(w_ref, sc_ref, mn_ref, d_ref, dm_ref, b_ref, bs_ref):
            d = fp16_bits_to_f32(d_ref[:SBT, :])
            dmin = fp16_bits_to_f32(dm_ref[:SBT, :])
            sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
            mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
            scale32 = (d[:, None, :] * sc.reshape(SBT, 8, BM)
                       ).reshape(NBLK, BM)
            min32 = (dmin[:, None, :] * mn.reshape(SBT, 8, BM)
                     ).reshape(NBLK, BM)
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for sb in range(SBT):
                sl = vi[sb * 128:(sb + 1) * 128, :]
                se = pltpu.repeat(scale32[sb * 8:(sb + 1) * 8, :], 16,
                                  axis=0)
                parts.append((sl & 0xF).astype(jnp.float32) * se)
                parts.append((sl >> 4).astype(jnp.float32) * se)
            wd = jnp.concatenate(parts, 0).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] -= jax.lax.dot_general(
                bs_ref[:], min32, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        pltpu.emit_pipeline(
            inner,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((BK // 2, BM), lambda i: (i, 0)),
                pl.BlockSpec((NBLK, BM), lambda i: (i, 0)),
                pl.BlockSpec((NBLK, BM), lambda i: (i, 0)),
                pl.BlockSpec((g8, BM), lambda i: (i, 0)),
                pl.BlockSpec((g8, BM), lambda i: (i, 0)),
                pl.BlockSpec((N, BK), lambda i: (0, i)),
                pl.BlockSpec((NBLK, N), lambda i: (i, 0)),
            ],
        )(w_hbm, sc_hbm, mn_hbm, d_hbm, dm_hbm, b_hbm, bs_hbm)
        o_ref[:] = acc_ref[:]

    w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)), jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    bs = jnp.asarray(rng.standard_normal((K // 32, N)), jnp.float32)

    any_spec = lambda: pl.BlockSpec(memory_space=pltpu.ANY)

    def op(w, sc, mn, d, dm, b, bs):
        outs = []
        for mi in range(M // BM):
            outs.append(pl.pallas_call(
                kern,
                in_specs=[any_spec() for _ in range(7)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, BM), jnp.float32),
                scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
            )(w[:, mi * BM:(mi + 1) * BM], sc[:, mi * BM:(mi + 1) * BM],
              mn[:, mi * BM:(mi + 1) * BM], d[:, mi * BM:(mi + 1) * BM],
              dm[:, mi * BM:(mi + 1) * BM], b, bs))
        return jnp.concatenate(outs, axis=1)

    return op, (w, sc8, mn8, d16, dm16, b0, bs)


# --------------------------------------------------------------------------
# timing harness
# --------------------------------------------------------------------------

def time_op(op, args, lo=10, hi=210):
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

    return slope_time(make, args, lo=lo, hi=hi)


def run_part1():
    log("part 1: isolation")
    results = {}
    for kind in ("dot", "vpu", "both", "both_ilv"):
        make, args = iso_variant(kind)
        secs = []
        for rnd in range(3):
            try:
                s = slope_time(make, args, lo=5, hi=55)
            except Exception as e:  # noqa: BLE001
                log(f"iso_{kind} round {rnd}: ERROR {repr(e)[:300]}")
                break
            per_step = s / ISO_STEPS
            secs.append(per_step)
            log(f"iso_{kind} round {rnd}: {per_step*1e6:.2f} us/step")
        if not secs:
            emit({"probe": f"overlap iso_{kind}", "error": "failed"})
            continue
        med = float(np.median(secs))
        results[kind] = med
        emit({"probe": f"overlap iso_{kind}", "us_per_step":
              round(med * 1e6, 2),
              "us_rounds": [round(s * 1e6, 2) for s in secs],
              "shape": "dot (16,1024)x(1024,2048) bf16; "
                       "chain u8(512,2048)->bf16(1024,2048)"})
    s = results
    if all(k in s for k in ("dot", "vpu", "both")):
        emit({"probe": "overlap iso_verdict",
              "dot_us": round(s["dot"] * 1e6, 2),
              "vpu_us": round(s["vpu"] * 1e6, 2),
              "sum_us": round((s["dot"] + s["vpu"]) * 1e6, 2),
              "both_us": round(s["both"] * 1e6, 2),
              "both_ilv_us": round(s.get("both_ilv", float("nan")) * 1e6, 2),
              "overlap_fraction": round(
                  (s["dot"] + s["vpu"] - s["both"]) /
                  max(min(s["dot"], s["vpu"]), 1e-12), 3),
              "note": "overlap_fraction 1.0 = full overlap (both==max), "
                      "0.0 = strict serialization (both==sum)"})


def run_part2():
    log("part 2: software-pipelined real math")
    variants = {
        "real": real_op_and_args(),
        "flat1": flat_variant(1),
        "pipe2": flat_variant(2),
        "pipe4": flat_variant(4),
        "i32rep": flat_variant(1, "i32"),
        "i32pipe2": flat_variant(2, "i32"),
    }
    results = {k: [] for k in variants}
    for rnd in range(3):
        for name, (op, args) in variants.items():
            try:
                sec = time_op(op, args)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({BYTES_Q4K/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:300]}")
                results[name].append(None)
    for name, secs in results.items():
        good = [x for x in secs if x]
        if not good:
            emit({"probe": f"overlap {name}", "error": "all rounds failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"overlap {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES_Q4K / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in good],
              "shape": "4096x4096 n=16 q4_k full math"})


def run_part4():
    """Ablations decomposing the residual dequant increment over the dot."""
    log("part 4: ablations")
    variants = {
        "flat1b": flat_variant(1),
        "drop_scale": flat_variant(1, ablate="drop_scale"),
        "drop_minterm": flat_variant(1, ablate="drop_minterm"),
    }
    results = {k: [] for k in variants}
    for rnd in range(3):
        for name, (op, args) in variants.items():
            try:
                sec = time_op(op, args)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({BYTES_Q4K/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:300]}")
                results[name].append(None)
    for name, secs in results.items():
        good = [x for x in secs if x]
        if not good:
            emit({"probe": f"overlap {name}", "error": "all rounds failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"overlap {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES_Q4K / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in good],
              "shape": "4096x4096 n=16 q4_k ablation"})


def flat_mf(bm, bk, xpipe=False):
    """Min-fold flat Q4_K (full r4 math: plane unpack + fma affine, b
    pre-permuted bf16 outside, no bsum). xpipe=True restructures into a
    CROSS-K-STEP software pipeline: grid gets one drain step; each body
    invocation dequants THIS step's tile into a rotating (2, bk, bm)
    VMEM scratch slot and dots the PREVIOUS step's slot — the two halves
    are dataflow-INDEPENDENT, the structure iso_both measured at
    overlap_fraction 0.945. Expected floor: max(dot, dequant, stream)
    per step instead of the dependent-chain residue."""
    nblk = bk // 32
    sbt = bk // 256
    steps = K // bk
    gsteps = steps + 1 if xpipe else steps

    def prep(d_ref, dm_ref, sc_ref, mn_ref):
        d = fp16_bits_to_f32(d_ref[:sbt, :])
        dmin = fp16_bits_to_f32(dm_ref[:sbt, :])
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        scale32 = (d[:, None, :] * sc.reshape(sbt, 8, bm)).reshape(nblk, bm)
        min32 = (dmin[:, None, :] * mn.reshape(sbt, 8, bm)).reshape(nblk, bm)
        return scale32, min32

    def parts_of(vi, scale32, min32, s):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
        me = pltpu.repeat(min32[s * 8:(s + 1) * 8, :], 16, axis=0)
        return ((sl & 0xF).astype(jnp.float32) * se - me,
                (sl >> 4).astype(jnp.float32) * se - me)

    if not xpipe:
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref):
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(sbt):
                parts.extend(parts_of(vi, scale32, min32, s))
            wd = (jnp.concatenate(parts, 0) if len(parts) > 1
                  else parts[0]).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32)]
    else:
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wd_ref):
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            # dequant THIS step (index maps clamp the drain step to a
            # re-read; its slot is never consumed) — slice stores, the
            # shape that compiles under mixed scheduling
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            slot = i % 2
            for s in range(sbt):
                lo, hi = parts_of(vi, scale32, min32, s)
                wd_ref[slot, s * 256:s * 256 + 128, :] = \
                    lo.astype(jnp.bfloat16)
                wd_ref[slot, s * 256 + 128:(s + 1) * 256, :] = \
                    hi.astype(jnp.bfloat16)

            # dot the PREVIOUS step's slot — independent of the dequant
            @pl.when(i > 0)
            def _():
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wd_ref[(i + 1) % 2], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(i == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((2, bk, bm), jnp.bfloat16)]

    w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
    g8 = 8
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                      jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    last = steps - 1
    kq = (lambda mi, i: (jnp.minimum(i, last), mi)) if xpipe \
        else (lambda mi, i: (i, mi))
    kb = (lambda mi, i: (0, jnp.maximum(i - 1, 0))) if xpipe \
        else (lambda mi, i: (0, i))
    in_specs = [
        pl.BlockSpec((bk // 2, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, bk), kb, memory_space=pltpu.VMEM),
    ]

    def op(w, d, dm, sc, mn, b):
        return pl.pallas_call(
            kern, grid=(M // bm, gsteps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((N, bm), lambda mi, i: (0, mi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(w, d, dm, sc, mn, b)

    return op, (w, d16, dm16, sc8, mn8, b0)


def run_part5():
    """Cross-K-step software pipeline vs the min-fold flat control, at the
    legacy and the r4-tuned tile shapes."""
    log("part 5: cross-step pipeline")
    variants = {}
    for bm, bk in ((2048, 1024), (4096, 512)):
        variants[f"mf_{bm}x{bk}"] = flat_mf(bm, bk, xpipe=False)
        variants[f"xp_{bm}x{bk}"] = flat_mf(bm, bk, xpipe=True)
    results = {kk: [] for kk in variants}
    for rnd in range(3):
        for name, (op, args) in variants.items():
            try:
                sec = time_op(op, args)
                results[name].append(sec)
                log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                    f"({BYTES_Q4K/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {name}: ERROR {repr(e)[:300]}")
                results[name].append(None)
    for name, secs in results.items():
        good = [x for x in secs if x]
        if not good:
            emit({"probe": f"overlap {name}", "error": "all rounds failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"overlap {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES_Q4K / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in good],
              "shape": "4096x4096 n=16 q4_k full math, min-fold"})


def xp_ablate(bm, bk, mode):
    """Round-5 xpipe AUTOPSY (VERDICT r4 weak #3): the cross-K-step
    rotating-scratch pipeline measured 172-185 GB/s — 2.5x WORSE than
    flat — with no archived diagnosis. These ablations isolate the
    mechanism:

      flat       min-fold control (no scratch round-trip)
      xp         the original: dequant into slot j%2 (slice stores), dot
                 slot (j+1)%2 — dynamic slot index on a (2, bk, bm) ref
      xp_static2 TWO static scratch refs + pl.when parity (no dynamic
                 leading index; Mosaic can disambiguate aliasing)
      xp_nodot   dequant + rotating stores only (dot replaced by a
                 resident-tile dot) — isolates store/layout cost
      xp_nostore dequant consumed by a cheap reduce, dot from the OTHER
                 resident tile — isolates the when/grid structure cost
    """
    nblk = bk // 32
    sbt = bk // 256
    steps = K // bk
    xp = mode != "flat"
    gsteps = steps + 1 if xp else steps

    def prep(d_ref, dm_ref, sc_ref, mn_ref):
        d = fp16_bits_to_f32(d_ref[:sbt, :])
        dmin = fp16_bits_to_f32(dm_ref[:sbt, :])
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        scale32 = (d[:, None, :] * sc.reshape(sbt, 8, bm)).reshape(nblk, bm)
        min32 = (dmin[:, None, :] * mn.reshape(sbt, 8, bm)).reshape(nblk, bm)
        return scale32, min32

    def parts_of(vi, scale32, min32, s):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
        me = pltpu.repeat(min32[s * 8:(s + 1) * 8, :], 16, axis=0)
        return ((sl & 0xF).astype(jnp.float32) * se - me,
                (sl >> 4).astype(jnp.float32) * se - me)

    def dequant_into(vi, scale32, min32, dst, slot=None):
        for s in range(sbt):
            lo, hi = parts_of(vi, scale32, min32, s)
            if slot is None:
                dst[s * 256:s * 256 + 128, :] = lo.astype(jnp.bfloat16)
                dst[s * 256 + 128:(s + 1) * 256, :] = hi.astype(jnp.bfloat16)
            else:
                dst[slot, s * 256:s * 256 + 128, :] = lo.astype(jnp.bfloat16)
                dst[slot, s * 256 + 128:(s + 1) * 256, :] = \
                    hi.astype(jnp.bfloat16)

    if mode == "flat":
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(sbt):
                parts.extend(parts_of(vi, scale32, min32, s))
            wd = (jnp.concatenate(parts, 0) if len(parts) > 1
                  else parts[0]).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], wd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(j == steps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32)]
    elif mode == "xp":
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wd_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            slot = j % 2
            dequant_into(vi, scale32, min32, wd_ref, slot)

            @pl.when(j > 0)
            def _():
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wd_ref[(j + 1) % 2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((2, bk, bm), jnp.bfloat16)]
    elif mode == "xp_static2":
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wa_ref, wb_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)

            @pl.when(j % 2 == 0)
            def _():
                dequant_into(vi, scale32, min32, wa_ref)

                @pl.when(j > 0)
                def _():
                    acc_ref[:] += jax.lax.dot_general(
                        b_ref[:], wb_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            @pl.when(j % 2 == 1)
            def _():
                dequant_into(vi, scale32, min32, wb_ref)
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wa_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((bk, bm), jnp.bfloat16),
                   pltpu.VMEM((bk, bm), jnp.bfloat16)]
    elif mode == "xp_flatwhen":
        # static two-ref rotation with FLAT pl.when blocks (the nested
        # form crashes this Mosaic's remote compiler)
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wa_ref, wb_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)

            @pl.when(j % 2 == 0)
            def _():
                dequant_into(vi, scale32, min32, wa_ref)

            @pl.when(j % 2 == 1)
            def _():
                dequant_into(vi, scale32, min32, wb_ref)

            @pl.when((j % 2 == 0) & (j > 0))
            def _():
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wb_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(j % 2 == 1)
            def _():
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wa_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((bk, bm), jnp.bfloat16),
                   pltpu.VMEM((bk, bm), jnp.bfloat16)]
    elif mode == "xp_dotfirst":
        # original rotating scratch, but the dot (previous slot) ISSUES
        # before the dequant stores — turns RAW ordering into WAR
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wd_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            @pl.when(j > 0)
            def _():
                acc_ref[:] += jax.lax.dot_general(
                    b_ref[:], wd_ref[(j + 1) % 2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            dequant_into(vi, scale32, min32, wd_ref, j % 2)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((2, bk, bm), jnp.bfloat16)]
    elif mode == "xp_nodot":
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, wd_ref, cst_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            slot = j % 2
            dequant_into(vi, scale32, min32, wd_ref, slot)
            # dot from a CONSTANT resident tile: same MXU work, no
            # dependence on the rotating scratch
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], cst_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((2, bk, bm), jnp.bfloat16),
                   pltpu.VMEM((bk, bm), jnp.bfloat16)]
    elif mode == "xp_nostore":
        def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, b_ref, o_ref,
                 acc_ref, cst_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            scale32, min32 = prep(d_ref, dm_ref, sc_ref, mn_ref)
            vi = w_ref[:].astype(jnp.int32)
            parts = []
            for s in range(sbt):
                parts.extend(parts_of(vi, scale32, min32, s))
            wd = (jnp.concatenate(parts, 0) if len(parts) > 1
                  else parts[0]).astype(jnp.bfloat16)
            # consume the chain cheaply (a (8, bm) running max) and dot
            # from the resident tile — chain and dot are independent,
            # mirroring the iso probe but inside the xp grid structure
            acc_ref[1:2, :] += jnp.max(
                wd.reshape(bk // 8, 8, bm), axis=0).max(
                    axis=0, keepdims=True).astype(jnp.float32)
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], cst_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(j == gsteps - 1)
            def _():
                o_ref[:] = acc_ref[:]
        scratch = [pltpu.VMEM((N, bm), jnp.float32),
                   pltpu.VMEM((bk, bm), jnp.bfloat16)]

    w = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
    g8 = 8
    d16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                      jnp.uint16)
    dm16 = jnp.asarray(rng.integers(2**13, 2**14, (steps * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 63, (K // 32, M)), jnp.uint8)
    b0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    last = steps - 1
    kq = (lambda mi, i: (jnp.minimum(i, last), mi)) if xp \
        else (lambda mi, i: (i, mi))
    kb = (lambda mi, i: (0, jnp.maximum(i - 1, 0))) if xp \
        else (lambda mi, i: (0, i))
    in_specs = [
        pl.BlockSpec((bk // 2, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((nblk, bm), kq, memory_space=pltpu.VMEM),
        pl.BlockSpec((N, bk), kb, memory_space=pltpu.VMEM),
    ]

    def op(w, d, dm, sc, mn, b):
        return pl.pallas_call(
            kern, grid=(M // bm, gsteps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((N, bm), lambda mi, i: (0, mi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(w, d, dm, sc, mn, b)

    return op, (w, d16, dm16, sc8, mn8, b0)


def run_part6():
    """xpipe autopsy: which mechanism makes the cross-step pipeline 2.5x
    slower? (VERDICT r4 #2 precondition for ROADMAP's acceptance clause)"""
    log("part 6: xpipe autopsy")
    import os

    modes = os.environ.get(
        "XPAUTO_MODES", "flat,xp,xp_static2,xp_nodot,xp_nostore").split(",")
    for bm, bk in ((4096, 512), (2048, 1024)):
        built = {}
        for mode in modes:
            try:
                built[mode] = xp_ablate(bm, bk, mode)
            except Exception as e:  # noqa: BLE001
                log(f"{mode} ({bm},{bk}) BUILD FAILED: {repr(e)[:300]}")
                emit({"probe": f"xpauto {mode} {bm}x{bk}",
                      "error": "build: " + repr(e)[:250]})
        results = {kk: [] for kk in built}
        for rnd in range(3):
            for mode, (op, args) in built.items():
                try:
                    sec = time_op(op, args)
                    results[mode].append(sec)
                    log(f"({bm},{bk}) round {rnd} {mode}: "
                        f"{sec*1e6:.2f} us ({BYTES_Q4K/sec/1e9:.0f} GB/s)")
                except Exception as e:  # noqa: BLE001
                    log(f"({bm},{bk}) round {rnd} {mode}: ERROR "
                        f"{repr(e)[:250]}")
        for mode, secs in results.items():
            good = [x for x in secs if x]
            if not good:
                emit({"probe": f"xpauto {mode} {bm}x{bk}",
                      "error": "all rounds failed"})
                continue
            med = float(np.median(good))
            emit({"probe": f"xpauto {mode} {bm}x{bk}",
                  "us_median": round(med * 1e6, 2),
                  "gbps_median": round(BYTES_Q4K / med / 1e9, 1),
                  "us_rounds": [round(x * 1e6, 2) for x in good]})


def run_part3():
    log("part 3: emit_pipeline")
    try:
        op, args = empipe_variant()
        secs = []
        for rnd in range(3):
            sec = time_op(op, args)
            secs.append(sec)
            log(f"empipe round {rnd}: {sec*1e6:.2f} us "
                f"({BYTES_Q4K/sec/1e9:.0f} GB/s)")
        med = float(np.median(secs))
        emit({"probe": "overlap empipe",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES_Q4K / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in secs],
              "shape": "4096x4096 n=16 q4_k full math, inner emit_pipeline"})
    except Exception as e:  # noqa: BLE001
        log(f"empipe FAILED: {repr(e)[:500]}")
        emit({"probe": "overlap empipe", "error": repr(e)[:300]})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")
    if which in ("part1", "all"):
        run_part1()
    if which in ("part2", "all"):
        run_part2()
    if which in ("part3", "all"):
        run_part3()
    if which == "part4":
        run_part4()
    if which == "part5":
        run_part5()
    if which == "part6":
        run_part6()
    log("done")
