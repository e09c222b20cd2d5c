"""Round-5 probe (VERDICT r4 #3): per-op budget of the q2_k dequant chain.

The K-quant kernels are element-rate-bound (r4-s4: q2_k's 4096^2 tile costs
~21us — the same as q4_k's — at 0.58x the bytes), so low-bit GB/s requires
REMOVING per-element VPU ops. This probe prices each op class by ablation
at the shipped tile shape and measures the two removals that can actually
ship:

  full_u8   control: the shipped chain — u8->i32 convert, (>>sh)&3 per
            crumb plane, i32->f32 convert, fma (q*se - me), f32->bf16.
  micro     free-op elision: plane sh=0 skips the shift, plane sh=6 skips
            the mask (u8 inputs guarantee high bits are zero).
  i32w      qs streamed as i32 words (16 crumbs each, no u8->i32 convert;
            plane order handled at load in a real kernel).
  nome      min term OFF the per-element chain: w = q*se only, the
            per-16-block min correction restored as one small
            (N, nblk)x(nblk, TM) dot per K-step against streamed block
            sums — the r2/r3 bsum machinery r4 deleted for q4_k, priced
            HERE for the element-rate-bound formats where the tradeoff
            reverses (1 op/elem saved vs ~0.2us/step of small-dot).
  combo     micro + i32w + nome together.
  nofma     no scale/min at all (raw codes -> bf16): the chain floor the
            dot/stream permit — an UNREACHABLE lower bound that prices
            the whole affine stage.

Timing: slope_time per variant, 3 interleaved rounds, JSON lines for
RESULTS_v5e.jsonl. Reference lineage: K-quant decode tables,
/root/reference/kernels/mmq_q6_k.py:40-48.

Usage: python -u benchmarks/probe_kq_ops.py
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

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.ops.common import fp16_bits_to_f32
from gguf_tpu.utils.benchmark import slope_time

M, K, N = 4096, 4096, 16
BM, BK = 4096, 512
SBT = BK // 256
NBLK16 = BK // 16            # per-16 blocks per step (q2_k scale granule)
STEPS = K // BK
# q2_k: 84 bytes / 256 elems (16B scales + 64B qs + 2+2B d/dmin)
BYTES_Q2K = M * (K // 256) * 84

rng = np.random.default_rng(3)


def emit(obj):
    print(json.dumps(obj), flush=True)


def time_op(op, args, lo=10, hi=210):
    def make(iters):
        def many(*a):
            x0 = a[-1]

            def body(i, carry):
                acc, xx = carry
                out = op(*a[:-1], xx)
                return acc + out, \
                    (x0 + acc[:1, :1] * 1e-30).astype(x0.dtype)

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((N, M), jnp.float32), x0))
            return acc.sum()
        return many
    return slope_time(make, args, lo=lo, hi=hi)


def q2k_variant(mode):
    """q2_k-shaped full math on standins at (BM, BK); b pre-permuted bf16
    (glue excluded, kernel-core comparison)."""
    use_i32 = mode in ("i32w", "combo")
    micro = mode in ("micro", "combo")
    nome = mode in ("nome", "combo")
    nofma = mode == "nofma"

    def kern(w_ref, d_ref, dm_ref, sc_ref, mn_ref, bs_ref, b_ref, o_ref,
             acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        d = fp16_bits_to_f32(d_ref[:SBT, :])
        dmin = fp16_bits_to_f32(dm_ref[:SBT, :])
        sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        scale16 = (d[:, None, :] * sc.reshape(SBT, 16, BM)).reshape(NBLK16, BM)
        min16 = (dmin[:, None, :] * mn.reshape(SBT, 16, BM)).reshape(NBLK16, BM)

        parts = []
        if not use_i32:
            vi = w_ref[:].astype(jnp.int32)
            for s in range(SBT):
                sl = vi[s * 64:(s + 1) * 64, :]
                se = pltpu.repeat(scale16[s * 16:(s + 1) * 16, :], 4, axis=0)
                me = pltpu.repeat(min16[s * 16:(s + 1) * 16, :], 4, axis=0)
                for sh in (0, 2, 4, 6):
                    if micro and sh == 0:
                        q = sl & 3
                    elif micro and sh == 6:
                        q = sl >> 6            # u8 source: high bits clear
                    else:
                        q = (sl >> sh) & 3
                    if nofma:
                        parts.append(q.astype(jnp.float32))
                    elif nome:
                        parts.append(q.astype(jnp.float32) * se)
                    else:
                        parts.append(q.astype(jnp.float32) * se - me)
        else:
            vi = w_ref[:]                       # i32 words: 16 crumbs each
            for s in range(SBT):
                sl = vi[s * 16:(s + 1) * 16, :]
                se = pltpu.repeat(scale16[s * 16:(s + 1) * 16, :], 1, axis=0)
                me = pltpu.repeat(min16[s * 16:(s + 1) * 16, :], 1, axis=0)
                for pi in range(16):
                    sh = 2 * pi
                    if micro and pi == 0:
                        q = sl & 3
                    elif micro and pi == 15:
                        q = jax.lax.shift_right_logical(sl, 30)
                    else:
                        q = (sl >> sh) & 3
                    if nofma:
                        parts.append(q.astype(jnp.float32))
                    elif nome:
                        parts.append(q.astype(jnp.float32) * se)
                    else:
                        parts.append(q.astype(jnp.float32) * se - me)
        w = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            b_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if nome:
            # restore the min term as one small dot per step
            acc_ref[:] -= jax.lax.dot_general(
                bs_ref[:], min16, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(j == STEPS - 1)
        def _():
            o_ref[:] = acc_ref[:]

    if use_i32:
        w = jnp.asarray(rng.integers(0, 2**31 - 1, (K // 16, M)), jnp.int32)
        w_spec = pl.BlockSpec((BK // 16, BM), lambda mi, j: (j, mi),
                              memory_space=pltpu.VMEM)
    else:
        w = jnp.asarray(rng.integers(0, 255, (K // 4, M)), jnp.uint8)
        w_spec = pl.BlockSpec((BK // 4, BM), lambda mi, j: (j, mi),
                              memory_space=pltpu.VMEM)
    g8 = 8
    d16 = jnp.asarray(rng.integers(0x3800, 0x3C00, (STEPS * g8, M)),
                      jnp.uint16)
    dm16 = jnp.asarray(rng.integers(0x3800, 0x3C00, (STEPS * g8, M)),
                       jnp.uint16)
    sc8 = jnp.asarray(rng.integers(0, 15, (K // 16, M)), jnp.uint8)
    mn8 = jnp.asarray(rng.integers(0, 15, (K // 16, M)), jnp.uint8)
    bs = jnp.asarray(rng.standard_normal((K // 16, N)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    in_specs = [
        w_spec,
        pl.BlockSpec((g8, BM), lambda mi, j: (j, mi), memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, BM), lambda mi, j: (j, mi), memory_space=pltpu.VMEM),
        pl.BlockSpec((NBLK16, BM), lambda mi, j: (j, mi), memory_space=pltpu.VMEM),
        pl.BlockSpec((NBLK16, BM), lambda mi, j: (j, mi), memory_space=pltpu.VMEM),
        pl.BlockSpec((NBLK16, N), lambda mi, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, BK), lambda mi, j: (0, j), memory_space=pltpu.VMEM),
    ]

    def op(w, d, dm, sc, mn, bs, b):
        return pl.pallas_call(
            kern, grid=(M // BM, STEPS),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((N, BM), lambda mi, j: (0, mi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, BM), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(w, d, dm, sc, mn, bs, b)

    return op, (w, d16, dm16, sc8, mn8, bs, b0)


if __name__ == "__main__":
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")
    modes = ["full_u8", "micro", "i32w", "nome", "combo", "nofma"]
    built = {}
    for mode in modes:
        try:
            built[mode] = q2k_variant(mode)
            log(f"built {mode}")
        except Exception as e:  # noqa: BLE001
            log(f"{mode} BUILD FAILED: {repr(e)[:300]}")
            emit({"probe": f"kqops {mode}", "error": repr(e)[:250]})
    results = {kk: [] for kk in built}
    for rnd in range(3):
        for mode, (op, args) in built.items():
            try:
                sec = time_op(op, args)
                results[mode].append(sec)
                log(f"round {rnd} {mode}: {sec*1e6:.2f} us "
                    f"({BYTES_Q2K/sec/1e9:.0f} GB/s eff q2_k)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {mode}: ERROR {repr(e)[:250]}")
    for mode, secs in results.items():
        good = [x for x in secs if x]
        if not good:
            emit({"probe": f"kqops {mode}", "error": "all rounds failed"})
            continue
        med = float(np.median(good))
        emit({"probe": f"kqops {mode}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES_Q2K / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in good],
              "shape": f"{M}x{K} n={N} q2_k-shaped, tiles ({BM},{BK})"})
