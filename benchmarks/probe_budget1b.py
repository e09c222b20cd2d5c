"""Round-4 probe: TinyLlama-1.1B decode budget, interleaved (VERDICT r3 #5).

BASELINE config #3 (TinyLlama-1.1B Q4_K_M single-chip decode) is the worst
MFU in the stack (253.6 GB/s weight stream, r3b-suite) and has never had
the budget treatment the 7B got. Same methodology as probe_budget3: every
quantity measured back-to-back per round so the decomposition
  other = (t2L - t1L) - gemms - attention
is load-consistent within a round. TinyLlama geometry: dim 2048, 32 q
heads x hd 64, 4 kv heads (GQA), ffn 5632.

GEMM classes per layer (m = output features, k = input):
  qkv      (2048 + 2*4*64, 2048) = (2560, 2048)
  wo       (2048, 2048)
  gate_up  (11264, 2048)
  down     (2048, 5632)

Usage: python -u benchmarks/probe_budget1b.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[probe {time.time()-t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import (LlamaConfig, MMOpts, forward,
                             fuse_llama_params, init_kv_cache, load_llama,
                             write_random_llama_gguf)
from gguf_tpu.ops import mmq_q4_k
from gguf_tpu.ops.attention import decode_attention_update
from gguf_tpu.quant import quantize_q4_k
from gguf_tpu.quant.layouts import q4_k_to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH, SPAN = 16, 128
OPTS = MMOpts(precision="fast")
rng = np.random.default_rng(0)

DIM, FFN, HEADS, KVH, HD = 2048, 5632, 32, 4, 64


def emit(obj):
    print(json.dumps(obj), flush=True)


def model_at(layers):
    cfg = LlamaConfig(vocab_size=32000, dim=DIM, n_layers=layers,
                      n_heads=HEADS, n_kv_heads=KVH, ffn_dim=FFN,
                      max_seq_len=2048)
    path = f"/tmp/gguf_tpu_flagship/tinyllama_{layers}l.gguf"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        log(f"quantizing {layers}L (one-time)...")
        write_random_llama_gguf(path, cfg, fmt=GGMLType.Q4_K, seed=0)
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    return cfg, params, init_kv_cache(cfg, batch=BATCH, max_seq=256)


def step_timer(cfg, params, cache):
    tokens0 = jnp.zeros((BATCH, 1), jnp.int32)
    pos0 = jnp.zeros(BATCH, dtype=jnp.int32)

    def make(iters):
        def many(params, tokens, pos, cache):
            def body(i, carry):
                toks, pos, cache = carry
                logits, cache = forward(params, cfg, toks, pos, cache,
                                        OPTS, span=SPAN)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return nxt[:, None], pos + 1, cache
            toks, pos, _ = jax.lax.fori_loop(
                0, iters, body, (tokens, pos, cache))
            return toks.sum() + pos.sum()
        return many

    return lambda: slope_time(make, (params, tokens0, pos0, cache),
                              lo=10, hi=110, reps=3)


def gemm_timer(m, k):
    from gguf_tpu.ops.common import pick_tiles

    wq = quantize_q4_k(rng.standard_normal((m, k)).astype(np.float32))
    w = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, m, k))
    x0 = jnp.asarray(rng.standard_normal((BATCH, k)), jnp.float32)
    bm, bk = pick_tiles(w.lanes, k, 2048, 1024, BATCH, fmt="q4_k")
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast",
                           block_m=bm, block_k=bk)
    return lambda: slope_time(mmq_loop(op, BATCH, m, x0), (w, x0),
                              reps=3)


def attn_timer():
    q = jnp.asarray(rng.standard_normal((BATCH, HEADS, 1, HD)),
                    jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((BATCH, KVH, 1, HD)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((BATCH, KVH, 1, HD)), jnp.float32)
    ck = jnp.zeros((BATCH, KVH, 256, HD), jnp.int8)
    cks = jnp.ones((BATCH, KVH, 256), jnp.float32)
    cv = jnp.zeros((BATCH, KVH, 256, HD), jnp.int8)
    cvs = jnp.ones((BATCH, KVH, 256), jnp.float32)
    pos0 = jnp.full((BATCH,), 64, jnp.int32)

    def make(iters):
        def many(q, kn, vn, ck, cks, cv, cvs, pos):
            def body(i, carry):
                acc, ck, cks, cv, cvs = carry
                out, ck, cks, cv, cvs = decode_attention_update(
                    q + acc[:1, :1, :1, :1].astype(q.dtype) * 1e-30,
                    kn, vn, ck, cks, cv, cvs, pos, t=1,
                    precision="fast", span=SPAN)
                return acc + out.astype(jnp.float32), ck, cks, cv, cvs
            acc, *_ = jax.lax.fori_loop(
                0, iters, body,
                (jnp.zeros((BATCH, HEADS, 1, HD), jnp.float32),
                 ck, cks, cv, cvs))
            return acc.sum()
        return many

    return lambda: slope_time(make, (q, kn, vn, ck, cks, cv, cvs, pos0),
                              lo=20, hi=220, reps=3)


def argmax_timer():
    x0 = jnp.asarray(rng.standard_normal((BATCH, 32000)), jnp.float32)

    def make(iters):
        def many(x):
            def body(i, carry):
                acc, xx = carry
                nxt = jnp.argmax(xx, axis=-1)
                return acc + nxt, xx + (nxt[:1] % 2).astype(jnp.float32) * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros(BATCH, jnp.int32), x))
            return acc.sum()
        return many
    return lambda: slope_time(make, (x0,), reps=3)


def norm_timer():
    x0 = jnp.asarray(rng.standard_normal((BATCH, DIM)), jnp.float32)
    w = jnp.ones((DIM,), jnp.float32)

    def make(iters):
        def many(x, w):
            def body(i, carry):
                acc, xx = carry
                from gguf_tpu.models.llama import rms_norm
                out = rms_norm(xx[:, None, :], w, 1e-5)[:, 0]
                return acc + out, xx + acc[:1, :1] * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((BATCH, DIM), jnp.float32), x))
            return acc.sum()
        return many
    return lambda: slope_time(make, (x0, w), reps=3)


if __name__ == "__main__":
    # r5 (VERDICT r4 #6): the r4 probe differenced 2L-1L, below the
    # slope-harness resolution at 1B scale (negative component medians).
    # v2 differences 5L-1L (4 layers of signal) and keeps the two step
    # timers adjacent so load drift mostly cancels.
    cfg1, p1, c1 = model_at(1)
    cfg5, p5, c5 = model_at(5)
    timers = {
        "t1L": step_timer(cfg1, p1, c1),
        "t5L": step_timer(cfg5, p5, c5),
        "qkv": gemm_timer(2560, DIM),
        "wo": gemm_timer(DIM, DIM),
        "gate_up": gemm_timer(2 * FFN, DIM),
        "down": gemm_timer(DIM, FFN),
        "attn": attn_timer(),
        # head components (r5): locate the ~84us of head time that is
        # not the lm_head GEMM
        "lm": gemm_timer(32000, DIM),
        "argmax": argmax_timer(),
        "onorm": norm_timer(),
    }
    wb = {"qkv": 2560 * DIM, "wo": DIM * DIM, "gate_up": 2 * FFN * DIM,
          "down": DIM * FFN}
    rounds = []
    for r in range(3):
        vals = {}
        for name, t in timers.items():
            vals[name] = t()
            extra = ""
            if name in wb:
                gbps = wb[name] // 256 * 144 / vals[name] / 1e9
                extra = f" ({gbps:.0f} GB/s)"
            log(f"round {r} {name}: {vals[name]*1e6:.1f} us{extra}")
        gemm = vals["qkv"] + vals["wo"] + vals["gate_up"] + vals["down"]
        per_layer = (vals["t5L"] - vals["t1L"]) / 4
        other = per_layer - gemm - vals["attn"]
        head = vals["t1L"] - per_layer
        rounds.append({
            "per_layer_us": round(per_layer * 1e6, 1),
            "gemm_us": round(gemm * 1e6, 1),
            "attn_us": round(vals["attn"] * 1e6, 1),
            "other_us": round(other * 1e6, 1),
            "head_us": round(head * 1e6, 1),
            "head_resid_us": round(
                (head - vals["lm"] - vals["argmax"] - vals["onorm"]) * 1e6,
                1),
        })
        emit({"probe": f"budget1b round {r}", **rounds[-1],
              **{k: round(v * 1e6, 1) for k, v in vals.items()}})
    med = {k: float(np.median([r[k] for r in rounds]))
           for k in rounds[0]}
    emit({"probe": "budget1b median", **med,
          "note": "v2 (r5): per_layer = (t5L - t1L)/4, adjacent timers, "
                  "gemms through pick_tiles; other = norms/rope/act-glue/"
                  "wrapper ops per layer; 22 layers + head = full model"})
