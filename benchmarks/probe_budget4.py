"""Round-5 probe (VERDICT r4 #1): 7B decode budget WITH the r4 TILE_TABLE,
plus the interleaved e2e A/B of the tile table that round 4 never ran.

Everything is measured back-to-back per round (the budget7b3 protocol) so
the decomposition is load-consistent:

  - e2e_tiles / e2e_notiles: FULL Llama-2-7B Q4_K_M decode step at
    batch 16, tile table on vs off (MMOpts.use_tile_table) — the r3b-e2e-ab
    protocol applied to the r4 tile change.
  - t1L / t2L: 1- and 2-layer 7B-geometry models -> per_layer = t2L - t1L,
    head = t1L - per_layer (embed + final norm + lm_head + argmax + loop
    glue).
  - qkv/wo/gate_up/down: the four GEMM classes THROUGH pick_tiles (the
    shapes the model actually runs, same tiles).
  - attn: the span-bucketed insert+attend pair.
  - other = per_layer - gemms - attn (norms/rope/glue/dispatch).

Usage: python -u benchmarks/probe_budget4.py [rounds]
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
from gguf_tpu.ops.common import pick_tiles
from gguf_tpu.quant import quantize_q4_k
from gguf_tpu.quant.layouts import q4_k_to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH, SPAN = 16, 128
OPTS_T = MMOpts(precision="fast")
OPTS_N = MMOpts(precision="fast", use_tile_table=False)
rng = np.random.default_rng(0)

CFG7B = LlamaConfig(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                    n_kv_heads=32, ffn_dim=11008, max_seq_len=2048)


def emit(obj):
    print(json.dumps(obj), flush=True)


def model_at(layers, fname=None):
    cfg = LlamaConfig(vocab_size=32000, dim=4096, n_layers=layers,
                      n_heads=32, n_kv_heads=32, ffn_dim=11008,
                      max_seq_len=2048)
    path = fname or f"/tmp/gguf_tpu_flagship/llama7b_{layers}l.gguf"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        log(f"quantizing {path} (one-time)...")
        write_random_llama_gguf(path, cfg, fmt=GGMLType.Q4_K, seed=0)
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    return cfg, params, init_kv_cache(cfg, batch=BATCH, max_seq=256)


def step_timer(cfg, params, cache, opts):
    tokens0 = jnp.zeros((BATCH, 1), jnp.int32)
    pos0 = jnp.zeros(BATCH, dtype=jnp.int32)

    def make(iters):
        def many(params, tokens, pos, cache):
            def body(i, carry):
                toks, pos, cache = carry
                logits, cache = forward(params, cfg, toks, pos, cache,
                                        opts, span=SPAN)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return nxt[:, None], pos + 1, cache
            toks, pos, _ = jax.lax.fori_loop(
                0, iters, body, (tokens, pos, cache))
            return toks.sum() + pos.sum()
        return many

    return lambda: slope_time(make, (params, tokens0, pos0, cache),
                              lo=10, hi=60, reps=3)


def gemm_timer(m, k):
    wq = quantize_q4_k(rng.standard_normal((m, k)).astype(np.float32))
    w = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, m, k))
    x0 = jnp.asarray(rng.standard_normal((BATCH, k)), jnp.float32)
    bm, bk = pick_tiles(w.lanes, k, 2048, 1024, BATCH, fmt="q4_k")
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast",
                           block_m=bm, block_k=bk)
    return lambda: slope_time(mmq_loop(op, BATCH, m, x0), (w, x0),
                              reps=3)


def attn_timer():
    kvh, hd = 32, 128
    q = jnp.asarray(rng.standard_normal((BATCH, kvh, 1, hd)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((BATCH, kvh, 1, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((BATCH, kvh, 1, hd)), jnp.float32)
    ck = jnp.zeros((BATCH, kvh, 256, hd), jnp.int8)
    cks = jnp.ones((BATCH, kvh, 256), jnp.float32)
    cv = jnp.zeros((BATCH, kvh, 256, hd), jnp.int8)
    cvs = jnp.ones((BATCH, kvh, 256), jnp.float32)
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
                (jnp.zeros((BATCH, kvh, 1, hd), jnp.float32),
                 ck, cks, cv, cvs))
            return acc.sum()
        return many

    return lambda: slope_time(make, (q, kn, vn, ck, cks, cv, cvs, pos0),
                              lo=20, hi=220, reps=3)


if __name__ == "__main__":
    nrounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg7, p7, c7 = model_at(32, "/tmp/gguf_tpu_flagship/llama2_7b_q4km.gguf")
    wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree_util.tree_leaves(p7))
    wbytes -= sum(int(np.prod(a.shape)) * a.dtype.itemsize
                  for a in jax.tree_util.tree_leaves(p7["token_embd"]))
    cfg1, p1, c1 = model_at(1)
    cfg2, p2, c2 = model_at(2)
    timers = {
        "e2e_tiles": step_timer(cfg7, p7, c7, OPTS_T),
        "e2e_notiles": step_timer(cfg7, p7, c7, OPTS_N),
        "t1L": step_timer(cfg1, p1, c1, OPTS_T),
        "t2L": step_timer(cfg2, p2, c2, OPTS_T),
        "qkv": gemm_timer(12288, 4096),
        "wo": gemm_timer(4096, 4096),
        "gate_up": gemm_timer(22528, 4096),
        "down": gemm_timer(4096, 11264),
        "attn": attn_timer(),
    }
    rounds = []
    for r in range(nrounds):
        vals = {}
        for name, t in timers.items():
            vals[name] = t()
            log(f"round {r} {name}: {vals[name]*1e6:.1f} us")
        gemm = vals["qkv"] + vals["wo"] + vals["gate_up"] + vals["down"]
        per_layer = vals["t2L"] - vals["t1L"]
        other = per_layer - gemm - vals["attn"]
        head = vals["t1L"] - per_layer
        rounds.append({
            "per_layer_us": round(per_layer * 1e6, 1),
            "gemm_us": round(gemm * 1e6, 1),
            "attn_us": round(vals["attn"] * 1e6, 1),
            "other_us": round(other * 1e6, 1),
            "head_us": round(head * 1e6, 1),
            "e2e_tiles_toks": round(BATCH / vals["e2e_tiles"], 1),
            "e2e_notiles_toks": round(BATCH / vals["e2e_notiles"], 1),
            "e2e_tiles_gbps": round(wbytes / vals["e2e_tiles"] / 1e9, 1),
            "e2e_notiles_gbps": round(wbytes / vals["e2e_notiles"] / 1e9, 1),
        })
        emit({"probe": f"budget7b4 round {r}", **rounds[-1],
              **{k: round(v * 1e6, 1) for k, v in vals.items()}})
    med = {k: float(np.median([rr[k] for rr in rounds]))
           for k in rounds[0]}
    emit({"probe": "budget7b4 median", **med,
          "note": "interleaved per round; e2e A/B = full 7B step, tile "
                  "table on/off (r3b-e2e-ab protocol applied to r4 tiles); "
                  "gemms THROUGH pick_tiles; head = t1L - per_layer"})
