"""Round-3 probe: 7B decode budget, corrected (part 2).

probe_decode_budget.py timed GEMMs at PRE-padding shapes (down K=11008 ->
bk=256); the loader actually pads ffn 11008 -> 11264, so the real per-layer
GEMM floor was overestimated and non-GEMM underestimated. This probe uses
the loaded shapes and drills the non-GEMM remainder:

  - GEMMs at true shapes: qkv 12288x4096, wo 4096x4096, gate_up 22528x4096,
    down 4096x11264, lm_head 32000x4096
  - per-layer via t(2L) - t(1L) (cached 7B-dim checkpoints)
  - decode attention pair standalone (insert + attend) at 7B MHA shape
  - head pieces: embedding take_rows gather, argmax over (16, 32000)

Usage: python -u benchmarks/probe_budget2.py
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
    print(f"[probe {time.time()-t0:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import (LlamaConfig, MMOpts, forward,
                             fuse_llama_params, init_kv_cache, load_llama,
                             write_random_llama_gguf)
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH = 16
SPAN = 128
OPTS = MMOpts(precision="fast")


def emit(obj):
    print(json.dumps(obj), flush=True)


def model_at(layers, max_seq=256):
    cfg = LlamaConfig(vocab_size=32000, dim=4096, n_layers=layers,
                      n_heads=32, n_kv_heads=32, ffn_dim=11008,
                      max_seq_len=2048)
    path = f"/tmp/gguf_tpu_flagship/llama7b_{layers}l.gguf"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        log(f"quantizing {layers}L 7B-dim checkpoint (one-time)...")
        write_random_llama_gguf(path, cfg, fmt=GGMLType.Q4_K, seed=0)
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    cache = init_kv_cache(cfg, batch=BATCH, max_seq=max_seq)
    return cfg, params, cache


def time_step(cfg, params, cache):
    tokens0 = jnp.zeros((BATCH, 1), jnp.int32)
    pos0 = jnp.zeros(BATCH, dtype=jnp.int32)

    def make(iters):
        def many(params, tokens, pos, cache):
            def body(i, carry):
                toks, pos, cache = carry
                logits, cache = forward(params, cfg, toks, pos, cache, OPTS,
                                        span=SPAN)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return nxt[:, None], pos + 1, cache
            toks, pos, _ = jax.lax.fori_loop(
                0, iters, body, (tokens, pos, cache))
            return toks.sum() + pos.sum()
        return many

    return slope_time(make, (params, tokens0, pos0, cache),
                      lo=10, hi=60, reps=5)


def time_gemm(m, k, label):
    from gguf_tpu.ops import mmq_q4_k
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import q4_k_to_soa

    rng = np.random.default_rng(0)
    wq = quantize_q4_k(rng.standard_normal((m, k)).astype(np.float32))
    w = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, m, k))
    x0 = jnp.asarray(rng.standard_normal((BATCH, k)), jnp.float32)
    op = functools.partial(mmq_q4_k, act_quant=False, precision="fast")
    sec = slope_time(mmq_loop(op, BATCH, m, x0), (w, x0))
    nb = m * (k // 256) * 144
    emit({"probe": f"budget7b2 gemm {label} {m}x{k}",
          "us": round(sec * 1e6, 2), "gbps": round(nb / sec / 1e9, 1)})
    return sec


def time_attention():
    """The per-layer decode attention pair at 7B MHA shape, standalone."""
    from gguf_tpu.ops.attention import decode_attention_update

    kvh, hd = 32, 128
    rng = np.random.default_rng(0)
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

    sec = slope_time(make, (q, kn, vn, ck, cks, cv, cvs, pos0),
                     lo=20, hi=220)
    emit({"probe": "budget7b2 attention pair (insert+attend) per layer",
          "us": round(sec * 1e6, 2)})
    return sec


def time_embed_and_argmax(cfg, params):
    emb = params["token_embd"]
    ids0 = jnp.zeros((BATCH,), jnp.int32)

    def make_e(iters):
        def many(ids):
            def body(i, carry):
                acc, ids = carry
                t = emb.take_rows(ids)
                x = t.dequantize()           # (BATCH, dim)
                return acc + x.sum(), (ids + 1) % 32000
            acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, ids))
            return acc
        return many

    sec_e = slope_time(make_e, (ids0,), lo=20, hi=220)
    emit({"probe": "budget7b2 embed gather (take_rows+dequant)",
          "us": round(sec_e * 1e6, 2)})

    rng = np.random.default_rng(0)
    lg = jnp.asarray(rng.standard_normal((BATCH, 32000)), jnp.float32)

    def make_a(iters):
        def many(lg):
            def body(i, carry):
                acc, lg = carry
                nxt = jnp.argmax(lg, axis=-1)
                return acc + nxt, lg + acc[:, None].astype(jnp.float32) * 1e-30
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros(BATCH, jnp.int64), lg))
            return acc.sum()
        return many

    sec_a = slope_time(make_a, (lg,), lo=20, hi=220)
    emit({"probe": "budget7b2 argmax (16, 32000)",
          "us": round(sec_a * 1e6, 2)})


if __name__ == "__main__":
    g_qkv = time_gemm(12288, 4096, "qkv")
    g_wo = time_gemm(4096, 4096, "wo")
    g_gu = time_gemm(22528, 4096, "gate_up")
    g_dn = time_gemm(4096, 11264, "down")
    g_lm = time_gemm(32000, 4096, "lm_head")
    log("gemms done")
    gemm_layer = g_qkv + g_wo + g_gu + g_dn

    att = time_attention()
    log("attention done")

    cfg1, p1, c1 = model_at(1)
    t1 = time_step(cfg1, p1, c1)
    log(f"1L step {t1*1e6:.1f} us")
    time_embed_and_argmax(cfg1, p1)
    log("embed/argmax done")
    cfg2, p2, c2 = model_at(2)
    t2 = time_step(cfg2, p2, c2)
    log(f"2L step {t2*1e6:.1f} us")
    per_layer = t2 - t1
    head = t1 - per_layer
    emit({"probe": "budget7b2 per_layer", "us": round(per_layer * 1e6, 1),
          "gemm_floor_us": round(gemm_layer * 1e6, 1),
          "attention_us": round(att * 1e6, 2),
          "other_us": round((per_layer - gemm_layer - att) * 1e6, 1)})
    emit({"probe": "budget7b2 head", "us": round(head * 1e6, 1),
          "lm_gemm_us": round(g_lm * 1e6, 1),
          "non_gemm_us": round((head - g_lm) * 1e6, 1)})
    log("done")
