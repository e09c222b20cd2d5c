"""Round-3 probe: attribute the 7B decode step budget (VERDICT #1).

Archived r2 numbers: 7B decode step 11.4ms (348.5 GB/s weight stream) while
the Q4_K kernel alone runs 437+ GB/s — ~25% lost between kernel and engine.
This probe decomposes the step IN ONE SESSION via layered differences:

  t(2L) - t(1L)            = true per-layer cost inside the jitted step
  t(1L) - per_layer        = head cost (embed + final norm + lm head + argmax)
  sum of standalone GEMMs  = per-layer MXU/kernel floor at exact 7B shapes
  per_layer - gemm_sum     = per-layer non-GEMM (attention, norms, rope,
                             cache insert, dispatch)

Components are then drilled one level down (attention pair standalone).
Shapes: Llama-2-7B (dim 4096, MHA 32 heads, ffn 11008), batch 16, span 128,
precision=fast, act_quant off — the archived configuration.

Usage: python -u benchmarks/probe_decode_budget.py
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
    emit({"probe": f"budget7b gemm {label} {m}x{k}",
          "us": round(sec * 1e6, 2), "gbps": round(nb / sec / 1e9, 1)})
    return sec, nb


if __name__ == "__main__":
    # standalone GEMMs at exact fused 7B shapes
    g_qkv, b_qkv = time_gemm(12288, 4096, "qkv")
    log("gemm qkv done")
    g_wo, b_wo = time_gemm(4096, 4096, "wo")
    log("gemm wo done")
    g_gu, b_gu = time_gemm(22016, 4096, "gate_up")
    log("gemm gate_up done")
    g_dn, b_dn = time_gemm(4096, 11008, "down")
    log("gemm down done")
    g_lm, b_lm = time_gemm(32000, 4096, "lm_head")
    log("gemm lm_head done")
    gemm_layer = g_qkv + g_wo + g_gu + g_dn
    layer_bytes = b_qkv + b_wo + b_gu + b_dn

    cfg1, p1, c1 = model_at(1)
    t1 = time_step(cfg1, p1, c1)
    log(f"1L step {t1*1e6:.1f} us")
    cfg2, p2, c2 = model_at(2)
    t2 = time_step(cfg2, p2, c2)
    log(f"2L step {t2*1e6:.1f} us")
    per_layer = t2 - t1
    head = t1 - per_layer
    emit({"probe": "budget7b per_layer", "us": round(per_layer * 1e6, 1),
          "gemm_floor_us": round(gemm_layer * 1e6, 1),
          "non_gemm_us": round((per_layer - gemm_layer) * 1e6, 1),
          "layer_weight_gbps": round(layer_bytes / per_layer / 1e9, 1),
          "layer_gemm_gbps": round(layer_bytes / gemm_layer / 1e9, 1)})
    emit({"probe": "budget7b head (embed+norm+lm+argmax)",
          "us": round(head * 1e6, 1),
          "lm_gemm_floor_us": round(g_lm * 1e6, 1),
          "non_gemm_us": round((head - g_lm) * 1e6, 1)})
    step32 = 32 * per_layer + head
    emit({"probe": "budget7b extrapolated 32L step",
          "ms": round(step32 * 1e3, 3),
          "weight_gbps": round((32 * layer_bytes + b_lm) / step32 / 1e9, 1),
          "gemm_only_ms": round((32 * gemm_layer + g_lm) * 1e3, 3)})
    log("done")
