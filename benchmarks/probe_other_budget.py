"""Round-3 probe: attribute the ~45us/layer of non-GEMM, non-attention
decode time (budget7b3's `other`) by trace-time ablation.

Each variant monkeypatches one component of models/llama.py to a
math-wrong / timing-valid identity at trace time and slope-times the
(t2L - t1L) per-layer delta on the cached 7B-shaped 1L/2L checkpoints.
All variants interleave in one session; base is measured first and last.

  base       unmodified forward
  no_norm    rms_norm -> scale-only (skips the f32 reduce+rsqrt)
  no_rope    apply_rope -> identity (keeps the hoisted trig)
  no_attn    attention replaced by a zeros output + untouched cache
             (isolates the attention pair INCLUDING its transposes)

Usage: python -u benchmarks/probe_other_budget.py
"""

import json
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

import gguf_tpu.models.llama as L
from gguf_tpu.models import (MMOpts, forward, fuse_llama_params,
                             init_kv_cache, load_llama)
from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH, SPAN = 16, 128


def emit(obj):
    print(json.dumps(obj), flush=True)


def model_at(layers):
    path = f"/tmp/gguf_tpu_flagship/llama7b_{layers}l.gguf"
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    return cfg, params, init_kv_cache(cfg, batch=BATCH, max_seq=256)


ORIG = {
    "rms_norm": L.rms_norm,
    "apply_rope": L.apply_rope,
    "attention": L.attention,
}


def patched(name):
    if name == "no_norm":
        return {"rms_norm": lambda x, w, eps: (x.astype(jnp.float32) * w)
                .astype(x.dtype)}
    if name == "no_rope":
        return {"apply_rope": lambda q, cos, sin, neox: q}
    if name == "no_glu":
        # price the XLA split/act/mul chain the r5 GLU fusion removes:
        # base runs fuse_glu (default True), this arm disables it
        return {}
    if name == "no_attn":
        def fake_attention(layer, x, cfg, cache_l, pos, opts, rope=None,
                           span=None, window=0, return_pre_proj=False):
            b, t, _ = x.shape
            out = jnp.zeros((b * t, cfg.n_heads * cfg.head_dim), x.dtype)
            out = L.linear(layer["wo"], out, opts)
            return out.reshape(b, t, -1), cache_l
        return {"attention": fake_attention}
    return {}


class Step:
    def __init__(self, cfg, variant, blk):
        self.cfg, self.variant, self.blk = cfg, variant, blk

    def make(self, iters):
        cfg, variant, blk = self.cfg, self.variant, self.blk

        def many(params, tokens, pos, cache):
            pat = patched(variant)
            for k, v in pat.items():
                setattr(L, k, v)
            try:
                # use_tile_table=False for EVERY variant: with the r5
                # honored-explicit-tiles rule, a default-tiled base would
                # consult the TILE_TABLE while the salted variants bypass
                # it — all arms must run the same (2048, blk->1024) tiles
                opts = MMOpts(precision="fast", block_k=blk,
                              use_tile_table=False,
                              fuse_glu=(variant != "no_glu"))

                def body(i, carry):
                    toks, pos, cache = carry
                    logits, cache = L.forward(params, cfg, toks, pos, cache,
                                              opts, span=SPAN)
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                    return nxt[:, None], pos + 1, cache

                toks, pos, _ = jax.lax.fori_loop(
                    0, iters, body, (tokens, pos, cache))
                return toks.sum() + pos.sum()
            finally:
                for k in pat:
                    setattr(L, k, ORIG[k])
        return many


if __name__ == "__main__":
    models = {n: model_at(n) for n in (1, 2)}
    tokens0 = jnp.zeros((BATCH, 1), jnp.int32)
    pos0 = jnp.zeros(BATCH, jnp.int32)

    # distinct block_k statics per variant (1024/1280/1536/1792 all resolve
    # to bk=1024 at the 7B K dims via pick_block's -256 walk) so the inner
    # jitted mmq cache cannot alias traces; base2 reuses base's compiled
    # program on purpose (re-measures it under end-of-run load)
    variants = [("base", 1024), ("no_norm", 1280), ("no_rope", 1536),
                ("no_attn", 1792), ("no_glu", 1024), ("base2", 1024)]
    for name, blk in variants:
        per = {}
        for n in (1, 2):
            cfg, params, cache = models[n]
            t = slope_time(Step(cfg, name.rstrip("2"), blk).make,
                           (params, tokens0, pos0, cache),
                           lo=10, hi=60, reps=5)
            per[n] = t
        emit({"probe": f"other_budget {name}",
              "t1L_us": round(per[1] * 1e6, 1),
              "t2L_us": round(per[2] * 1e6, 1),
              "per_layer_us": round((per[2] - per[1]) * 1e6, 1)})
        log(f"{name}: per-layer {(per[2]-per[1])*1e6:.1f} us")
