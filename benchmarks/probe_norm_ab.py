"""Round-5: interleaved e2e A/B of the one-block Pallas RMSNorm.

The XLA cross-lane mean at (16, d) costs ~17us per norm IN-MODEL
(other_budget attribution) — lane-layout conversions, the same pathology
class as the rope shuffles. Arms share identical kernel tiles (block_k
1088 salt -> same bk=1024, distinct jit trace for the patched old form).

Usage: python -u benchmarks/probe_norm_ab.py [model] [rounds]
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

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import gguf_tpu.models.llama as L
from gguf_tpu.models import (MMOpts, fuse_llama_params, init_kv_cache,
                             load_llama)
from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH, SPAN = 16, 128
NEW_NORM = L.rms_norm


def old_rms_norm(x, weight, eps):
    """The pre-r5 pure-XLA form (timing control)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def emit(obj):
    print(json.dumps(obj), flush=True)


class Step:
    def __init__(self, cfg, norm_fn, opts):
        self.cfg, self.norm_fn, self.opts = cfg, norm_fn, opts

    def make(self, iters):
        cfg, norm_fn, opts = self.cfg, self.norm_fn, self.opts

        def many(params, tokens, pos, cache):
            L.rms_norm = norm_fn
            try:
                def body(i, carry):
                    toks, pos, cache = carry
                    logits, cache = L.forward(params, cfg, toks, pos,
                                              cache, opts, span=SPAN)
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                    return nxt[:, None], pos + 1, cache

                toks, pos, _ = jax.lax.fori_loop(
                    0, iters, body, (tokens, pos, cache))
                return toks.sum() + pos.sum()
            finally:
                L.rms_norm = NEW_NORM
        return many


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    nrounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = {"7b": "/tmp/gguf_tpu_flagship/llama2_7b_q4km.gguf",
            "1b": "/tmp/gguf_tpu_flagship/tinyllama_1p1b_q4km.gguf"}[model]
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    cache = init_kv_cache(cfg, batch=BATCH, max_seq=256)
    wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree_util.tree_leaves(params))
    if params["output"] is not params["token_embd"]:
        wbytes -= sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(params["token_embd"]))
    tokens0 = jnp.zeros((BATCH, 1), jnp.int32)
    pos0 = jnp.zeros(BATCH, dtype=jnp.int32)
    # identical kernel tiles, distinct jit keys (1088 -> bk=1024 via
    # pick_block's granule walk)
    arms = {
        "new_pallas_norm": Step(cfg, NEW_NORM,
                                MMOpts(precision="fast", block_m=4096,
                                       block_k=1024)),
        "old_xla_norm": Step(cfg, old_rms_norm,
                             MMOpts(precision="fast", block_m=4096,
                                    block_k=1088)),
    }
    results = {name: [] for name in arms}
    for r in range(nrounds):
        for name, step in arms.items():
            sec = slope_time(step.make, (params, tokens0, pos0, cache),
                             lo=10, hi=60, reps=3)
            results[name].append(sec)
            log(f"round {r} {name}: {sec*1e6:.1f} us "
                f"({BATCH/sec:.0f} tok/s, {wbytes/sec/1e9:.1f} GB/s)")
    for name, secs in results.items():
        med = float(np.median(secs))
        emit({"probe": f"norm_ab_{model} {name}",
              "step_us": round(med * 1e6, 1),
              "tokens_per_s": round(BATCH / med, 1),
              "weight_stream_gbps": round(wbytes / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 1) for x in secs],
              "shape": f"{model} q4_k_m decode batch16 span128, uniform "
                       f"(4096,1024) tiles both arms"})
