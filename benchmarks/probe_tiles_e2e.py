"""Round-5 follow-up: WHICH tile factor inverts the 7B e2e gain?

budget7b4 measured the r4 TILE_TABLE (bm=4096, bk=512) NET SLOWER e2e
(-4.9%, 3/3 interleaved rounds) while the same tiles win isolated kernel
A/Bs by 20-34%. Four interleaved arms separate the factors on the full
Llama-2-7B Q4_K_M decode step:

  table    (4096, 512)  — the r4 TILE_TABLE choice
  bm2048   (2048, 512)  — big-bk effect alone
  bm4096k1 (4096, 1024) — big-bm effect alone
  default  (2048, 1024) — the pre-r4 default

Usage: python -u benchmarks/probe_tiles_e2e.py [rounds]
"""

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

from gguf_tpu.models import (MMOpts, forward, fuse_llama_params,
                             init_kv_cache, load_llama)
from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")

BATCH, SPAN = 16, 128


def emit(obj):
    print(json.dumps(obj), flush=True)


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


ARMSETS = {
    # round-5 factor separation (r5-s1 archived: bk=512 is the culprit,
    # (4096, 1024) wins: 1435 tok/s vs table-4096x512's 1322)
    "factors": {
        "table": MMOpts(precision="fast"),
        "bm2048_bk512": MMOpts(precision="fast", block_m=2048, block_k=512),
        "bm4096_bk1024": MMOpts(precision="fast", block_m=4096,
                                block_k=1024),
        "default_2048x1024": MMOpts(precision="fast", use_tile_table=False),
    },
    # confirmation of the revised TILE_TABLE (per-shape entries) vs its
    # uniform approximation and the pre-r4 default
    "confirm": {
        "table": MMOpts(precision="fast"),
        "uniform_4096x1024": MMOpts(precision="fast", block_m=4096,
                                    block_k=1024),
        "default_2048x1024": MMOpts(precision="fast", use_tile_table=False),
        "old_4096x512": MMOpts(precision="fast", block_m=4096,
                               block_k=512),
    },
    # r5 GLU fusion (act(gate)*up inside the down kernel) on/off
    "glu": {
        "glu_on": MMOpts(precision="fast"),
        "glu_off": MMOpts(precision="fast", fuse_glu=False),
    },
}

MODELS = {
    "7b": ("/tmp/gguf_tpu_flagship/llama2_7b_q4km.gguf", "llama2-7b"),
    "1b": ("/tmp/gguf_tpu_flagship/tinyllama_1p1b_q4km.gguf", "tinyllama"),
}

if __name__ == "__main__":
    nrounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    model = sys.argv[2] if len(sys.argv) > 2 else "7b"
    armset = sys.argv[3] if len(sys.argv) > 3 else "factors"
    path, mname = MODELS[model]
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    cache = init_kv_cache(cfg, batch=BATCH, max_seq=256)
    wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree_util.tree_leaves(params))
    if params["output"] is not params["token_embd"]:
        wbytes -= sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(params["token_embd"]))
    arms = ARMSETS[armset]
    timers = {name: step_timer(cfg, params, cache, o)
              for name, o in arms.items()}
    results = {name: [] for name in arms}
    for r in range(nrounds):
        for name, t in timers.items():
            sec = t()
            results[name].append(sec)
            log(f"round {r} {name}: {sec*1e6:.1f} us "
                f"({BATCH/sec:.0f} tok/s, {wbytes/sec/1e9:.1f} GB/s)")
    for name, secs in results.items():
        med = float(np.median(secs))
        emit({"probe": f"tiles_e2e_{model} {name}",
              "step_us": round(med * 1e6, 1),
              "tokens_per_s": round(BATCH / med, 1),
              "weight_stream_gbps": round(wbytes / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 1) for x in secs],
              "shape": f"{mname} q4_k_m decode batch16 span128"})
