"""Round-4 probe: flash-decoding tiled attention across the serving span
range (VERDICT r3 #7: the only archived long-span number was span=1024; pin
span 2048/4096 with kv-read bandwidth so a tiled-dispatch regression shows
up as a number, not a surprise).

Shape: the 7B MHA decode class (b=8, h=kvh=32, hd=128, int8 KV cache with
per-(token,head) scales), single token. kv-read GB/s counts the int8 K+V
bytes plus scale rows actually addressed by the span.

Usage: python -u benchmarks/probe_attn_span.py
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

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.ops.attention import decode_attention_tiled
from gguf_tpu.utils.benchmark import slope_time


def emit(obj):
    print(json.dumps(obj), flush=True)


B, H, KVH, HD = 8, 32, 32, 128
S = 4096


def main():
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")

    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.standard_normal((B, H, 1, HD)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 127, (B, KVH, S, HD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, KVH, S)), jnp.float32)
    v8 = jnp.asarray(rng.integers(-127, 127, (B, KVH, S, HD)), jnp.int8)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, KVH, S)), jnp.float32)
    pos = jnp.full((B,), S - 1, jnp.int32)

    for span in (1024, 2048, 4096):
        # KV arrays MUST be slope_time args, not closure constants — a
        # closed-over 134MB cache inlines into the HLO as a literal and
        # the relay's remote_compile rejects the request (HTTP 413)
        def make(iters):
            def many(q, k8, ks, v8, vs, pos):
                def body(i, carry):
                    acc, qq = carry
                    out = decode_attention_tiled(qq, k8, ks, v8, vs, pos,
                                                 span=span)
                    return acc + out, q + acc * 1e-30
                acc, _ = jax.lax.fori_loop(
                    0, iters, body,
                    (jnp.zeros((B, H, 1, HD), jnp.float32), q))
                return acc.sum()
            return many

        try:
            sec = slope_time(make, (q0, k8, ks, v8, vs, pos), lo=20, hi=320)
        except Exception as e:  # noqa: BLE001
            emit({"probe": f"attn_span span={span}",
                  "error": repr(e)[:300]})
            continue
        kv_bytes = B * KVH * span * (2 * HD + 2 * 4)  # int8 K+V + f32 scales
        emit({"probe": f"attn_span span={span}",
              "us": round(sec * 1e6, 2),
              "kv_read_gbps": round(kv_bytes / sec / 1e9, 1),
              "shape": f"b={B} mha{H} hd={HD} int8-kv, tiled flash decode"})
        log(f"span={span}: {sec*1e6:.1f} us, "
            f"{kv_bytes/sec/1e9:.0f} GB/s kv-read")


if __name__ == "__main__":
    main()
