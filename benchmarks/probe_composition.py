"""On-chip probes for the 7B decode composition gap (VERDICT round-1 #4).

Round-1 HLO audit: 11.3 ms step = 8.0 ms GEMMs + 0.8 ms attention +
~2.4 ms unattributed. These probes attribute the remainder by A/B-ing
one variable at a time on the REAL chip (run manually when the relay is
up; CPU timings are meaningless here):

1. cache-size sweep at FIXED span: decode step at max_seq 256 / 1024 /
   2048 with span=128. Attention reads only 128 rows either way, so any
   time growth with max_seq is KV-cache copy traffic — i.e. the
   donation/aliasing of the per-layer DUS inserts is failing and XLA is
   copying whole cache buffers every step.
2. batch sweep (1 / 8 / 16) at fixed cache: distinguishes per-step
   fixed overhead (flat) from bandwidth-bound work (scales).
3. layers-only vs full step: forward() vs forward()+sampler, isolating
   the sampling/top-k tail.

Usage:  python -u benchmarks/probe_composition.py [--layers N]
Prints one JSON line per probe point.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="decoder layers for the 7B-shaped probe model "
                         "(results scale linearly; 8 keeps quantize fast)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", "run on the TPU host"
    _ = np.asarray(jnp.zeros((1, 1)))   # warm the relay transfer path

    from gguf_tpu.models import (LlamaConfig, MMOpts, forward,
                                 fuse_llama_params, init_kv_cache,
                                 load_llama, write_random_llama_gguf)

    import os
    import tempfile

    cfg = LlamaConfig(vocab_size=32000, dim=4096, n_layers=args.layers,
                      n_heads=32, n_kv_heads=32, ffn_dim=11008,
                      max_seq_len=2048)
    path = os.path.join(tempfile.gettempdir(),
                        f"probe7b_{args.layers}.gguf")
    if not os.path.exists(path):
        print(f"# writing {path} (one-time)", file=sys.stderr)
        write_random_llama_gguf(path, cfg)
    _, params = load_llama(path)
    params = fuse_llama_params(params)
    opts = MMOpts(precision="fast")

    def step_fn(cfg_s, span):
        def fn(params, tokens, pos, cache):
            logits, cache = forward(params, cfg_s, tokens, pos, cache,
                                    opts, span=span)
            return jnp.argmax(logits[:, -1], -1), cache
        return jax.jit(fn, donate_argnums=(3,))

    def probe(name, batch, max_seq, span):
        import dataclasses

        cfg_s = dataclasses.replace(cfg, max_seq_len=max_seq)
        cache = init_kv_cache(cfg_s, batch, max_seq)
        tokens = jnp.zeros((batch, 1), jnp.int32)
        pos = jnp.full((batch,), span // 2, jnp.int32)
        fn = step_fn(cfg_s, span)

        state = {"cache": cache}

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                tok, state["cache"] = fn(params, tokens, pos,
                                         state["cache"])
            np.asarray(tok)
            return time.perf_counter() - t0

        run(3)                                     # compile + warm
        lo, hi = 10, 40
        t = (run(hi) - run(lo)) / (hi - lo)
        print(json.dumps({"probe": name, "batch": batch,
                          "max_seq": max_seq, "span": span,
                          "step_ms": round(t * 1e3, 3),
                          "layers": args.layers}))
        sys.stdout.flush()

    # 1. cache-size sweep, fixed span: growth => cache copy traffic
    for ms in (256, 1024, 2048):
        probe("cache_size", 16, ms, 128)
    # 2. batch sweep
    for b in (1, 8, 16):
        probe("batch", b, 1024, 128)
    # 3. span sweep (expected: attention cost tracks span)
    for sp in (128, 512, 1024):
        probe("span", 16, 1024, sp)


if __name__ == "__main__":
    main()
