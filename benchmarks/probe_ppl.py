"""Round-4 probe: fast-vs-high perplexity delta (VERDICT r3 #3a).

BASELINE.md's accuracy row is "ppl within 0.01 of llama.cpp at equal
bit-width". The environment has no real checkpoint or llama.cpp binary
(docs/ROADMAP.md), but the numeric-mode SENSITIVITY is measurable on the
7B-shaped random checkpoint: if the bf16-fast serving default and the
q8_1+high reference-contract mode agree to << 0.01 PPL on the same
weights and token stream, the serving default inherits whatever accuracy
case the contract mode makes (the quantized weights themselves are
byte-identical to GGML's, tests/test_native_parity.py).

Modes scored (identical weights, identical stream, llama.cpp window
accounting — eval/perplexity.py):
  fast      act_quant=False, precision=fast   (LLM's serving default)
  contract  act_quant=True,  precision=high   (reference MMQ numerics:
            in-chain Q8_1 fake-quant + f32 MXU passes,
            /root/reference/kernels/mmq_q4_k.py:202-212)
  aq_fast   act_quant=True,  precision=fast   (Q8_1 numerics, bf16 dots)

Usage: python -u benchmarks/probe_ppl.py [n_tokens]
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

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from gguf_tpu.gguf import GGMLType
from gguf_tpu.eval.perplexity import perplexity
from gguf_tpu.models import (LlamaConfig, MMOpts, fuse_llama_params,
                             load_llama, write_random_llama_gguf)


def emit(obj):
    print(json.dumps(obj), flush=True)


def main(n_tokens=4096):
    import jax.numpy as jnp  # noqa: F401

    log(f"devices={jax.devices()}")
    np.asarray(jax.numpy.zeros((1, 1)))
    log("relay warm")

    cfg0 = LlamaConfig(vocab_size=32000, dim=4096, n_layers=2, n_heads=32,
                       n_kv_heads=32, ffn_dim=11008, max_seq_len=2048)
    path = "/tmp/gguf_tpu_flagship/llama7b_2l.gguf"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        log("quantizing 7B-shaped 2L checkpoint (one-time)...")
        write_random_llama_gguf(path, cfg0, fmt=GGMLType.Q4_K, seed=0)
    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    log("model loaded")

    rng = np.random.default_rng(11)
    ids = rng.integers(0, cfg.vocab_size, n_tokens).astype(np.int32)

    modes = {
        "fast": MMOpts(act_quant=False, precision="fast"),
        "contract": MMOpts(act_quant=True, precision="high"),
        "aq_fast": MMOpts(act_quant=True, precision="fast"),
    }
    ppl = {}
    for name, opts in modes.items():
        ppl[name] = perplexity(params, cfg, ids, window=512, batch=4,
                               opts=opts)
        log(f"{name}: ppl {ppl[name]:.6f}")
        emit({"probe": f"ppl7b2l {name}", "ppl": round(ppl[name], 6),
              "tokens": int(n_tokens), "window": 512,
              "note": "7B-shaped 2-layer random-weight checkpoint; "
                      "llama.cpp window accounting"})
    if len(ppl) == 3:
        emit({"probe": "ppl7b2l deltas",
              "fast_minus_contract": round(ppl["fast"] - ppl["contract"], 6),
              "aqfast_minus_contract":
                  round(ppl["aq_fast"] - ppl["contract"], 6),
              "bar": 0.01})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
