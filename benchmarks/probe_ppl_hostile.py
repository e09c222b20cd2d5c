"""Round-5 probe (VERDICT r4 #5): numeric-mode accuracy under HOSTILE
weight statistics.

The r4 certification (ppl7b2l) used gaussian 2-layer weights — the easiest
case for the bf16-fast serving default: no outliers, no depth for error to
compound. Quantization error is outlier-driven, so this probe rebuilds the
fast-vs-contract comparison where K-quants actually earn their keep:

  - per-INPUT-channel scales drawn lognormal(0, sigma) — heavy-tailed
    column magnitudes, the llama-like structure where a block's absmax is
    set by one hot channel and every other element quantizes coarsely;
  - a few 100x outlier columns (0.1% of input channels), the classic
    activation-outlier channel pattern (propagates: a hot input column
    makes that activation dimension hot for EVERY downstream consumer);
  - whole-matrix RMS renormalized so the residual stream stays bounded
    through depth (norm weights are ones in synthetic checkpoints);
  - 8 layers (TinyLlama geometry) so mode error can compound.

Scored per checkpoint (identical weights/stream, llama.cpp window
accounting, eval/perplexity.py): fast (serving default), aq_fast (Q8_1
codes + bf16 dots), contract (Q8_1 + full precision — reference
semantics, /root/reference/kernels/mmq_q4_k.py:202-221). The quantity
under test is the MODE DELTA at hostile statistics, not the absolute ppl
of a random model. Severities: gaussian control, (sigma=0.5, 30x),
(sigma=1.0, 100x).

Usage: python -u benchmarks/probe_ppl_hostile.py [n_tokens]
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


def hostile_fn(sigma: float, outlier_mult: float):
    """Heavy-tailed per-input-channel scales + outlier columns,
    RMS-renormalized per matrix."""
    def fn(rng, shape, scale):
        w = rng.standard_normal(shape) * scale
        if len(shape) != 2:
            return w
        cols = shape[-1]
        col_scale = rng.lognormal(0.0, sigma, cols)
        n_out = max(1, cols // 1000)
        idx = rng.choice(cols, n_out, replace=False)
        col_scale[idx] *= outlier_mult
        w = w * col_scale[None, :]
        # keep the matrix's output RMS at the gaussian baseline so the
        # residual stream stays bounded through 8 layers
        w *= 1.0 / np.sqrt(np.mean(col_scale ** 2))
        return w
    return fn


def main(n_tokens=4096):
    log(f"devices={jax.devices()}")
    np.asarray(jax.numpy.zeros((1, 1)))
    log("relay warm")

    cfg0 = LlamaConfig(vocab_size=32000, dim=2048, n_layers=8, n_heads=32,
                       n_kv_heads=4, ffn_dim=5632, max_seq_len=2048)
    cases = {
        "gauss": None,
        "host_s0.5_o30": hostile_fn(0.5, 30.0),
        "host_s1.0_o100": hostile_fn(1.0, 100.0),
    }
    rng = np.random.default_rng(11)
    ids = rng.integers(0, cfg0.vocab_size, n_tokens).astype(np.int32)
    modes = {
        "fast": MMOpts(act_quant=False, precision="fast"),
        "aq_fast": MMOpts(act_quant=True, precision="fast"),
        "contract": MMOpts(act_quant=True, precision="high"),
    }

    for cname, wfn in cases.items():
        path = f"/tmp/gguf_tpu_flagship/hostile8l_{cname}.gguf"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if not os.path.exists(path):
            log(f"quantizing {cname} checkpoint (one-time)...")
            write_random_llama_gguf(path, cfg0, fmt=GGMLType.Q4_K, seed=3,
                                    weight_fn=wfn)
        cfg, params = load_llama(path)
        params = fuse_llama_params(params)
        ppl = {}
        for mname, opts in modes.items():
            ppl[mname] = perplexity(params, cfg, ids, window=512, batch=4,
                                    opts=opts)
            log(f"{cname} {mname}: ppl {ppl[mname]:.6f}")
        nll = {k: float(np.log(v)) for k, v in ppl.items()}
        emit({"probe": f"ppl_hostile {cname}",
              **{f"ppl_{k}": round(v, 6) for k, v in ppl.items()},
              "fast_minus_contract_ppl":
                  round(ppl["fast"] - ppl["contract"], 6),
              "aqfast_minus_contract_ppl":
                  round(ppl["aq_fast"] - ppl["contract"], 6),
              "rel_nll_fast_vs_contract":
                  round((nll["fast"] - nll["contract"]) / nll["contract"], 8),
              "tokens": int(n_tokens), "window": 512, "layers": 8,
              "note": "8L tinyllama-geometry Q4_K_M; hostile = lognormal "
                      "col scales + outlier cols, RMS-renormalized"})
        del params


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
