"""Round-4 probe: per-shape tile sweep for the 7B decode GEMM classes.

VERDICT r3 #2: the small-M shapes (wo 4096x4096 at 343.7 GB/s, down
4096x11264 at 353.3) run 20-30% below the wide shapes (qkv 443.8, gate_up
480.6) under the one-size heuristic bm=2048/bk=1024. Hypothesis: at
m=4096 the grid has only m/bm * k/bk = 2*4 = 8 (wo) / 2*11 = 22 (down)
steps, so the Mosaic pipeline's warmup/drain and the per-M-tile activation
re-dequant overheads don't amortize; smaller tiles buy more steps at some
per-step cost. This sweeps (bm, bk) per shape with the REAL mmq_q4_k
kernel (same ink glue path as the model, n=16 decode), round-robin
interleaved so chip-load drift hits every variant equally.

The winner per shape ships as a measured TILE_TABLE in ops/common.py
(SURVEY.md:296 'per-shape tile tables — Pallas has no autotuner').

Usage: python -u benchmarks/probe_tiles7b.py [shape ...]
"""

import functools
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

from gguf_tpu.ops.mmq_q4_k import mmq_q4_k
from gguf_tpu.quant import quantize_q4_k
from gguf_tpu.quant.layouts import q4_k_to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

N = 16

# the four MMQ classes of a Llama-2-7B decode layer (ffn padded to 11264
# for tp-aligned superblocks, models/loader.py), m = output features;
# 1b_* rows are the TinyLlama-1.1B classes (dim 2048, ffn 5632) + its
# untied lm head
SHAPES = {
    "wo": (4096, 4096),
    "down": (4096, 11264),
    "qkv": (12288, 4096),
    "gate_up": (22528, 4096),
    "1b_qkv": (2560, 2048),
    "1b_wo": (2048, 2048),
    "1b_gate_up": (11264, 2048),
    "1b_down": (2048, 5632),
    "1b_lm": (32000, 2048),
}

# (bm, bk) candidates; first entry is the shipping heuristic (control).
# VMEM bound: qs tile bk/2*bm u8 (x2 buffers) + dequant bf16 bk*bm ~ fits
# under ~14MB for every candidate here.
CANDS = [
    (2048, 1024),     # control
    (1024, 1024),
    (2048, 512),
    (1024, 512),
    (512, 1024),
    (4096, 512),
    (1024, 2048),
    # r5: the e2e factor-separation A/B (probe_tiles_e2e) found bk=512
    # NET SLOWER in the full model while bm=4096 helps — these two were
    # never isolated-swept in r4 and complete the factor grid
    (4096, 1024),
    (4096, 2048),
]


def emit(obj):
    print(json.dumps(obj), flush=True)


def build(m, k):
    rng = np.random.default_rng(m * 131 + k)
    wq = quantize_q4_k(rng.standard_normal((m, k)).astype(np.float32))
    soa = jax.tree_util.tree_map(jnp.asarray, q4_k_to_soa(wq, m, k))
    x = jnp.asarray(rng.standard_normal((N, k)), jnp.float32)
    return soa, x


def main(shapes):
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")

    for name in shapes:
        m, k = SHAPES[name]
        wbytes = m * (k // 256) * 144
        soa, x = build(m, k)
        log(f"{name} ({m}x{k}) built, {wbytes/1e6:.1f} MB")
        cands = [(bm, bk) for bm, bk in CANDS
                 if k % bk == 0 and bk >= 512]
        results = {c: [] for c in cands}
        for rnd in range(3):
            for bm, bk in cands:
                op = functools.partial(mmq_q4_k, act_quant=False,
                                       precision="fast", block_m=bm,
                                       block_k=bk)
                try:
                    sec = slope_time(
                        mmq_loop(lambda w_, x_: op(w_, x_), N, m, x),
                        (soa, x), lo=10, hi=110)
                    results[(bm, bk)].append(sec)
                    log(f"round {rnd} {name} bm={bm} bk={bk}: "
                        f"{sec*1e6:.2f} us ({wbytes/sec/1e9:.0f} GB/s)")
                except Exception as e:  # noqa: BLE001
                    log(f"round {rnd} {name} bm={bm} bk={bk}: "
                        f"ERROR {repr(e)[:200]}")
                    results[(bm, bk)].append(None)
        for (bm, bk), secs in results.items():
            good = [s for s in secs if s]
            if not good:
                emit({"probe": f"tiles7b {name} bm={bm} bk={bk}",
                      "error": "all rounds failed"})
                continue
            med = float(np.median(good))
            emit({"probe": f"tiles7b {name} bm={bm} bk={bk}",
                  "us_median": round(med * 1e6, 2),
                  "gbps_median": round(wbytes / med / 1e9, 1),
                  "us_rounds": [round(s * 1e6, 2) for s in good],
                  "shape": f"{m}x{k} n=16 q4_k real kernel"})
        del soa, x


if __name__ == "__main__":
    shapes = sys.argv[1:] or list(SHAPES)
    main(shapes)
