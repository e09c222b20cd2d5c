"""Round-5: on-chip validation + interleaved A/B of the SHIPPED int8-MXU
contract path (ops/mmq_q4_k.py:_kernel_i8) against (a) the old contract
path (fake-quant + f32 HIGHEST MXU — reconstructed as
fake_quantize_q8_1 + act_quant=False/high, identical compute to the r4
aT_high), and (b) the bf16 serving path, plus a golden parity check on
real quantized weights ON THE CHIP (interpret-mode tests cannot catch
Mosaic lowering bugs).

Usage: python -u benchmarks/probe_i8ship.py
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

from gguf_tpu.ops import mmq_q4_k
from gguf_tpu.ops.activation import fake_quantize_q8_1
from gguf_tpu.quant import (quantize_q4_k, quantize_q8_1,
                            mmq_q4_k_q8_1_golden)
from gguf_tpu.quant.layouts import to_soa
from gguf_tpu.utils.benchmark import mmq_loop, slope_time

M, K, N = 4096, 4096, 16
BYTES = M * (K // 256) * 144
rng = np.random.default_rng(5)


def emit(obj):
    print(json.dumps(obj), flush=True)


def parity():
    m, k, n = 512, 1024, 16
    a = rng.standard_normal((m, k)).astype(np.float16)
    b = rng.standard_normal((n, k)).astype(np.float16)
    qa = quantize_q4_k(a)
    want = mmq_q4_k_q8_1_golden(qa, quantize_q8_1(b), m, n, k)
    w = jax.device_put(to_soa("q4_k", qa, m, k))
    got = np.asarray(mmq_q4_k(w, jnp.asarray(b, jnp.float32),
                              act_quant=True, precision="high"))
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    log(f"on-chip parity vs golden: max rel err {err:.2e}")
    emit({"probe": "i8ship parity", "max_rel_err_of_max": float(err),
          "shape": f"{m}x{k} n={n}"})
    assert err < 0.01, err


def bench():
    a = rng.standard_normal((M, K)).astype(np.float16)
    w = jax.device_put(to_soa("q4_k", quantize_q4_k(a), M, K))
    x0 = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)

    def op_i8(w_, x_):
        return mmq_q4_k(w_, x_, act_quant=True, precision="high")

    def op_old(w_, x_):
        return mmq_q4_k(w_, fake_quantize_q8_1(x_), act_quant=False,
                        precision="high")

    def op_fast(w_, x_):
        return mmq_q4_k(w_, x_, act_quant=False, precision="fast")

    variants = {"i8_contract": op_i8, "old_contract": op_old,
                "bf16_fast": op_fast}
    results = {kk: [] for kk in variants}
    for rnd in range(3):
        for name, op in variants.items():
            sec = slope_time(mmq_loop(op, N, M, x0), (w, x0))
            results[name].append(sec)
            log(f"round {rnd} {name}: {sec*1e6:.2f} us "
                f"({BYTES/sec/1e9:.0f} GB/s)")
    for name, secs in results.items():
        med = float(np.median(secs))
        emit({"probe": f"i8ship {name}",
              "us_median": round(med * 1e6, 2),
              "gbps_median": round(BYTES / med / 1e9, 1),
              "us_rounds": [round(x * 1e6, 2) for x in secs],
              "shape": f"{M}x{K} n={N} all-in (act prep included)"})


if __name__ == "__main__":
    log(f"devices={jax.devices()}")
    np.asarray(jnp.zeros((1, 1)))
    log("relay warm")
    parity()
    bench()
