"""Round-4 sequential TPU session driver.

The axon relay's first device->host transfer costs 70-220s on a quiet chip
and 15+ minutes under today's co-tenant load, so every on-chip job of the
round runs INSIDE ONE PROCESS: script-style probes execute via
runpy.run_path(run_name="__main__"), paying the relay warm exactly once.
Each stage is try/except-isolated; output goes to stdout (tee to a log).

Usage: python -u benchmarks/r4_runner.py [stage ...]
Stages (default order): compile_check iso ablate empipe glue tiles1
contract kernels budget1b attn_span tiles2 ppl
"""

import json
import runpy
import sys
import time
import traceback

HERE = __file__.rsplit("/", 1)[0]
sys.path.insert(0, HERE.rsplit("/", 1)[0])
sys.path.insert(0, HERE)

t0 = time.time()


def log(msg):
    print(f"[runner {time.time()-t0:7.1f}s] {msg}", flush=True)


def run_script(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def stage_compile_check():
    run_script(HERE.rsplit("/", 1)[0] + "/tests/tpu_compile_check.py", [])


def stage_iso():
    import probe_overlap
    probe_overlap.run_part1()


def stage_ablate():
    import probe_overlap
    probe_overlap.run_part4()


def stage_xpipe():
    import probe_overlap
    probe_overlap.run_part5()


def stage_empipe():
    import probe_overlap
    probe_overlap.run_part3()


def stage_glue():
    run_script(f"{HERE}/probe_q4k_glue.py", [])


def stage_tiles1():
    run_script(f"{HERE}/probe_tiles7b.py", ["wo", "down"])


def stage_tiles2():
    run_script(f"{HERE}/probe_tiles7b.py", ["qkv", "gate_up"])


def stage_tiles1b():
    run_script(f"{HERE}/probe_tiles7b.py",
               ["1b_qkv", "1b_wo", "1b_gate_up", "1b_down", "1b_lm"])


def stage_contract():
    run_script(f"{HERE}/probe_contract.py", [])


def stage_kernels():
    """Post-rework kernel suite lines: the plane q2_k/q3_k and fused-glue
    kernels at the BASELINE 4096x4096 n=16 shape, interleaved."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gguf_tpu import quant as Q
    from gguf_tpu.ops import MMQ
    from gguf_tpu.quant.layouts import to_soa
    from gguf_tpu.utils.benchmark import mmq_loop, slope_time

    m = k = 4096
    n = 16
    bpsb = {"q2_k": 84, "q3_k": 110, "q4_k": 144, "q5_k": 176, "q6_k": 210,
            "q8_0": 34 * 8}
    quants = {"q2_k": Q.quantize_q2_k, "q3_k": Q.quantize_q3_k,
              "q4_k": Q.quantize_q4_k, "q5_k": Q.quantize_q5_k,
              "q6_k": Q.quantize_q6_k, "q8_0": Q.quantize_q8_0}
    rng = np.random.default_rng(5)
    built = {}
    x0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    for fmt, qf in quants.items():
        a = rng.standard_normal((m, k)).astype(np.float16)
        built[fmt] = jax.device_put(to_soa(fmt, qf(a), m, k))
        log(f"{fmt} built")
    from gguf_tpu.ops.common import pick_tiles

    bm, bk = pick_tiles(m, k, 2048, 1024, n)
    results = {f: [] for f in quants}
    for rnd in range(3):
        for fmt in quants:
            op = functools.partial(MMQ[fmt], act_quant=False,
                                   precision="fast", block_m=bm, block_k=bk)
            try:
                sec = slope_time(mmq_loop(op, n, m, x0), (built[fmt], x0),
                                 lo=10, hi=110)
                results[fmt].append(sec)
                wb = m * (k // 256) * bpsb[fmt]
                log(f"round {rnd} {fmt}: {sec*1e6:.2f} us "
                    f"({wb/sec/1e9:.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"round {rnd} {fmt}: ERROR {repr(e)[:200]}")
                results[fmt].append(None)
    for fmt, secs in results.items():
        good = [s for s in secs if s]
        if not good:
            print(json.dumps({"probe": f"r4kern {fmt}",
                              "error": "all rounds failed"}), flush=True)
            continue
        med = float(np.median(good))
        wb = m * (k // 256) * bpsb[fmt]
        print(json.dumps({
            "probe": f"r4kern {fmt}", "us_median": round(med * 1e6, 2),
            "gbps_median": round(wb / med / 1e9, 1),
            "us_rounds": [round(s * 1e6, 2) for s in good],
            "shape": "4096x4096 n=16, post plane/fused-glue rework"}),
            flush=True)


def stage_budget1b():
    run_script(f"{HERE}/probe_budget1b.py", [])


def stage_e2e1b():
    import suite
    suite.bench_decode(model="tinyllama")


def stage_e2e7b():
    import suite
    suite.bench_decode(model="7b")


def stage_e2e7b_contract():
    import suite
    suite.bench_decode(model="7b", contract=True)


def stage_attn_span():
    run_script(f"{HERE}/probe_attn_span.py", [])


def stage_ppl():
    run_script(f"{HERE}/probe_ppl.py", ["4096"])


STAGES = ["compile_check", "iso", "ablate", "empipe", "glue", "tiles1",
          "contract", "kernels", "budget1b", "attn_span", "tiles2", "ppl"]

if __name__ == "__main__":
    which = sys.argv[1:] or STAGES
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      HERE.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    log(f"devices={jax.devices()}")
    np.asarray(jax.numpy.zeros((1, 1)))
    log("relay warm")
    for name in which:
        log(f"=== stage {name} ===")
        try:
            globals()[f"stage_{name}"]()
            log(f"=== stage {name} done ===")
        except Exception as e:  # noqa: BLE001
            log(f"=== stage {name} FAILED: {repr(e)[:400]} ===")
            traceback.print_exc()
    log("all stages done")
