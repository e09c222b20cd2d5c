"""On-device timing that survives this environment's TPU relay.

Two hazards make naive timing wrong here (both were hit while building this
framework — see bench.py's history):

1. `block_until_ready` can return before the device is done (the relay acks
   early), so wall-clock around it measures dispatch, not compute. The only
   reliable sync is a device->host readback (`np.asarray`), which costs a
   fixed ~29 ms through the relay.
2. XLA optimizes across loop iterations: a loop-invariant matmul is hoisted,
   and a matmul whose output is only partially consumed is sliced down to
   the consumed part (C[0,0] turns the GEMM into a dot product).

`slope_time` addresses both: the op runs inside a jit'd fori_loop whose next
input depends on the previous FULL output (loop-carried dependency), the
final accumulator is read back to host, and the reported value is the
marginal per-iteration slope between a low- and a high-iteration-count jit —
the fixed readback/dispatch cost cancels in the difference. Methodology
lineage: the reference's do_bench wall-clock quantiles
(/root/reference/kernels/add_kernel.py:69-94), hardened for a relay target.
"""

from __future__ import annotations

import time

import numpy as np


def slope_time(make_f, args, lo: int = 20, hi: int = 220, reps: int = 7,
               target_delta: float = 0.02, max_iters: int = 20000,
               deadline: float | None = None) -> float:
    """Median marginal seconds/iteration between lo- and hi-iteration jits.

    `make_f(iters)` must return a function running the measured op `iters`
    times with a loop-carried data dependency and returning a scalar/array
    that depends on every iteration's full output.

    The iteration span auto-scales so the hi-lo wall-clock difference is at
    least `target_delta` seconds — fast ops otherwise drown in the relay's
    millisecond-scale readback jitter and the slope can even come out
    negative. fori_loop bodies compile once regardless of the trip count, so
    large spans cost nothing extra to build.

    `deadline` (absolute time.time() value) is a hard wall-clock budget:
    once past it, no further repetitions or auto-extension re-jits are
    started and the best estimate so far is returned. The first lo/hi
    measurement always completes (there is no answer without it).
    """
    import jax

    # cache compiled loops per trip count: the rough pass and the final
    # measure otherwise re-jit identical lo/hi programs (fresh closures
    # miss the jit cache — tens of seconds per metric on big models)
    jits: dict = {}

    def get(iters):
        if iters not in jits:
            jits[iters] = jax.jit(make_f(iters))
        return jits[iters]

    def measure(lo, hi, reps):
        f_lo, f_hi = get(lo), get(hi)
        np.asarray(f_lo(*args)), np.asarray(f_hi(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f_lo(*args))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f_hi(*args))
            t_hi = time.perf_counter() - t0
            ts.append((t_hi - t_lo) / (hi - lo))
            if deadline is not None and time.time() > deadline:
                break
        return float(np.median(ts))

    rough = measure(lo, hi, 3)
    if deadline is not None and time.time() > deadline:
        return rough
    if rough * (hi - lo) < target_delta:
        per_iter = max(rough, 1e-8)
        hi = min(max_iters, lo + int(target_delta / per_iter))
    return measure(lo, hi, reps)


def mmq_loop(op, n: int, m: int, x0):
    """make_f factory for slope_time over an MMQ kernel: accumulates the full
    (n, m) output and perturbs the next input with it."""
    import jax
    import jax.numpy as jnp

    def make(iters):
        def many(w, x):
            def body(i, carry):
                acc, xx = carry
                out = op(w, xx)
                return acc + out, x0 + acc[:, :1] * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((n, m), jnp.float32), x))
            return acc.sum()
        return many
    return make
