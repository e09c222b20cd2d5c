"""Attention kernel benchmarks (VERDICT r2 #6): us-vs-span curves for the
decode path — Pallas insert+attend pair vs the XLA einsum formulation its
docstring claims to beat — at the 1.1B and 7B decode shapes.

Interleaved within one session (Pallas and XLA alternate per point; the
shared chip's load drifts minute-to-minute, so only same-point ratios are
meaningful across sessions).

The XLA reference does exactly what the engine would do without the Pallas
kernels: DUS-insert the quantized step rows, dequantize the span slice to
f32 in HBM, einsum scores / softmax / values per (batch, head).

Usage: python -u benchmarks/bench_attention.py
Appends JSON lines to stdout (copy into RESULTS_v5e.jsonl).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[attn {time.time()-t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


import jax
import jax.numpy as jnp

from gguf_tpu.ops.attention import decode_attention_update
from gguf_tpu.utils.benchmark import slope_time

log(f"devices={jax.devices()}")
np.asarray(jnp.zeros((1, 1)))
log("relay warm")


def emit(obj):
    print(json.dumps(obj), flush=True)


def make_inputs(b, h, kvh, hd, max_s, span, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, 1, hd)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, kvh, 1, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvh, 1, hd)), jnp.float32)
    ck = jnp.asarray(rng.integers(-127, 127, (b, kvh, max_s, hd)), jnp.int8)
    cks = jnp.asarray(
        0.01 + 0.01 * rng.random((b, kvh, max_s)), jnp.float32)
    cv = jnp.asarray(rng.integers(-127, 127, (b, kvh, max_s, hd)), jnp.int8)
    cvs = jnp.asarray(
        0.01 + 0.01 * rng.random((b, kvh, max_s)), jnp.float32)
    pos = jnp.full((b,), span - 8, jnp.int32)
    return q, kn, vn, ck, cks, cv, cvs, pos


def time_pallas(b, h, kvh, hd, max_s, span):
    q, kn, vn, ck, cks, cv, cvs, pos = make_inputs(b, h, kvh, hd, max_s,
                                                   span)

    def make(iters):
        def many(q, kn, vn, ck, cks, cv, cvs, pos):
            def body(i, carry):
                acc, ck, cks, cv, cvs = carry
                out, ck, cks, cv, cvs = decode_attention_update(
                    q + acc[:1, :1, :1, :1].astype(q.dtype) * 1e-30,
                    kn, vn, ck, cks, cv, cvs, pos, t=1,
                    precision="fast", span=span)
                return acc + out.astype(jnp.float32), ck, cks, cv, cvs
            acc, *_ = jax.lax.fori_loop(
                0, iters, body,
                (jnp.zeros((b, h, 1, hd), jnp.float32), ck, cks, cv, cvs))
            return acc.sum()
        return many

    return slope_time(make, (q, kn, vn, ck, cks, cv, cvs, pos),
                      lo=20, hi=220)


def xla_attention(q, kn, vn, ck, cks, cv, cvs, pos, span):
    """The non-Pallas formulation: vmapped DUS insert + dequant span slice
    + einsum attention (what the stack shipped before ops/attention.py)."""
    b, h, _, hd = q.shape
    kvh = ck.shape[1]
    from gguf_tpu.models.llama import _quantize_kv

    kq, ks = _quantize_kv(kn)
    vq, vs = _quantize_kv(vn)

    def ins(c, u, p):
        return jax.lax.dynamic_update_slice_in_dim(c, u, p, axis=1)

    ck = jax.vmap(ins)(ck, kq.transpose(0, 1, 2, 3), pos[:, None][:, 0])
    cks = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(
        c, u, p, axis=1))(cks, ks, pos)
    cv = jax.vmap(ins)(cv, vq, pos)
    cvs = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(
        c, u, p, axis=1))(cvs, vs, pos)

    kf = ck[:, :, :span].astype(jnp.float32) * cks[:, :, :span, None]
    vf = cv[:, :, :span].astype(jnp.float32) * cvs[:, :, :span, None]
    g = h // kvh
    qg = q.reshape(b, kvh, g, hd).astype(jnp.float32)
    scores = jnp.einsum("bkgd,bksd->bkgs", qg, kf) / jnp.sqrt(
        jnp.float32(hd))
    rows = jnp.arange(span)[None, :]
    mask = rows <= pos[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bksd->bkgd", p, vf)
    return out.reshape(b, h, 1, hd), ck, cks, cv, cvs


def time_xla(b, h, kvh, hd, max_s, span):
    q, kn, vn, ck, cks, cv, cvs, pos = make_inputs(b, h, kvh, hd, max_s,
                                                   span)

    def make(iters):
        def many(q, kn, vn, ck, cks, cv, cvs, pos):
            def body(i, carry):
                acc, ck, cks, cv, cvs = carry
                out, ck, cks, cv, cvs = xla_attention(
                    q + acc[:1, :1, :1, :1].astype(q.dtype) * 1e-30,
                    kn, vn, ck, cks, cv, cvs, pos, span)
                return acc + out.astype(jnp.float32), ck, cks, cv, cvs
            acc, *_ = jax.lax.fori_loop(
                0, iters, body,
                (jnp.zeros((b, h, 1, hd), jnp.float32), ck, cks, cv, cvs))
            return acc.sum()
        return many

    return slope_time(make, (q, kn, vn, ck, cks, cv, cvs, pos),
                      lo=20, hi=220)


if __name__ == "__main__":
    shapes = {
        "tinyllama-1.1b (b16 h32 kvh4 hd64)": (16, 32, 4, 64),
        "llama2-7b (b16 h32 kvh32 hd128)": (16, 32, 32, 128),
    }
    for name, (b, h, kvh, hd) in shapes.items():
        for span in (128, 256, 512, 1024):
            max_s = max(2048, span)
            try:
                tp = time_pallas(b, h, kvh, hd, max_s, span)
            except Exception as e:  # noqa: BLE001
                emit({"bench": f"attn pallas {name} span={span}",
                      "error": repr(e)[:200]})
                continue
            try:
                tx = time_xla(b, h, kvh, hd, max_s, span)
            except Exception as e:  # noqa: BLE001
                tx = None
                emit({"bench": f"attn xla {name} span={span}",
                      "error": repr(e)[:200]})
            kv_bytes = 2 * b * kvh * span * (hd + 4)  # int8 K+V + f32 scales
            emit({"bench": f"attn decode pair {name}", "span": span,
                  "pallas_us": round(tp * 1e6, 2),
                  "xla_us": round(tx * 1e6, 2) if tx else None,
                  "speedup": round(tx / tp, 2) if tx else None,
                  "kv_read_gbps": round(kv_bytes / tp / 1e9, 1)})
            log(f"{name} span={span}: pallas {tp*1e6:.1f}us, "
                f"xla {tx*1e6:.1f}us" if tx else f"{name} span={span}")
