"""Activation quantization (Q8_1 semantics) as JAX ops.

The reference's GPU kernels re-quantize the activation tile to int8 inside
every kernel launch (absmax/127 per 32 elements + round-to-nearest-even,
/root/reference/kernels/mmq_q8_0.py:75-78). On TPU we hoist this out of the
matmul: activations are tiny next to the weights (N <= 32 rows in decode), and
quantizing once lets every M-tile and every layer in a fused block reuse the
result instead of redoing it per tile the way a CUDA grid must.

jnp.rint is round-half-to-even, the same contract as the reference's
magic-number `round_to_nearest_int` (mmq_q8_0.py:7-10) and GGML's
`nearest_int`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLOCK = 32


def quantize_q8_1_act(x: jax.Array):
    """(..., K) float -> (q: int8 (..., K), d: f32 (..., K/32), s: f32 (..., K/32)).

    d = absmax/127 per 32-block; s = d * sum(q) (the Q4_K min-term helper).
    Arithmetic runs in float16 so the emitted codes are identical to the
    Q8_1 codec (quant/q8_1.py) — the correctness oracle quantizes the same
    activations on the host and the int8 codes must agree exactly.
    """
    *lead, k = x.shape
    g = x.astype(jnp.float16).reshape(*lead, k // BLOCK, BLOCK)
    amax = jnp.max(jnp.abs(g), axis=-1)
    d = amax / jnp.float16(127.0)
    d_safe = jnp.where(d == 0, jnp.float16(1.0), d)
    q = jnp.clip(jnp.rint(g / d_safe[..., None]), -127, 127).astype(jnp.int8)
    s = (d * jnp.sum(q, axis=-1, dtype=jnp.int32).astype(jnp.float16)).astype(jnp.float32)
    return q.reshape(*lead, k), d.astype(jnp.float32), s


def fake_quantize_q8_1(x: jax.Array) -> jax.Array:
    """Round-trip x through Q8_1 (float in, float out). Feeding the MMQ
    kernels fake-quantized activations reproduces the reference correctness
    contract (CPU golden consumes pre-quantized Q8_1 activations,
    /root/reference/test/test_mmq_q4_k.py:31-34)."""
    *lead, k = x.shape
    q, d, _ = quantize_q8_1_act(x)
    g = q.reshape(*lead, k // BLOCK, BLOCK).astype(jnp.float32)
    return (g * d[..., None]).reshape(*lead, k)
