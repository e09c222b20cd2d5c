"""Q8_1 codec — 32-element blocks, 36 bytes: [d: fp16][s: fp16][qs: 32 x int8].

The activation-side format: d = absmax/127 and s = d * sum(qs), both fp16.
The precomputed s enables Q4_K's min-correction term (one multiply instead of
a second dot). Capability match of /root/reference/utils/quantize/q8_1.py
(fp16 arithmetic throughout; all-zero blocks store d = 0 and quantize with a
divisor of 1).
"""

from __future__ import annotations

import numpy as np

BLOCK = 32
BLOCK_BYTES = 36


def quantize_q8_1(x: np.ndarray) -> np.ndarray:
    """float16 array (size % 32 == 0) -> flat GGUF Q8_1 bytes (uint8)."""
    x = np.asarray(x, dtype=np.float16).reshape(-1)
    if x.size % BLOCK:
        raise ValueError(f"Q8_1 needs size % {BLOCK} == 0, got {x.size}")
    g = x.reshape(-1, BLOCK)
    amax = np.max(np.abs(g), axis=1)

    d = np.zeros(g.shape[0], dtype=np.float16)
    nz = amax != 0
    d[nz] = amax[nz] / np.float16(127.0)

    d_safe = d.copy()
    d_safe[d_safe == 0] = np.float16(1.0)

    q = np.rint((g / d_safe[:, None]).astype(np.float16)).astype(np.float32)
    q = np.clip(q, -127, 127).astype(np.int8)

    sum_q = q.sum(axis=1, dtype=np.int32).astype(np.float16)
    s = d * sum_q  # fp16 product

    out = np.empty((g.shape[0], BLOCK_BYTES), dtype=np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = s.view(np.uint8).reshape(-1, 2)
    out[:, 4:] = q.view(np.uint8)
    return out.reshape(-1)


def dequantize_q8_1(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q8_1 bytes -> float16 array of `shape`."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q8_1 byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    d = blocks[:, 0:2].copy().view(np.float16).reshape(-1)
    q = blocks[:, 4:].view(np.int8)
    x = q.astype(np.float16) * d[:, None]
    return x.reshape(shape)


def parse_q8_1(qbytes: np.ndarray):
    """Flat Q8_1 bytes -> (d: f32 (nb,), s: f32 (nb,), qs: int8 (nb, 32))."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    blocks = b.reshape(-1, BLOCK_BYTES)
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(-1)
    s = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
    qs = blocks[:, 4:].view(np.int8)
    return d, s, qs
