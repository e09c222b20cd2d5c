"""Q8_0 codec — 32-element blocks, 34 bytes: [d: fp16][qs: 32 x int8].

Element value: x = d * q, with d = absmax/127 computed in fp16 arithmetic
(capability match of /root/reference/utils/quantize/q8_0.py:4-49, which runs
the whole pipeline on torch.float16 tensors; numpy float16 ops use the same
compute-in-f32-round-to-f16 semantics). All-zero blocks store d = 1.0 — a
quirk of the reference that we preserve so quantized bytes are identical.
"""

from __future__ import annotations

import numpy as np

BLOCK = 32
BLOCK_BYTES = 34


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """float16 array (size % 32 == 0) -> flat GGUF Q8_0 bytes (uint8)."""
    x = np.asarray(x, dtype=np.float16).reshape(-1)
    if x.size % BLOCK:
        raise ValueError(f"Q8_0 needs size % {BLOCK} == 0, got {x.size}")
    g = x.reshape(-1, BLOCK)
    amax = np.max(np.abs(g), axis=1)  # fp16

    d = np.ones(g.shape[0], dtype=np.float16)
    nz = amax != 0
    d[nz] = amax[nz] / np.float16(127.0)  # fp16 division

    q = np.rint((g / d[:, None]).astype(np.float16)).astype(np.float32)
    q = np.clip(q, -127, 127).astype(np.int8)

    out = np.empty((g.shape[0], BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def dequantize_q8_0(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q8_0 bytes -> float16 array of `shape`."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q8_0 byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    d = blocks[:, :2].copy().view(np.float16).reshape(-1)
    q = blocks[:, 2:].view(np.int8)
    x = q.astype(np.float16) * d[:, None]  # fp16 product, as in the reference
    return x.reshape(shape)
