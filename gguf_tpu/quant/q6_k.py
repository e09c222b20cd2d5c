"""Q6_K codec — 256-element superblocks, 210 bytes:

    [ql: 128 bytes][qh: 64 bytes][scales: 16 x int8][d: fp16]

16 sub-blocks of 16 elements; element value x = d*scale*(q-32) with q a 6-bit
code stored as a low nibble (ql) plus a high 2-bit field (qh). Packing is per
128-element half h (h = 0, 1):

    ql byte 64h+l    (l<32): low4(elem 128h+l)    | low4(elem 128h+64+l) << 4
    ql byte 64h+32+l (l<32): low4(elem 128h+32+l) | low4(elem 128h+96+l) << 4
    qh byte 32h+l    (l<32): hi2 of elems 128h+l, +32, +64, +96 at bits 0,2,4,6

Quantization runs in the native core (csrc/gguf_kquant.c) — bit-identical to
GGML/llama.cpp. Capability match of /root/reference/utils/quantize/q6_k.py
(struct :30, quantize :97, dequantize_blocks :117).
"""

from __future__ import annotations

import numpy as np

from . import native

QK_K = 256
BLOCK_BYTES = 210
SUB_BLOCKS = 16  # of 16 elements each


def quantize_q6_k(x: np.ndarray) -> np.ndarray:
    """float array (size % 256 == 0) -> flat GGUF Q6_K bytes (uint8)."""
    return native.quantize_q6_k(np.asarray(x))


def parse_q6_k(qbytes: np.ndarray):
    """Flat Q6_K bytes -> (d: f32 (nb,), scales: int8 (nb,16),
    q: int8 (nb,256) unpacked codes, already offset by -32)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q6_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]

    ql = blocks[:, :128].reshape(nb, 2, 2, 32)   # (half, q-slot, byte)
    qh = blocks[:, 128:192].reshape(nb, 2, 32)   # (half, byte)
    scales = blocks[:, 192:208].view(np.int8)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32).reshape(nb)

    lo = ql & 0x0F          # (nb, 2, 2, 32): half h, slot s -> elems 128h+32s+l
    hi = ql >> 4            # half h, slot s -> elems 128h+64+32s+l
    low4 = np.concatenate([lo, hi], axis=2).reshape(nb, QK_K)

    shifts = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    hi2 = ((qh[:, :, None, :] >> shifts) & 0x03).reshape(nb, QK_K)

    q = (low4 | (hi2 << 4)).astype(np.int8) - np.int8(32)
    return d, scales, q


def dequantize_q6_k(qbytes: np.ndarray, shape, native: bool = True) -> np.ndarray:
    if native:
        try:    # C core (csrc/gguf_kquant.c): ~25x the numpy path below,
                # output exactly equal (same float op order)
            from .native import dequantize_q6_k_native

            n = int(np.prod(shape))
            return dequantize_q6_k_native(np.asarray(qbytes), n).reshape(shape)
        except (OSError, ImportError):
            pass
    return _dequantize_q6_k_np(qbytes, shape)


def _dequantize_q6_k_np(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q6_K bytes -> float32 array of `shape` (x = d*scale*(q-32))."""
    d, scales, q = parse_q6_k(qbytes)
    nb = d.shape[0]
    scale = (d[:, None] * scales.astype(np.float32))[:, :, None]  # (nb,16,1)
    x = scale * q.reshape(nb, SUB_BLOCKS, 16).astype(np.float32)
    return x.reshape(shape)
