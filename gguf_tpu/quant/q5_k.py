"""Q5_K codec — 256-element superblocks, 176 bytes:

    [d: fp16][dmin: fp16][scales: 12 bytes][qh: 32 bytes][qs: 128 bytes]

8 sub-blocks of 32 elements with the SAME packed 6-bit (sc, mn) pairs as
Q4_K (q4_k.unpack_scale_min); element value x = d*sc*q - dmin*mn with q a
5-bit code in [0, 32):

    qs byte 32g+l (per 64-group g, l<32): low 4 bits of elem[64g+l] |
                                          elem[64g+32+l] << 4
    qh byte l: the 5th bit of elems {64g + 32h + l} at bit position 2g+h.

There is no Q5_K in the upstream reference (it stops at Q8_0/Q4_K/Q6_K);
this completes llama.cpp's Q5_K_M recipe (q5_k body + q6_k head), the most
common mid-size checkpoint format in the wild. Quantization runs in the
native core (csrc/gguf_kquant.c) implementing GGML's
quantize_row_q5_K_ref math (make_qkx2_quants, nmax=31, grid -0.5/0.1/15).
"""

from __future__ import annotations

import numpy as np

from . import native
from .q4_k import pack_scale_min, unpack_scale_min

QK_K = 256
BLOCK_BYTES = 176
SUB_BLOCKS = 8


def quantize_q5_k(x: np.ndarray) -> np.ndarray:
    """float array (size % 256 == 0) -> flat GGUF Q5_K bytes (uint8)."""
    return native.quantize_q5_k(np.asarray(x))


def parse_q5_k_codes(qbytes: np.ndarray) -> np.ndarray:
    """Flat Q5_K bytes -> uint8 (nb, 256) unpacked 5-bit codes in element
    order (no scale conversion — the load-time SoA transform keeps scales
    as raw fp16 bits and only needs the codes)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q5_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    qh = blocks[:, 16:48]                          # (nb, 32)
    qv = blocks[:, 48:].reshape(nb, 4, 32)         # 4 groups of 64 elems
    low = np.stack([qv & 0x0F, qv >> 4], axis=2)   # (nb, 4, 2, 32)
    bit = np.arange(4)[:, None, None] * 2 + np.arange(2)[None, :, None]
    hi = (qh[:, None, None, :] >> bit[None]) & 1   # (nb, 4, 2, 32)
    return (low + (hi << 4).astype(np.uint8)).reshape(nb, QK_K)


def parse_q5_k(qbytes: np.ndarray):
    """Flat Q5_K bytes -> (d, dmin: f32 (nb,), sc, mn: f32 (nb,8),
    q: uint8 (nb, 256) unpacked 5-bit codes in element order)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q5_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc, mn = unpack_scale_min(blocks[:, 4:16])
    q = parse_q5_k_codes(qbytes)
    return d, dmin, sc.astype(np.float32), mn.astype(np.float32), q


def dequantize_q5_k(qbytes: np.ndarray, shape, native: bool = True) -> np.ndarray:
    if native:
        try:    # C core (csrc/gguf_kquant.c): ~25x the numpy path below,
                # output exactly equal (same float op order)
            from .native import dequantize_q5_k_native

            n = int(np.prod(shape))
            return dequantize_q5_k_native(np.asarray(qbytes), n).reshape(shape)
        except (OSError, ImportError):
            pass
    return _dequantize_q5_k_np(qbytes, shape)


def _dequantize_q5_k_np(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q5_K bytes -> float32 array of `shape` (x = d*sc*q - dmin*mn)."""
    d, dmin, sc, mn, q = parse_q5_k(qbytes)
    nb = d.shape[0]
    scale = (d[:, None] * sc)[:, :, None]
    minv = (dmin[:, None] * mn)[:, :, None]
    x = scale * q.reshape(nb, SUB_BLOCKS, 32).astype(np.float32) - minv
    return x.reshape(shape)


def pack_q5_k_codes(codes: np.ndarray) -> np.ndarray:
    """(nb, 256) 5-bit codes -> on-disk (qh (nb,32), qs (nb,128)) bytes.
    Inverse of the unpack in parse_q5_k; used by the SoA layout writer."""
    nb = codes.shape[0]
    c = codes.reshape(nb, 4, 2, 32)
    low = c & 0x0F
    hi = (c >> 4) & 1
    qs = (low[:, :, 0, :] | (low[:, :, 1, :] << 4)).reshape(nb, 128)
    qh = np.zeros((nb, 32), np.uint8)
    for g in range(4):
        for h in range(2):
            qh |= (hi[:, g, h, :] << (2 * g + h)).astype(np.uint8)
    return qh.astype(np.uint8), qs.astype(np.uint8)
