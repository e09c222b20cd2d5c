"""Q2_K codec — 256-element superblocks, 84 bytes:

    [scales: 16 bytes][qs: 64 bytes][d: fp16][dmin: fp16]

16 sub-blocks of 16 elements; scales byte j = 4-bit sc_j | 4-bit mn_j << 4.
Element value x = d*sc*q - dmin*mn with q a 2-bit code in [0, 4):

    qs byte 32h+l (per 128-half h, l<32): elems 128h+l, +32, +64, +96 at bit
    positions 0, 2, 4, 6.

There is no Q2_K in the upstream reference (it stops at Q8_0/Q4_K/Q6_K —
/root/reference/utils/quantize/ has only q4_k_ref.c and q6_k_ref.c); this
extends the same codec pattern (reference q4_k.py:87-143) down to 2.625
bits/weight, llama.cpp's smallest K-quant. Quantization runs in the native
core (csrc/gguf_kquant.c) implementing GGML's quantize_row_q2_K_ref math
(make_qkx2_quants with nmax=3, |x| weights, MAD objective, grid
-0.5/0.1/15; 4-bit sub-scale quantization against q4scale=15).
"""

from __future__ import annotations

import numpy as np

from . import native

QK_K = 256
BLOCK_BYTES = 84
SUB_BLOCKS = 16          # of 16 elements each


def quantize_q2_k(x: np.ndarray) -> np.ndarray:
    """float array (size % 256 == 0) -> flat GGUF Q2_K bytes (uint8)."""
    return native.quantize_q2_k(np.asarray(x))


def parse_q2_k_codes(qbytes: np.ndarray) -> np.ndarray:
    """Flat Q2_K bytes -> uint8 (nb, 256) unpacked 2-bit codes in element
    order."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q2_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    qv = blocks[:, 16:80].reshape(nb, 2, 32)       # (nb, half, lane)
    shifts = np.arange(4, dtype=np.uint8) * 2
    # element 128h + 32s + l  =  (qs[h, l] >> 2s) & 3
    codes = (qv[:, :, None, :] >> shifts[None, None, :, None]) & 3
    return codes.reshape(nb, QK_K).astype(np.uint8)


def parse_q2_k(qbytes: np.ndarray):
    """Flat Q2_K bytes -> (d, dmin: f32 (nb,), sc, mn: f32 (nb, 16),
    q: uint8 (nb, 256) codes in element order)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q2_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 80:82].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = blocks[:, 82:84].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc = (blocks[:, :16] & 0x0F).astype(np.float32)
    mn = (blocks[:, :16] >> 4).astype(np.float32)
    return d, dmin, sc, mn, parse_q2_k_codes(qbytes)


def dequantize_q2_k(qbytes: np.ndarray, shape, native: bool = True) -> np.ndarray:
    if native:
        try:    # C core: same float op order as the numpy path, exactly equal
            from .native import dequantize_q2_k_native

            n = int(np.prod(shape))
            return dequantize_q2_k_native(np.asarray(qbytes), n).reshape(shape)
        except (OSError, ImportError):
            pass
    return _dequantize_q2_k_np(qbytes, shape)


def _dequantize_q2_k_np(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q2_K bytes -> float32 array of `shape` (x = d*sc*q - dmin*mn)."""
    d, dmin, sc, mn, q = parse_q2_k(qbytes)
    nb = d.shape[0]
    scale = (d[:, None] * sc)[:, :, None]           # (nb, 16, 1)
    minv = (dmin[:, None] * mn)[:, :, None]
    x = scale * q.reshape(nb, SUB_BLOCKS, 16).astype(np.float32) - minv
    return x.reshape(shape)


def pack_q2_k_codes(codes: np.ndarray) -> np.ndarray:
    """(nb, 256) 2-bit codes -> on-disk qs (nb, 64) bytes. Inverse of
    parse_q2_k_codes; used by the SoA layout writer."""
    nb = codes.shape[0]
    c = codes.reshape(nb, 2, 4, 32).astype(np.uint8)   # (half, slab, lane)
    qs = np.zeros((nb, 2, 32), np.uint8)
    for s in range(4):
        qs |= (c[:, :, s, :] << (2 * s)).astype(np.uint8)
    return qs.reshape(nb, 64)
