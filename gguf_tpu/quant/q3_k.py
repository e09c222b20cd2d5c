"""Q3_K codec — 256-element superblocks, 110 bytes:

    [hmask: 32 bytes][qs: 64 bytes][scales: 12 bytes][d: fp16]

16 sub-blocks of 16 elements with 6-bit scales sc in [0, 64); element value
x = d*(sc-32)*q with q = (low2 | hbit<<2) - 4, a signed 3-bit code in [-4, 4):

    qs byte 32h+l (per 128-half h, l<32): low 2 bits of elems 128h+l, +32,
        +64, +96 at bit positions 0, 2, 4, 6 (same packing as Q2_K's qs)
    hmask byte l (l<32): the third bit of elems {32b + l} at bit position b
    scales: sc_j low 4 bits in byte j (j<8) / byte j-8's high nibble (j>=8);
        top 2 bits of sc_{i}, sc_{4+i}, sc_{8+i}, sc_{12+i} in byte 8+i at
        bit positions 0, 2, 4, 6.

There is no Q3_K in the upstream reference; this extends the codec pattern
(/root/reference/utils/quantize/q4_k.py:87-143) to llama.cpp's 3.4375
bits/weight format. Quantization runs in the native core
(csrc/gguf_kquant.c) implementing GGML's quantize_row_q3_K_ref math
(make_q3_quants: x^2-weighted signed fit with 5 rounds of coordinate
descent, nmax=4; 6-bit sub-scale quantization against -32/max_scale).
"""

from __future__ import annotations

import numpy as np

from . import native

QK_K = 256
BLOCK_BYTES = 110
SUB_BLOCKS = 16          # of 16 elements each


def quantize_q3_k(x: np.ndarray) -> np.ndarray:
    """float array (size % 256 == 0) -> flat GGUF Q3_K bytes (uint8)."""
    return native.quantize_q3_k(np.asarray(x))


def unpack_q3_k_scales(scales: np.ndarray) -> np.ndarray:
    """(nb, 12) packed scale bytes -> int32 (nb, 16) values in [-32, 32)
    (the -32 offset is applied)."""
    s = np.asarray(scales, dtype=np.uint8)
    nb = s.shape[0]
    lo = np.empty((nb, 16), np.uint8)
    lo[:, :8] = s[:, :8] & 0x0F
    lo[:, 8:] = s[:, :8] >> 4
    j = np.arange(16)
    hi = (s[:, 8 + (j % 4)] >> (2 * (j // 4))[None, :]) & 3
    return (lo | (hi << 4)).astype(np.int32) - 32


def pack_q3_k_scales(sc: np.ndarray) -> np.ndarray:
    """int (nb, 16) scale values in [-32, 32) -> (nb, 12) packed bytes."""
    v = (np.asarray(sc, dtype=np.int32) + 32).astype(np.uint8)  # [0, 64)
    nb = v.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    out[:, :8] = (v[:, :8] & 0x0F) | ((v[:, 8:] & 0x0F) << 4)
    for j in range(16):
        out[:, 8 + j % 4] |= ((v[:, j] >> 4) << (2 * (j // 4))).astype(np.uint8)
    return out


def parse_q3_k_codes(qbytes: np.ndarray) -> np.ndarray:
    """Flat Q3_K bytes -> int8 (nb, 256) signed codes in [-4, 4) in element
    order (q = (low2 | hbit<<2) - 4)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q3_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    hmask = blocks[:, 0:32]                        # (nb, 32)
    qv = blocks[:, 32:96].reshape(nb, 2, 32)       # (nb, half, lane)
    shifts = np.arange(4, dtype=np.uint8) * 2
    low2 = ((qv[:, :, None, :] >> shifts[None, None, :, None]) & 3)
    low2 = low2.reshape(nb, QK_K)                  # element order
    bit = np.arange(8)[:, None]                    # hmask bit b covers 32b..
    hbit = ((hmask[:, None, :] >> bit[None]) & 1).reshape(nb, QK_K)
    return (low2 | (hbit << 2)).astype(np.int8) - np.int8(4)


def parse_q3_k(qbytes: np.ndarray):
    """Flat Q3_K bytes -> (d: f32 (nb,), sc: int32 (nb, 16) in [-32, 32),
    q: int8 (nb, 256) signed codes in [-4, 4))."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q3_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 108:110].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc = unpack_q3_k_scales(blocks[:, 96:108])
    return d, sc, parse_q3_k_codes(qbytes)


def dequantize_q3_k(qbytes: np.ndarray, shape, native: bool = True) -> np.ndarray:
    if native:
        try:    # C core: same float op order as the numpy path, exactly equal
            from .native import dequantize_q3_k_native

            n = int(np.prod(shape))
            return dequantize_q3_k_native(np.asarray(qbytes), n).reshape(shape)
        except (OSError, ImportError):
            pass
    return _dequantize_q3_k_np(qbytes, shape)


def _dequantize_q3_k_np(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q3_K bytes -> float32 array of `shape` (x = d*(sc-32)*q)."""
    d, sc, q = parse_q3_k(qbytes)
    nb = d.shape[0]
    scale = (d[:, None] * sc.astype(np.float32))[:, :, None]   # (nb, 16, 1)
    x = scale * q.reshape(nb, SUB_BLOCKS, 16).astype(np.float32)
    return x.reshape(shape)


def pack_q3_k_codes(codes: np.ndarray):
    """int8 (nb, 256) signed codes in [-4, 4) -> on-disk (hmask (nb, 32),
    qs (nb, 64)) bytes. Inverse of parse_q3_k_codes."""
    nb = codes.shape[0]
    full = (codes.astype(np.int16) + 4).astype(np.uint8)       # [0, 8)
    low2 = full & 3
    hbit = full >> 2
    c = low2.reshape(nb, 2, 4, 32)
    qs = np.zeros((nb, 2, 32), np.uint8)
    for s in range(4):
        qs |= (c[:, :, s, :] << (2 * s)).astype(np.uint8)
    h = hbit.reshape(nb, 8, 32)
    hmask = np.zeros((nb, 32), np.uint8)
    for bb in range(8):
        hmask |= (h[:, bb, :] << bb).astype(np.uint8)
    return hmask, qs.reshape(nb, 64)
