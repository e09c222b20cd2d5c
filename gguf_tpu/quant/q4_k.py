"""Q4_K codec — 256-element superblocks, 144 bytes:

    [d: fp16][dmin: fp16][scales: 12 bytes][qs: 128 bytes]

8 sub-blocks of 32 elements; per sub-block a 6-bit scale `sc` and 6-bit min
`mn`; element value x = d*sc*q - dmin*mn with q a 4-bit code. The 12 scale
bytes pack the 8 (sc, mn) pairs:

    byte j   (j<4) : sc_j & 63      | top 2 bits of sc_{j+4} in bits 6..7
    byte j+4 (j<4) : mn_j & 63      | top 2 bits of mn_{j+4} in bits 6..7
    byte j+8 (j<4) : sc_{j+4} & 0xF | (mn_{j+4} & 0xF) << 4

qs packs 4-bit codes: per 64-element group g, byte 32g+l = elem[64g+l] low
nibble, elem[64g+32+l] high nibble.

Quantization runs in the native core (csrc/gguf_kquant.c) — bit-identical to
GGML/llama.cpp. Dequantization here is vectorized numpy on the raw bytes.
Capability match of /root/reference/utils/quantize/q4_k.py (struct at :30,
quantize :87, get_scale_min :100, dequantize_blocks :125).
"""

from __future__ import annotations

import numpy as np

from . import native

QK_K = 256
BLOCK_BYTES = 144
SUB_BLOCKS = 8  # of 32 elements each


def quantize_q4_k(x: np.ndarray) -> np.ndarray:
    """float array (size % 256 == 0) -> flat GGUF Q4_K bytes (uint8)."""
    return native.quantize_q4_k(np.asarray(x))


def unpack_scale_min(scale_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(nb, 12) packed scale bytes -> (sc, mn) each (nb, 8) uint8 in [0, 64)."""
    s = np.asarray(scale_bytes, dtype=np.uint8).reshape(-1, 12)
    a, b, c = s[:, 0:4], s[:, 4:8], s[:, 8:12]
    sc = np.concatenate([a & 63, (c & 0x0F) | ((a >> 6) << 4)], axis=1)
    mn = np.concatenate([b & 63, (c >> 4) | ((b >> 6) << 4)], axis=1)
    return sc, mn


def pack_scale_min(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of unpack_scale_min: (nb, 8) x2 six-bit values -> (nb, 12)."""
    sc = np.asarray(sc, dtype=np.uint8)
    mn = np.asarray(mn, dtype=np.uint8)
    out = np.zeros((sc.shape[0], 12), dtype=np.uint8)
    out[:, 0:4] = (sc[:, 0:4] & 63) | ((sc[:, 4:8] >> 4) << 6)
    out[:, 4:8] = (mn[:, 0:4] & 63) | ((mn[:, 4:8] >> 4) << 6)
    out[:, 8:12] = (sc[:, 4:8] & 0x0F) | ((mn[:, 4:8] & 0x0F) << 4)
    return out


def parse_q4_k(qbytes: np.ndarray):
    """Flat Q4_K bytes -> (d, dmin: f32 (nb,), sc, mn: f32 (nb,8),
    q: uint8 (nb, 256) unpacked 4-bit codes in element order)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8)
    if b.size % BLOCK_BYTES:
        raise ValueError(f"Q4_K byte size must be a multiple of {BLOCK_BYTES}")
    blocks = b.reshape(-1, BLOCK_BYTES)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
    sc, mn = unpack_scale_min(blocks[:, 4:16])
    qv = blocks[:, 16:].reshape(nb, 4, 32)  # 4 groups of 64 elems
    q = np.stack([qv & 0x0F, qv >> 4], axis=2).reshape(nb, QK_K)
    return d, dmin, sc.astype(np.float32), mn.astype(np.float32), q


def dequantize_q4_k(qbytes: np.ndarray, shape, native: bool = True) -> np.ndarray:
    if native:
        try:    # C core (csrc/gguf_kquant.c): ~25x the numpy path below,
                # output exactly equal (same float op order)
            from .native import dequantize_q4_k_native

            n = int(np.prod(shape))
            return dequantize_q4_k_native(np.asarray(qbytes), n).reshape(shape)
        except (OSError, ImportError):
            pass
    return _dequantize_q4_k_np(qbytes, shape)


def _dequantize_q4_k_np(qbytes: np.ndarray, shape) -> np.ndarray:
    """Flat Q4_K bytes -> float32 array of `shape` (x = d*sc*q - dmin*mn)."""
    d, dmin, sc, mn, q = parse_q4_k(qbytes)
    nb = d.shape[0]
    scale = (d[:, None] * sc)[:, :, None]          # (nb, 8, 1)
    minv = (dmin[:, None] * mn)[:, :, None]        # (nb, 8, 1)
    x = scale * q.reshape(nb, SUB_BLOCKS, 32).astype(np.float32) - minv
    return x.reshape(shape)
