"""Legacy GGUF codecs — Q4_0, Q4_1, Q5_0, Q5_1 (32-element blocks).

The upstream reference ships no codec for these (its quantize/ utils cover
q8_0/q8_1/q4_k/q6_k only), but they are ubiquitous in real GGUF files, so
serving them is part of llama.cpp-ecosystem completeness. Byte layouts and
quantizer arithmetic follow the GGML spec exactly (ggml-quants.c reference
quantizers re-expressed as vectorized numpy; same truncation-based rounding
and fp16 scale storage), gated by the same stack as Q5_K/Q2_K/Q3_K: byte
round-trips, SNR floors, integer-dot goldens, Pallas kernel parity.

Block layouts (all little-endian, nibble j holds elems j | j+16<<4):
  q4_0: [d fp16][qs 16B]            x = d * (q - 8),   q in [0, 16)
  q4_1: [d fp16][m fp16][qs 16B]    x = d * q + m,     q in [0, 16)
  q5_0: [d fp16][qh 4B][qs 16B]     x = d * (q - 16),  q in [0, 32)
  q5_1: [d fp16][m fp16][qh 4B][qs 16B]  x = d * q + m
qh bit j (j < 16) = 5th bit of elem j; bit j+16 = 5th bit of elem j+16.
"""

from __future__ import annotations

import numpy as np

BLOCK = 32
BLOCK_BYTES = {"q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24}


def _signed_absmax(g: np.ndarray) -> np.ndarray:
    """Per-row value with the largest |x| (first occurrence wins, keeping its
    sign) — GGML's `if (amax < fabsf(v)) { amax = |v|; max = v; }` loop."""
    idx = np.argmax(np.abs(g), axis=1)
    return g[np.arange(g.shape[0]), idx]


def _blocks(x: np.ndarray, fmt: str) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    if x.size % BLOCK:
        raise ValueError(f"{fmt} needs size % {BLOCK} == 0, got {x.size}")
    return x.reshape(-1, BLOCK)


def _pack_qh(hi: np.ndarray) -> np.ndarray:
    """(nb, 32) 0/1 fifth bits -> (nb, 4) qh bytes (u32 little-endian,
    bit j = elem j)."""
    w = np.zeros(hi.shape[0], np.uint32)
    for j in range(32):
        w |= hi[:, j].astype(np.uint32) << j
    return w[:, None].view(np.uint8).reshape(-1, 4)


def _unpack_qh(qh: np.ndarray) -> np.ndarray:
    """(nb, 4) qh bytes -> (nb, 32) 0/1 fifth bits."""
    w = np.ascontiguousarray(qh).view(np.uint32).reshape(-1)
    return ((w[:, None] >> np.arange(32)[None, :]) & 1).astype(np.uint8)


def _codes_scale(g: np.ndarray, neg_max_div: float, qmax: int):
    """GGML symmetric quantizer: d = signed_max / -neg_max_div, codes =
    min(qmax, trunc(x/d + (qmax+1)/2 + .5)). The +.5 truncation equals
    round-half-up because x/d + offset >= 0.5 by construction."""
    mx = _signed_absmax(g)
    d = mx / np.float32(-neg_max_div)
    inv = np.where(d != 0, np.float32(1.0) / np.where(d == 0, 1, d), 0.0)
    off = np.float32((qmax + 1) / 2 + 0.5)
    q = np.minimum(qmax, np.trunc(g * inv[:, None] + off)).astype(np.uint8)
    return q, d.astype(np.float16)


def _codes_affine(g: np.ndarray, qmax: int):
    """GGML affine quantizer: d = (max-min)/qmax, codes =
    min(qmax, trunc((x-min)/d + .5))."""
    mn = g.min(axis=1)
    d = (g.max(axis=1) - mn) / np.float32(qmax)
    inv = np.where(d != 0, np.float32(1.0) / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(qmax, np.trunc((g - mn[:, None]) * inv[:, None]
                                  + np.float32(0.5))).astype(np.uint8)
    return q, d.astype(np.float16), mn.astype(np.float16)


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """(nb, 32) low-nibble codes -> (nb, 16) on-disk bytes (j | j+16 << 4)."""
    return ((q[:, :16] & 0xF) | ((q[:, 16:] & 0xF) << 4)).astype(np.uint8)


def _unpack_nibbles(qs: np.ndarray) -> np.ndarray:
    """(nb, 16) bytes -> (nb, 32) 4-bit codes in element order."""
    return np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.uint8)


# ------------------------------------------------------------- quantize ---


def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    g = _blocks(x, "q4_0")
    q, d = _codes_scale(g, 8.0, 15)
    out = np.empty((g.shape[0], 18), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = _pack_nibbles(q)
    return out.reshape(-1)


def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    g = _blocks(x, "q4_1")
    q, d, mn = _codes_affine(g, 15)
    out = np.empty((g.shape[0], 20), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.view(np.uint8).reshape(-1, 2)
    out[:, 4:] = _pack_nibbles(q)
    return out.reshape(-1)


def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    g = _blocks(x, "q5_0")
    q, d = _codes_scale(g, 16.0, 31)
    out = np.empty((g.shape[0], 22), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = _pack_qh(q >> 4)
    out[:, 6:] = _pack_nibbles(q)
    return out.reshape(-1)


def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    g = _blocks(x, "q5_1")
    q, d, mn = _codes_affine(g, 31)
    out = np.empty((g.shape[0], 24), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = _pack_qh(q >> 4)
    out[:, 8:] = _pack_nibbles(q)
    return out.reshape(-1)


# ------------------------------------------------------------ parse/dequant ---


def parse_q4_0(qbytes: np.ndarray):
    """-> d (nb,) f32, codes (nb, 32) u8 in [0, 16)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, 18)
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    return d, _unpack_nibbles(b[:, 2:])


def parse_q4_1(qbytes: np.ndarray):
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, 20)
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    mn = b[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
    return d, mn, _unpack_nibbles(b[:, 4:])


def parse_q5_0(qbytes: np.ndarray):
    """-> d (nb,) f32, codes (nb, 32) u8 in [0, 32)."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, 22)
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    q = _unpack_nibbles(b[:, 6:]) | (_unpack_qh(b[:, 2:6]) << 4)
    return d, q


def parse_q5_1(qbytes: np.ndarray):
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, 24)
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    mn = b[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(-1)
    q = _unpack_nibbles(b[:, 8:]) | (_unpack_qh(b[:, 4:8]) << 4)
    return d, mn, q


def dequantize_q4_0(qbytes: np.ndarray, shape) -> np.ndarray:
    d, q = parse_q4_0(qbytes)
    return (d[:, None] * (q.astype(np.float32) - 8.0)).reshape(shape).astype(np.float32)


def dequantize_q4_1(qbytes: np.ndarray, shape) -> np.ndarray:
    d, mn, q = parse_q4_1(qbytes)
    return (d[:, None] * q.astype(np.float32) + mn[:, None]).reshape(shape).astype(np.float32)


def dequantize_q5_0(qbytes: np.ndarray, shape) -> np.ndarray:
    d, q = parse_q5_0(qbytes)
    return (d[:, None] * (q.astype(np.float32) - 16.0)).reshape(shape).astype(np.float32)


def dequantize_q5_1(qbytes: np.ndarray, shape) -> np.ndarray:
    d, mn, q = parse_q5_1(qbytes)
    return (d[:, None] * q.astype(np.float32) + mn[:, None]).reshape(shape).astype(np.float32)
