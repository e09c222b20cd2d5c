"""IQ4_NL / IQ4_XS codecs — 4-bit nonlinear-codebook GGUF formats.

The upstream reference ships no IQ-series codec (its quantize/ utils cover
q8_0/q8_1/q4_k/q6_k only — /root/reference/utils/quantize/), but IQ4_NL and
IQ4_XS are common in real GGUF files: instead of linear 4-bit levels, each
nibble indexes a fixed 16-entry table of int8 values fitted to LLM weight
distributions. Byte layouts and quantizer arithmetic follow the GGML spec
(ggml-quants.c quantize_row_iq4_nl / _xs re-expressed as vectorized numpy:
same candidate-scale search, same weighted least-squares refit, same 6-bit
scale packing), gated by the same stack as the other beyond-reference
formats: byte round-trips, SNR floors, integer-dot goldens, Pallas parity.

Block layouts (little-endian):
  iq4_nl: 32 elems / 18 bytes  [d fp16][qs 16B]
          x_j = d * KVALUES[q_j]; byte j holds elem j (lo) | elem j+16 (hi)
  iq4_xs: 256 elems / 136 bytes [d fp16][scales_h u16][scales_l 4B][qs 128B]
          8 sub-blocks of 32; sub-block ib has a 6-bit scale
          ls = (scales_l nibble ib) | ((scales_h >> 2*ib) & 3) << 4,
          x = d * (ls - 32) * KVALUES[q]; qs grouped 16B per sub-block with
          the same lo/hi split as iq4_nl.

Both are purely symmetric (the codebook carries the signs), so the MMQ
kernels need no affine-correction term.
"""

from __future__ import annotations

import numpy as np

BLOCK_NL = 32
BLOCK_BYTES_NL = 18
QK_K = 256
BLOCK_BYTES_XS = 136

# The fixed IQ4 codebook (ggml's kvalues_iq4nl): 16 int8 values, sorted.
KVALUES = np.array([-127, -104, -83, -65, -49, -35, -22, -10,
                    1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8)
# nearest-value decision boundaries; ties round toward the upper index,
# matching ggml best_index_int8 (x - lo < hi - x ? lo : hi)
_MIDS = (KVALUES[:-1].astype(np.float32) + KVALUES[1:]) / 2.0

_EPS = 1e-15  # GROUP_MAX_EPS


def best_index(x: np.ndarray) -> np.ndarray:
    """Index of the KVALUES entry nearest to each float (ties upward)."""
    return np.searchsorted(_MIDS, x, side="right").astype(np.uint8)


def _signed_absmax(g: np.ndarray) -> np.ndarray:
    """Per-row value with the largest |x| (first occurrence, keeping sign)."""
    idx = np.argmax(np.abs(g), axis=1)
    return g[np.arange(g.shape[0]), idx]


def _fit_scales(g: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """GGML's per-32 candidate-scale search (quantize_row_iq4_nl_impl,
    ntry=7): candidates are the sign-preserving absmax fit id=127/max plus
    id=(t-127)/max for t in [-7, 7]; each candidate's codes are refit by
    weighted least squares d = sum(w q x)/sum(w q^2), and the best
    sum(w q x)^2/sum(w q^2) wins (first candidate on ties). `w` defaults
    to x^2 (the no-imatrix path); quant/weighted.py passes
    qw*sqrt(sigma2+x^2). Returns (nb,) f32 scales; zero rows get 0."""
    nb = g.shape[0]
    if w is None:
        w = g * g
    mx = _signed_absmax(g)
    amax = np.abs(mx)
    safe_mx = np.where(amax < _EPS, 1.0, mx)

    ids = np.empty((16, nb), np.float32)
    ids[0] = 127.0 / safe_mx                    # initial d = -max/values[0]
    for i, t in enumerate(range(-7, 8)):
        ids[i + 1] = (t - 127.0) / safe_mx
    # (cand, nb, 32) candidate codes -> codebook values
    q = KVALUES[best_index(ids[:, :, None] * g[None, :, :])].astype(np.float32)
    sumqx = np.einsum("nk,cnk->cn", w * g, q)
    sumq2 = np.einsum("nk,cnk->cn", w, q * q)
    score = np.where(sumq2 > 0, sumqx * sumqx / np.where(sumq2 == 0, 1, sumq2),
                     -np.inf)
    best = np.argmax(score, axis=0)             # first max wins ties
    rows = np.arange(nb)
    d = sumqx[best, rows] / np.where(sumq2[best, rows] == 0, 1,
                                     sumq2[best, rows])
    return np.where(amax < _EPS, 0.0, d).astype(np.float32)


def pack_nl_blocks(d: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """(nb,) scales + (nb, 32) table indices -> IQ4_NL 18-byte rows."""
    out = np.empty((d.shape[0], BLOCK_BYTES_NL), np.uint8)
    out[:, :2] = np.asarray(d, np.float32).astype(
        np.float16)[:, None].view(np.uint8)
    out[:, 2:] = codes[:, :16] | (codes[:, 16:] << 4)
    return out


def _chunked(fn, x: np.ndarray, rows_per_chunk: int = 65536) -> np.ndarray:
    if x.shape[0] <= rows_per_chunk:
        return fn(x)
    return np.concatenate([fn(x[i:i + rows_per_chunk])
                           for i in range(0, x.shape[0], rows_per_chunk)])


# ------------------------------------------------------------- quantize ---


def quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    """Float array -> IQ4_NL block bytes (flat uint8)."""
    g = np.asarray(x, dtype=np.float32).reshape(-1)
    if g.size % BLOCK_NL:
        raise ValueError(f"iq4_nl needs size % {BLOCK_NL} == 0, got {g.size}")
    g = g.reshape(-1, BLOCK_NL)

    def one(gc):
        df = np.asarray(_fit_scales(gc), np.float32)
        inv = np.where(df != 0, 1.0 / np.where(df == 0, 1, df), 0.0)
        codes = best_index(inv[:, None] * gc)
        return pack_nl_blocks(df, codes)

    return _chunked(one, g).reshape(-1)


def quantize_iq4_xs(x: np.ndarray) -> np.ndarray:
    """Float array -> IQ4_XS superblock bytes (flat uint8)."""
    g = np.asarray(x, dtype=np.float32).reshape(-1)
    if g.size % QK_K:
        raise ValueError(f"iq4_xs needs size % {QK_K} == 0, got {g.size}")
    g = g.reshape(-1, QK_K)

    def one(gc):
        ns = gc.shape[0]
        sub = gc.reshape(ns * 8, BLOCK_NL)
        scales = _fit_scales(sub).reshape(ns, 8)
        mx = _signed_absmax(scales)             # max_scale, sign kept
        d = np.where(np.abs(mx) > 0, -mx / 32.0, 0.0).astype(np.float32)
        inv_d = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
        ls = np.clip(np.rint(inv_d[:, None] * scales), -32, 31)  # 6-bit
        dl = d[:, None] * ls                    # effective per-sub-block scale
        inv_dl = np.where(dl != 0, 1.0 / np.where(dl == 0, 1, dl), 0.0)
        codes = best_index(inv_dl.reshape(-1)[:, None] * sub)    # (ns*8, 32)
        lsu = (ls + 32).astype(np.uint16)       # [0, 64)

        out = np.empty((ns, BLOCK_BYTES_XS), np.uint8)
        out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
        sh = np.zeros(ns, np.uint16)
        for ib in range(8):
            sh |= ((lsu[:, ib] >> 4) << (2 * ib)).astype(np.uint16)
        out[:, 2:4] = sh[:, None].view(np.uint8)
        lo = lsu & 0xF
        for i in range(4):
            out[:, 4 + i] = (lo[:, 2 * i] | (lo[:, 2 * i + 1] << 4)).astype(np.uint8)
        c = codes.reshape(ns, 8, BLOCK_NL)
        out[:, 8:] = (c[:, :, :16] | (c[:, :, 16:] << 4)).reshape(ns, 128)
        return out

    return _chunked(one, g, 8192).reshape(-1)


# ------------------------------------------------------- parse/dequantize ---


def parse_iq4_nl(qbytes: np.ndarray):
    """-> d (nb,) f32, codes (nb, 32) u8 table indices."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, BLOCK_BYTES_NL)
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    qs = b[:, 2:]
    codes = np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.uint8)
    return d, codes


def parse_iq4_xs(qbytes: np.ndarray):
    """-> d (ns,) f32, ls (ns, 8) i8 signed scales (the -32 offset applied),
    codes (ns, 256) u8 table indices in element order."""
    b = np.asarray(qbytes).reshape(-1).view(np.uint8).reshape(-1, BLOCK_BYTES_XS)
    ns = b.shape[0]
    d = b[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    sh = b[:, 2:4].copy().view(np.uint16).reshape(-1)
    lo = np.empty((ns, 8), np.uint8)
    for i in range(4):
        lo[:, 2 * i] = b[:, 4 + i] & 0xF
        lo[:, 2 * i + 1] = b[:, 4 + i] >> 4
    hi = np.stack([(sh >> (2 * ib)) & 3 for ib in range(8)], axis=1)
    ls = (lo.astype(np.int16) | (hi.astype(np.int16) << 4)) - 32
    qs = b[:, 8:].reshape(ns, 8, 16)
    codes = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(ns, QK_K)
    return d, ls.astype(np.int8), codes.astype(np.uint8)


def dequantize_iq4_nl(qbytes: np.ndarray, shape) -> np.ndarray:
    d, codes = parse_iq4_nl(qbytes)
    v = KVALUES[codes].astype(np.float32)
    return (d[:, None] * v).reshape(shape).astype(np.float32)


def dequantize_iq4_xs(qbytes: np.ndarray, shape) -> np.ndarray:
    d, ls, codes = parse_iq4_xs(qbytes)
    scale = (d[:, None] * ls.astype(np.float32))           # (ns, 8)
    v = KVALUES[codes].astype(np.float32).reshape(-1, 8, BLOCK_NL)
    return (scale[:, :, None] * v).reshape(shape).astype(np.float32)
