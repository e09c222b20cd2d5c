"""Importance-weighted quantizers — the llama.cpp `--imatrix` path.

Plain quantization minimizes per-block RMSE with fixed internal
importance (x² / |x|-flavored weights). With calibration data
(eval/imatrix.py), llama.cpp's *_impl quantizers instead minimize the
ACTIVATION-weighted reconstruction error sum w_j (x_j - x̂_j)², where
w_j = imatrix_j * sqrt(sigma2 + x_j²) (sigma2 = 2·Σx²/block) — that
weighting is where most low-bit quality recovery comes from. This module
re-expresses those search loops as vectorized numpy:

- make_qx_quants_w: weighted symmetric fit (GGML make_qx_quants with
  quant_weights) — q4_0/q5_0 blocks and q6_k 16-element sub-blocks.
- make_qkx3_quants_w: weighted affine (scale, min) grid search (GGML
  make_qkx3_quants) — q4_1/q5_1 blocks and q4_k/q5_k sub-blocks.

The byte layouts produced are identical to the unweighted codecs (same
parsers/kernels serve the result); only the chosen codes/scales differ.
Covered: q4_0/q5_0/q4_1/q5_1, all five K-quants (q2_k's mean-abs-deviation
affine search and q3_k's nmax-4 symmetric fit included), and iq4_nl —
see WEIGHTED_QUANTIZERS. Only q8_0/q8_1 (which llama.cpp also never
weights) and iq4_xs fall back to unweighted quantization.
"""

from __future__ import annotations

import numpy as np

QK_K = 256
_EPS = 1e-15


def _nearest(x):
    return np.rint(x)          # round-half-even == GGML nearest_int


def make_qx_quants_w(g: np.ndarray, w: np.ndarray, nmax: int):
    """Weighted symmetric fit per row: x ≈ d·(L - nmax), L ∈ [0, 2·nmax).
    g, w: (nb, n). Returns (d (nb,), L (nb, n) uint8). Mirrors GGML
    make_qx_quants(rmse_type=1, qw): base candidate -nmax/max plus ±9
    tenth-step perturbations, each refit by weighted least squares, first
    strictly-best candidate wins."""
    nb, n = g.shape
    idx = np.argmax(np.abs(g), axis=1)
    mx = g[np.arange(nb), idx]
    amax = np.abs(mx)
    safe = np.where(amax < _EPS, 1.0, mx)

    steps = [0] + [s for s in range(-9, 10) if s != 0]
    iscales = np.stack([-(nmax + 0.1 * s) / safe for s in steps])  # (C, nb)
    l = _nearest(iscales[:, :, None] * g[None, :, :])
    l = np.clip(l, -nmax, nmax - 1)
    sumlx = np.einsum("nk,cnk->cn", w * g, l)
    suml2 = np.einsum("nk,cnk->cn", w, l * l)
    score = np.where(suml2 > 0, sumlx * sumlx / np.where(suml2 == 0, 1, suml2),
                     -np.inf)
    best = np.argmax(score, axis=0)
    rows = np.arange(nb)
    lb = l[best, rows]
    s2 = suml2[best, rows]
    d = np.where(s2 > 0, sumlx[best, rows] / np.where(s2 == 0, 1, s2), 0.0)
    d = np.where(amax < _EPS, 0.0, d)
    lb = np.where(amax[:, None] < _EPS, 0.0, lb)
    return d.astype(np.float32), (lb + nmax).astype(np.uint8)


def make_qkx3_quants_w(g: np.ndarray, w: np.ndarray, nmax: int,
                       rmin: float = -0.9, rdelta: float = 0.05,
                       nstep: int = 36, use_mad: bool = False):
    """Weighted affine fit per row: x ≈ d·L - m, L ∈ [0, nmax]. Returns
    (d (nb,), m (nb,) >= 0, L (nb, n) uint8). Mirrors GGML
    make_qkx3_quants: grid of candidate inverse scales around
    nmax/(max-min), each solving the weighted normal equations for
    (d, m) with min clamped to <= 0."""
    nb, n = g.shape
    gmin = np.minimum(g.min(axis=1), 0.0)
    gmax = g.max(axis=1)
    rng = gmax - gmin
    flat = rng < _EPS
    safe_rng = np.where(flat, 1.0, rng)

    sum_w = w.sum(axis=1)
    sum_x = (w * g).sum(axis=1)

    best_err = np.full(nb, np.inf)
    best_d = np.zeros(nb)
    best_m = np.zeros(nb)
    best_l = np.zeros((nb, n))
    # base candidate: plain range fit
    cands = [nmax / safe_rng] + [
        (rmin + rdelta * s + nmax) / safe_rng for s in range(nstep + 1)]
    for isc in cands:
        l = np.clip(_nearest(isc[:, None] * (g - gmin[:, None])), 0, nmax)
        sum_l = (w * l).sum(axis=1)
        sum_l2 = (w * l * l).sum(axis=1)
        sum_xl = (w * g * l).sum(axis=1)
        det = sum_w * sum_l2 - sum_l * sum_l
        ok = det > 0
        safe_det = np.where(ok, det, 1.0)
        d = (sum_w * sum_xl - sum_x * sum_l) / safe_det
        m = (sum_l2 * sum_x - sum_l * sum_xl) / safe_det
        # min must stay <= 0 (codes are non-negative)
        pos_m = m > 0
        d = np.where(pos_m,
                     np.where(sum_l2 > 0, sum_xl / np.where(sum_l2 == 0, 1,
                                                            sum_l2), 0.0), d)
        m = np.where(pos_m, 0.0, m)
        resid = d[:, None] * l + m[:, None] - g
        err = (w * (np.abs(resid) if use_mad else resid ** 2)).sum(axis=1)
        upd = ok & (err < best_err)
        best_err = np.where(upd, err, best_err)
        best_d = np.where(upd, d, best_d)
        best_m = np.where(upd, m, best_m)
        best_l = np.where(upd[:, None], l, best_l)
    best_d = np.where(flat, 0.0, best_d)
    best_m = np.where(flat, gmin, best_m)   # intercept == the flat value
    best_l = np.where(flat[:, None], 0.0, best_l)
    return (best_d.astype(np.float32), (-best_m).astype(np.float32),
            best_l.astype(np.uint8))


def _block_weights(g: np.ndarray, qw: np.ndarray, per: int) -> np.ndarray:
    """GGML impl weighting: w_j = qw_j * sqrt(sigma2 + x_j²), sigma2 =
    2·Σx²/per computed over each `per`-element group g."""
    sigma2 = 2.0 * (g * g).sum(axis=1, keepdims=True) / per
    return qw * np.sqrt(sigma2 + g * g)


def _tile_qw(qw: np.ndarray, nblocks: int, n: int) -> np.ndarray:
    """Per-column imatrix weights (K,) tiled to every row's blocks."""
    qw = np.asarray(qw, np.float64).reshape(-1)
    reps = nblocks * n // qw.size
    return np.tile(qw, reps).reshape(nblocks, n)


# ------------------------------------------------------------- formats ---


def quantize_q4_0_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    from .legacy import _blocks, _pack_nibbles

    g = _blocks(x, "q4_0").astype(np.float64)
    w = _block_weights(g, _tile_qw(qw, g.shape[0], 32), 32)
    d, L = make_qx_quants_w(g, w, 8)
    out = np.empty((g.shape[0], 18), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = _pack_nibbles(L)
    return out.reshape(-1)


def quantize_q5_0_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    from .legacy import _blocks, _pack_nibbles, _pack_qh

    g = _blocks(x, "q5_0").astype(np.float64)
    w = _block_weights(g, _tile_qw(qw, g.shape[0], 32), 32)
    d, L = make_qx_quants_w(g, w, 16)
    out = np.empty((g.shape[0], 22), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:6] = _pack_qh(L >> 4)
    out[:, 6:] = _pack_nibbles(L)
    return out.reshape(-1)


def quantize_q4_1_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    from .legacy import _blocks, _pack_nibbles

    g = _blocks(x, "q4_1").astype(np.float64)
    w = _block_weights(g, _tile_qw(qw, g.shape[0], 32), 32)
    d, m, L = make_qkx3_quants_w(g, w, 15)
    out = np.empty((g.shape[0], 20), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = (-m).astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:] = _pack_nibbles(L)
    return out.reshape(-1)


def quantize_q5_1_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    from .legacy import _blocks, _pack_nibbles, _pack_qh

    g = _blocks(x, "q5_1").astype(np.float64)
    w = _block_weights(g, _tile_qw(qw, g.shape[0], 32), 32)
    d, m, L = make_qkx3_quants_w(g, w, 31)
    out = np.empty((g.shape[0], 24), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = (-m).astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:8] = _pack_qh(L >> 4)
    out[:, 8:] = _pack_nibbles(L)
    return out.reshape(-1)


def _kquant_affine_w(x: np.ndarray, qw: np.ndarray, nmax: int):
    """Shared q4_k/q5_k weighted front half: per-superblock sigma2
    weighting, per-32 weighted affine fits, 6-bit scale/min packing and
    the final requantization with the quantized scales (mirrors the ref
    C flow with make_qkx3 scales in place of make_qkx2's). Returns
    (d_bits u16 (ns,), dmin_bits u16 (ns,), packed_scales (ns, 12),
    codes (ns, 256) uint8)."""
    from .q4_k import pack_scale_min, unpack_scale_min

    g = np.asarray(x, np.float64).reshape(-1, QK_K)
    ns = g.shape[0]
    sub = g.reshape(ns * 8, 32)
    qw_t = _tile_qw(qw, ns, QK_K)
    sigma2 = 2.0 * (g * g).sum(axis=1, keepdims=True) / QK_K
    w = (qw_t * np.sqrt(sigma2 + g * g)).reshape(ns * 8, 32)
    scales, mins, _ = make_qkx3_quants_w(sub, w, nmax)
    scales = scales.reshape(ns, 8)
    mins = mins.reshape(ns, 8)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_s = np.where(max_scale > 0, 63.0 / np.where(max_scale == 0, 1,
                                                    max_scale), 0.0)
    inv_m = np.where(max_min > 0, 63.0 / np.where(max_min == 0, 1,
                                                  max_min), 0.0)
    ls = np.clip(_nearest(inv_s[:, None] * scales), 0, 63).astype(np.uint8)
    lm = np.clip(_nearest(inv_m[:, None] * mins), 0, 63).astype(np.uint8)
    packed = pack_scale_min(ls, lm)
    d = (max_scale / 63.0).astype(np.float16)
    dmin = (max_min / 63.0).astype(np.float16)

    sc6, mn6 = unpack_scale_min(packed)
    dl = d.astype(np.float32)[:, None] * sc6.astype(np.float32)   # (ns, 8)
    dm = dmin.astype(np.float32)[:, None] * mn6.astype(np.float32)
    safe_dl = np.where(dl == 0, 1.0, dl)
    codes = _nearest((g.reshape(ns, 8, 32) + dm[:, :, None])
                     / safe_dl[:, :, None])
    codes = np.where((dl != 0)[:, :, None],
                     np.clip(codes, 0, nmax), 0).astype(np.uint8)
    return (d[:, None].view(np.uint16).reshape(ns),
            dmin[:, None].view(np.uint16).reshape(ns),
            packed, codes.reshape(ns, QK_K))


def quantize_q4_k_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    db, mb, packed, codes = _kquant_affine_w(x, qw, 15)
    ns = db.shape[0]
    out = np.empty((ns, 144), np.uint8)
    out[:, 0:2] = db[:, None].view(np.uint8)
    out[:, 2:4] = mb[:, None].view(np.uint8)
    out[:, 4:16] = packed
    c = codes.reshape(ns, 4, 2, 32)          # (group of 64, half, byte)
    out[:, 16:] = (c[:, :, 0] | (c[:, :, 1] << 4)).reshape(ns, 128)
    return out.reshape(-1)


def quantize_q5_k_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    from .q5_k import pack_q5_k_codes

    db, mb, packed, codes = _kquant_affine_w(x, qw, 31)
    ns = db.shape[0]
    out = np.empty((ns, 176), np.uint8)
    out[:, 0:2] = db[:, None].view(np.uint8)
    out[:, 2:4] = mb[:, None].view(np.uint8)
    out[:, 4:16] = packed
    qh, qs = pack_q5_k_codes(codes)
    out[:, 16:48] = qh
    out[:, 48:] = qs
    return out.reshape(-1)


def quantize_q6_k_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """Weighted Q6_K: per-16 weighted symmetric fits, int8 scale
    quantization vs the max |scale|, ql/qh packing as the ref."""
    g = np.asarray(x, np.float64).reshape(-1, QK_K)
    ns = g.shape[0]
    sub = g.reshape(ns * 16, 16)
    qw_t = _tile_qw(qw, ns, QK_K)
    sigma2 = 2.0 * (g * g).sum(axis=1, keepdims=True) / QK_K
    w = (qw_t * np.sqrt(sigma2 + g * g)).reshape(ns * 16, 16)
    scales, _ = make_qx_quants_w(sub, w, 32)
    scales = scales.reshape(ns, 16)

    idx = np.argmax(np.abs(scales), axis=1)
    max_s = scales[np.arange(ns), idx]
    amax = np.abs(max_s)
    isc = np.where(amax > 0, -128.0 / np.where(amax == 0, 1, max_s), 0.0)
    sc8 = np.clip(_nearest(isc[:, None] * scales), -128, 127).astype(np.int8)
    d = np.where(isc != 0, 1.0 / np.where(isc == 0, 1, isc), 0.0)
    d16 = d.astype(np.float16)

    dl = d16.astype(np.float32)[:, None] * sc8.astype(np.float32)  # (ns, 16)
    safe_dl = np.where(dl == 0, 1.0, dl)
    codes = _nearest(g.reshape(ns, 16, 16) / safe_dl[:, :, None])
    codes = np.where((dl != 0)[:, :, None], np.clip(codes, -32, 31), 0)
    C = (codes + 32).astype(np.uint8).reshape(ns, QK_K)

    low4 = (C & 0x0F).reshape(ns, 2, 4, 32)   # (half, quarter s, byte)
    hi2 = (C >> 4).reshape(ns, 2, 4, 32)
    ql = np.empty((ns, 2, 2, 32), np.uint8)
    ql[:, :, 0] = low4[:, :, 0] | (low4[:, :, 2] << 4)
    ql[:, :, 1] = low4[:, :, 1] | (low4[:, :, 3] << 4)
    qh = (hi2[:, :, 0] | (hi2[:, :, 1] << 2) | (hi2[:, :, 2] << 4)
          | (hi2[:, :, 3] << 6)).astype(np.uint8)

    out = np.empty((ns, 210), np.uint8)
    out[:, :128] = ql.reshape(ns, 128)
    out[:, 128:192] = qh.reshape(ns, 64)
    out[:, 192:208] = sc8.view(np.uint8)
    out[:, 208:210] = d16[:, None].view(np.uint8)
    return out.reshape(-1)


def quantize_q2_k_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """Weighted Q2_K: per-16 weighted affine fits (GGML's q2 search:
    rmin -0.5, step 0.005, 15 steps, mean-abs-deviation objective),
    4-bit scale/min packing, 2-bit code requantization."""
    g = np.asarray(x, np.float64).reshape(-1, QK_K)
    ns = g.shape[0]
    sub = g.reshape(ns * 16, 16)
    qw_t = _tile_qw(qw, ns, QK_K)
    sigma2 = 2.0 * (g * g).sum(axis=1, keepdims=True) / QK_K
    w = (qw_t * np.sqrt(sigma2 + g * g)).reshape(ns * 16, 16)
    scales, mins, _ = make_qkx3_quants_w(sub, w, 3, rmin=-0.5,
                                         rdelta=0.005, nstep=15,
                                         use_mad=True)
    scales = scales.reshape(ns, 16)
    mins = mins.reshape(ns, 16)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_s = np.where(max_scale > 0, 15.0 / np.where(max_scale == 0, 1,
                                                    max_scale), 0.0)
    inv_m = np.where(max_min > 0, 15.0 / np.where(max_min == 0, 1,
                                                  max_min), 0.0)
    ls = np.clip(_nearest(inv_s[:, None] * scales), 0, 15).astype(np.uint8)
    lm = np.clip(_nearest(inv_m[:, None] * mins), 0, 15).astype(np.uint8)
    d16 = (max_scale / 15.0).astype(np.float16)
    m16 = (max_min / 15.0).astype(np.float16)

    dl = d16.astype(np.float32)[:, None] * ls.astype(np.float32)  # (ns, 16)
    dm = m16.astype(np.float32)[:, None] * lm.astype(np.float32)
    safe_dl = np.where(dl == 0, 1.0, dl)
    codes = _nearest((g.reshape(ns, 16, 16) + dm[:, :, None])
                     / safe_dl[:, :, None])
    codes = np.where((dl != 0)[:, :, None],
                     np.clip(codes, 0, 3), 0).astype(np.uint8)
    C = codes.reshape(ns, 2, 4, 32)   # (half, quarter s, lane)
    qs = np.zeros((ns, 2, 32), np.uint8)
    for s in range(4):
        qs |= (C[:, :, s, :] << (2 * s)).astype(np.uint8)

    out = np.empty((ns, 84), np.uint8)
    out[:, :16] = ls | (lm << 4)
    out[:, 16:80] = qs.reshape(ns, 64)
    out[:, 80:82] = d16[:, None].view(np.uint8)
    out[:, 82:84] = m16[:, None].view(np.uint8)
    return out.reshape(-1)


def quantize_q3_k_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """Weighted Q3_K: per-16 weighted symmetric fits (nmax 4), 6-bit
    scale quantization vs max |scale| at -32, low2+hmask packing."""
    from .q3_k import pack_q3_k_codes, pack_q3_k_scales

    g = np.asarray(x, np.float64).reshape(-1, QK_K)
    ns = g.shape[0]
    sub = g.reshape(ns * 16, 16)
    qw_t = _tile_qw(qw, ns, QK_K)
    sigma2 = 2.0 * (g * g).sum(axis=1, keepdims=True) / QK_K
    w = (qw_t * np.sqrt(sigma2 + g * g)).reshape(ns * 16, 16)
    scales, _ = make_qx_quants_w(sub, w, 4)
    scales = scales.reshape(ns, 16)

    idx = np.argmax(np.abs(scales), axis=1)
    max_s = scales[np.arange(ns), idx]
    amax = np.abs(max_s)
    isc = np.where(amax > 0, -32.0 / np.where(amax == 0, 1, max_s), 0.0)
    sc6 = np.clip(_nearest(isc[:, None] * scales), -32, 31).astype(np.int32)
    d = np.where(isc != 0, 1.0 / np.where(isc == 0, 1, isc), 0.0)
    d16 = d.astype(np.float16)

    dl = d16.astype(np.float32)[:, None] * sc6.astype(np.float32)  # (ns, 16)
    safe_dl = np.where(dl == 0, 1.0, dl)
    codes = _nearest(g.reshape(ns, 16, 16) / safe_dl[:, :, None])
    codes = np.where((dl != 0)[:, :, None], np.clip(codes, -4, 3), 0)
    hmask, qs = pack_q3_k_codes(codes.astype(np.int8).reshape(ns, QK_K))

    out = np.empty((ns, 110), np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = pack_q3_k_scales(sc6)
    out[:, 108:110] = d16[:, None].view(np.uint8)
    return out.reshape(-1)


def quantize_iq4_nl_w(x: np.ndarray, qw: np.ndarray) -> np.ndarray:
    """Weighted IQ4_NL: the shared iq4 candidate-scale search with
    imatrix weights in place of the default x² (one implementation —
    iq4._fit_scales — serves both paths)."""
    from . import iq4 as _iq

    g = np.asarray(x, np.float64).reshape(-1, 32)
    w = _block_weights(g, _tile_qw(qw, g.shape[0], 32), 32)
    d = np.asarray(_iq._fit_scales(g, w), np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    codes = _iq.best_index(inv[:, None] * g)
    return _iq.pack_nl_blocks(d, codes).reshape(-1)


WEIGHTED_QUANTIZERS = {
    "q4_0": quantize_q4_0_w, "q5_0": quantize_q5_0_w,
    "q4_1": quantize_q4_1_w, "q5_1": quantize_q5_1_w,
    "q2_k": quantize_q2_k_w, "q3_k": quantize_q3_k_w,
    "q4_k": quantize_q4_k_w, "q5_k": quantize_q5_k_w,
    "q6_k": quantize_q6_k_w, "iq4_nl": quantize_iq4_nl_w,
}
