"""Test tolerances and signal-quality analysis.

Counterpart of /root/reference/utils/test_utils.py:4-8 (relative-to-max
allclose) and kernels/cpu_impls/_utils.py:13-35 (SNR in dB), numpy/JAX-native.
"""

from __future__ import annotations

import numpy as np


def allclose_rel(a, b, ratio: float = 0.01) -> bool:
    """True iff max|a-b| <= ratio * max|b|, rejecting NaN (the reference's
    correctness gate: atol scaled by the magnitude of the expected output)."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    if np.isnan(a).any() or np.isnan(b).any():
        return False
    atol = ratio * float(np.max(np.abs(b)))
    return bool(np.allclose(a, b, atol=atol, rtol=0.0))


def max_rel_err(a, b) -> float:
    """max|a-b| / max|b| — the quantity allclose_rel gates on."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    denom = float(np.max(np.abs(b)))
    if denom == 0.0:
        return float(np.max(np.abs(a - b)))
    return float(np.max(np.abs(a - b))) / denom


def snr_db(signal, noise) -> float:
    """Signal-to-noise ratio in dB; +inf when noise power is zero."""
    signal = np.asarray(signal, dtype=np.float64)
    noise = np.asarray(noise, dtype=np.float64)
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    p_signal = float(np.mean(signal**2))
    return 10.0 * np.log10(p_signal / p_noise)
