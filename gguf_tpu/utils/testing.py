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


def relative_error_heatmap(approx, exact, path: str | None = None,
                           title: str = "relative error"):
    """Save (or show) a heatmap of |approx-exact| / max|exact| for a 2-D
    result — the reference's plot_hot_graph debug view
    (/root/reference/kernels/cpu_impls/_utils.py:5-10). Returns the error
    matrix so callers can assert on it without matplotlib."""
    approx = np.asarray(approx, dtype=np.float32)
    exact = np.asarray(exact, dtype=np.float32)
    denom = float(np.max(np.abs(exact))) or 1.0
    err = np.abs(approx - exact) / denom
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:           # pragma: no cover - matplotlib is baked in
        return err
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(err, aspect="auto", cmap="hot")
    ax.set_title(title)
    ax.set_xlabel("n")
    ax.set_ylabel("m")
    fig.colorbar(im, ax=ax, label="|err| / max|exact|")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    else:                         # pragma: no cover - interactive use
        plt.show()
    return err
