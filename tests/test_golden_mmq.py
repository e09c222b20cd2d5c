"""Sanity checks for the CPU golden MMQ trio.

The goldens are the oracle for the Pallas kernels, so they get their own
validation here: against full-precision matmul (quantization noise must stay
small — the SNR sweep role of the reference's cpu_impls __main__ blocks), and
structurally (shape contract C = (A @ B.T).T -> (N, M)).
"""

import numpy as np
import pytest

from gguf_tpu.quant import (
    quantize_q8_0, quantize_q8_1, quantize_q2_k, quantize_q3_k,
    quantize_q4_k, quantize_q5_k, quantize_q6_k,
    dequantize_q8_0, dequantize_q2_k, dequantize_q3_k, dequantize_q4_k,
    dequantize_q5_k, dequantize_q6_k, dequantize_q8_1,
    mmq_q8_0_q8_1_golden, mmq_q2_k_q8_1_golden, mmq_q3_k_q8_1_golden,
    mmq_q4_k_q8_1_golden, mmq_q5_k_q8_1_golden, mmq_q6_k_q8_1_golden,
    mmq_q4_0_q8_1_golden, mmq_q4_1_q8_1_golden, mmq_q5_0_q8_1_golden,
    mmq_q5_1_q8_1_golden,
    quantize_iq4_nl, quantize_iq4_xs, dequantize_iq4_nl, dequantize_iq4_xs,
    mmq_iq4_nl_q8_1_golden, mmq_iq4_xs_q8_1_golden,
)
from gguf_tpu.utils import snr_db, allclose_rel


def _mats(rng, m, n, k):
    a = rng.standard_normal((m, k)).astype(np.float16)
    b = rng.standard_normal((n, k)).astype(np.float16)
    c = (a.astype(np.float32) @ b.astype(np.float32).T).T
    return a, b, c


@pytest.mark.parametrize("m,n,k", [(1, 1, 64), (4, 4, 256), (16, 8, 512)])
def test_golden_q8_0_snr(rng, m, n, k):
    a, b, c = _mats(rng, m, n, k)
    got = mmq_q8_0_q8_1_golden(quantize_q8_0(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    assert snr_db(c, c - got) > 35  # 8-bit x 8-bit: very low quantization noise


@pytest.mark.parametrize("m,n,k", [(1, 1, 256), (4, 4, 512), (16, 8, 1024)])
def test_golden_q4_k_snr(rng, m, n, k):
    a, b, c = _mats(rng, m, n, k)
    got = mmq_q4_k_q8_1_golden(quantize_q4_k(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    # 4-bit weights dominate the noise: per-element weight rms error ~0.15
    # for unit normals puts the dot-product SNR near 20*log10(1/0.15) ~ 16 dB
    assert snr_db(c, c - got) > 12


# 2/3-bit dot SNR is ~11/16 dB in aggregate but wildly variable for a
# single dot (the signal can land near zero), so the coarse formats assert
# over many-dot shapes only.
@pytest.mark.parametrize("m,n,k", [(8, 4, 512), (16, 8, 1024)])
def test_golden_q2_k_snr(rng, m, n, k):
    a, b, c = _mats(rng, m, n, k)
    got = mmq_q2_k_q8_1_golden(quantize_q2_k(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    assert snr_db(c, c - got) > 6


@pytest.mark.parametrize("m,n,k", [(8, 4, 512), (16, 8, 1024)])
def test_golden_q3_k_snr(rng, m, n, k):
    a, b, c = _mats(rng, m, n, k)
    got = mmq_q3_k_q8_1_golden(quantize_q3_k(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    assert snr_db(c, c - got) > 11


@pytest.mark.parametrize("m,n,k", [(1, 1, 256), (4, 4, 512), (16, 8, 1024)])
def test_golden_q6_k_snr(rng, m, n, k):
    a, b, c = _mats(rng, m, n, k)
    got = mmq_q6_k_q8_1_golden(quantize_q6_k(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    assert snr_db(c, c - got) > 28


@pytest.mark.parametrize(
    "quantize,golden,dequantize",
    [
        (quantize_q8_0, mmq_q8_0_q8_1_golden, dequantize_q8_0),
        (quantize_q2_k, mmq_q2_k_q8_1_golden, dequantize_q2_k),
        (quantize_q3_k, mmq_q3_k_q8_1_golden, dequantize_q3_k),
        (quantize_q4_k, mmq_q4_k_q8_1_golden, dequantize_q4_k),
        (quantize_q5_k, mmq_q5_k_q8_1_golden, dequantize_q5_k),
        (quantize_q6_k, mmq_q6_k_q8_1_golden, dequantize_q6_k),
        (quantize_iq4_nl, mmq_iq4_nl_q8_1_golden, dequantize_iq4_nl),
        (quantize_iq4_xs, mmq_iq4_xs_q8_1_golden, dequantize_iq4_xs),
    ],
    ids=["q8_0", "q2_k", "q3_k", "q4_k", "q5_k", "q6_k", "iq4_nl", "iq4_xs"],
)
def test_golden_equals_dequant_matmul(rng, quantize, golden, dequantize):
    """The integer-dot golden must equal the dequantize-then-matmul product of
    the SAME quantized operands up to float rounding (they are algebraically
    identical)."""
    m, n, k = 8, 4, 512
    a = rng.standard_normal((m, k)).astype(np.float16)
    b = rng.standard_normal((n, k)).astype(np.float16)
    qa, qb = quantize(a), quantize_q8_1(b)
    got = golden(qa, qb, m, n, k)

    a_deq = np.asarray(dequantize(qa, (m, k)), dtype=np.float64)
    b_deq = np.asarray(dequantize_q8_1(qb, (n, k)), dtype=np.float64)
    expect = (a_deq @ b_deq.T).T
    assert allclose_rel(got, expect, 1e-3)


@pytest.mark.parametrize("m,n,k", [(4, 4, 256), (16, 8, 1024)])
def test_golden_iq4_snr(rng, m, n, k):
    """IQ4 goldens against full-precision matmul: the nonlinear codebook
    should land between linear 4-bit (~16 dB) and 5-bit (~21 dB)."""
    a, b, c = _mats(rng, m, n, k)
    for quant, golden in ((quantize_iq4_nl, mmq_iq4_nl_q8_1_golden),
                          (quantize_iq4_xs, mmq_iq4_xs_q8_1_golden)):
        got = golden(quant(a), quantize_q8_1(b), m, n, k)
        assert got.shape == (n, m)
        assert snr_db(c, c - got) > 17.0


@pytest.mark.parametrize("fmt,floor", [
    ("q4_0", 16.0), ("q4_1", 17.0), ("q5_0", 21.0), ("q5_1", 22.0),
])
@pytest.mark.parametrize("m,n,k", [(4, 4, 256), (16, 8, 1024)])
def test_golden_legacy_snr(rng, fmt, floor, m, n, k):
    """Legacy-format goldens against full-precision matmul: the integer-dot
    result must sit within each format's quantization noise floor."""
    import gguf_tpu.quant as Q

    a, b, c = _mats(rng, m, n, k)
    quant = getattr(Q, f"quantize_{fmt}")
    golden = getattr(Q, f"mmq_{fmt}_q8_1_golden")
    got = golden(quant(a), quantize_q8_1(b), m, n, k)
    assert got.shape == (n, m)
    assert snr_db(c, c - got) > floor
