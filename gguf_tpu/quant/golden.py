"""CPU golden MMQ references — byte-exact quantized matmuls on raw GGUF bytes.

These define the correctness contract the Pallas kernels must reproduce, the
same role kernels/cpu_impls/ plays in the reference
(/root/reference/kernels/cpu_impls/mmq_q8_0_q8_1_cpu.py:5,
 mmq_q4_k_q8_1_cpu.py:61, mmq_q6_k_q8_1_cpu.py:84). Unlike the deliberately
slow per-element torch loops there, these are vectorized numpy — but the math
is the same: exact int32 dots per quantization block, scaled by the per-block
fp16 scales in float32.

Shared contract (same as the reference kernels' docstrings):
    A: quantized weight bytes, M rows x K cols
    B: Q8_1-quantized activation bytes, N rows x K cols
    C = (A @ B.T).T, shape (N, M)
"""

from __future__ import annotations

import numpy as np

from .q2_k import parse_q2_k
from .q3_k import parse_q3_k
from .q4_k import parse_q4_k
from .q5_k import parse_q5_k
from .q6_k import parse_q6_k
from .q8_1 import parse_q8_1

# canonical block sizes live in the codec modules (one source of truth)
from .q8_0 import BLOCK_BYTES as Q8_0_BLOCK_BYTES  # noqa: E402
from .q8_1 import BLOCK_BYTES as Q8_1_BLOCK_BYTES  # noqa: E402
from .q4_k import BLOCK_BYTES as Q4_K_BLOCK_BYTES  # noqa: E402
from .q5_k import BLOCK_BYTES as Q5_K_BLOCK_BYTES  # noqa: E402
from .q6_k import BLOCK_BYTES as Q6_K_BLOCK_BYTES  # noqa: E402


def _parse_q8_0_matrix(a_bytes: np.ndarray, m: int, k: int):
    b = np.asarray(a_bytes).reshape(-1).view(np.uint8)
    assert b.size == m * (k // 32) * Q8_0_BLOCK_BYTES
    blocks = b.reshape(-1, Q8_0_BLOCK_BYTES)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(m, k // 32)
    qs = blocks[:, 2:].view(np.int8).reshape(m, k // 32, 32)
    return d, qs


def _parse_q8_1_matrix(b_bytes: np.ndarray, n: int, k: int):
    d, s, qs = parse_q8_1(b_bytes)
    nb = k // 32
    assert d.size == n * nb
    return d.reshape(n, nb), s.reshape(n, nb), qs.reshape(n, nb, 32)


def mmq_q8_0_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q8_0 weights x Q8_1 activations. Per 32-block: dA*dB*dot(int32 qs)."""
    assert k % 32 == 0
    da, qa = _parse_q8_0_matrix(a_bytes, m, k)
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)
    r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", da, db, r.astype(np.float32))
    return c.T.astype(np.float32)


def mmq_q4_k_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q4_K weights x Q8_1 activations.

    Per 32-sub-block b: d*sc_b*dB*dot(q, qb) - dmin*mn_b*s, where s is Q8_1's
    precomputed dB*sum(qb) — the min-correction needs no second dot.
    """
    assert k % 256 == 0
    sb = k // 256
    d, dmin, sc, mn, q = (x.reshape(m, sb, *x.shape[1:]) for x in _split_blocks(parse_q4_k(a_bytes), m * sb))
    db, s, qb = _parse_q8_1_matrix(b_bytes, n, k)

    scale_full = (d[:, :, None] * sc).reshape(m, k // 32)       # d*sc per 32-block
    min_full = (dmin[:, :, None] * mn).reshape(m, k // 32)      # dmin*mn per 32-block
    qa = q.reshape(m, k // 32, 32)

    r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale_full, db, r.astype(np.float32))
    c -= np.einsum("mb,nb->mn", min_full, s)
    return c.T.astype(np.float32)


def mmq_q5_k_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q5_K weights x Q8_1 activations — same affine structure as Q4_K
    (d*sc*q - dmin*mn per 32-sub-block) with 5-bit codes."""
    assert k % 256 == 0
    sb = k // 256
    d, dmin, sc, mn, q = (x.reshape(m, sb, *x.shape[1:]) for x in _split_blocks(parse_q5_k(a_bytes), m * sb))
    db, s, qb = _parse_q8_1_matrix(b_bytes, n, k)

    scale_full = (d[:, :, None] * sc).reshape(m, k // 32)
    min_full = (dmin[:, :, None] * mn).reshape(m, k // 32)
    qa = q.reshape(m, k // 32, 32)

    r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale_full, db, r.astype(np.float32))
    c -= np.einsum("mb,nb->mn", min_full, s)
    return c.T.astype(np.float32)


def mmq_q2_k_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q2_K weights x Q8_1 activations.

    Scales AND mins are per 16 elements (two weight sub-blocks per Q8_1
    block): d*sc*dB*dot_16(q, qb) - dmin*mn*dB*sum_16(qb). The per-16
    activation sums come straight from the Q8_1 codes (dB*sum_16(qb) is
    exactly the sum of the dequantized activations over the half-block).
    """
    assert k % 256 == 0
    sb = k // 256
    d, dmin, sc, mn, q = (x.reshape(m, sb, *x.shape[1:]) for x in _split_blocks(parse_q2_k(a_bytes), m * sb))
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)

    scale_full = (d[:, :, None] * sc).reshape(m, k // 16)       # d*sc per 16
    min_full = (dmin[:, :, None] * mn).reshape(m, k // 16)      # dmin*mn per 16
    qa16 = q.reshape(m, k // 16, 16)
    qb16 = qb.reshape(n, k // 16, 16)
    db16 = np.repeat(db, 2, axis=1)   # each Q8_1 32-block covers two 16-dots

    r = np.einsum("mbk,nbk->mnb", qa16.astype(np.int32), qb16.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale_full, db16, r.astype(np.float32))
    s16 = db16 * qb16.astype(np.int32).sum(-1)                  # (n, k//16)
    c -= np.einsum("mb,nb->mn", min_full, s16)
    return c.T.astype(np.float32)


def mmq_q3_k_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q3_K weights x Q8_1 activations.

    Signed per-16 scales, no min term: dB * d*(sc-32)*dot_16(q, qb) with
    q already signed in [-4, 4).
    """
    assert k % 256 == 0
    sb = k // 256
    d, sc, q = (x.reshape(m, sb, *x.shape[1:]) for x in _split_blocks(parse_q3_k(a_bytes), m * sb))
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)

    scale_full = (d[:, :, None] * sc.astype(np.float32)).reshape(m, k // 16)
    qa16 = q.reshape(m, k // 16, 16)
    qb16 = qb.reshape(n, k // 16, 16)
    db16 = np.repeat(db, 2, axis=1)

    r = np.einsum("mbk,nbk->mnb", qa16.astype(np.int32), qb16.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale_full, db16, r.astype(np.float32))
    return c.T.astype(np.float32)


def mmq_q6_k_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """Q6_K weights x Q8_1 activations.

    Scales are per 16 elements (two weight sub-blocks per Q8_1 block):
    dB * (d*sc_1*dot_16 + d*sc_2*dot_16); no min term.
    """
    assert k % 256 == 0
    sb = k // 256
    d, scales, q = (x.reshape(m, sb, *x.shape[1:]) for x in _split_blocks(parse_q6_k(a_bytes), m * sb))
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)

    scale_full = (d[:, :, None] * scales.astype(np.float32)).reshape(m, k // 16)
    qa16 = q.reshape(m, k // 16, 16)
    qb16 = qb.reshape(n, k // 16, 16)
    db16 = np.repeat(db, 2, axis=1)  # each Q8_1 32-block covers two 16-dots

    r = np.einsum("mbk,nbk->mnb", qa16.astype(np.int32), qb16.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale_full, db16, r.astype(np.float32))
    return c.T.astype(np.float32)


def _legacy_golden(parse, offset: float | None):
    """Golden dot for the 32-block legacy formats. offset=None: affine
    (x = d*q + m, min term rides Q8_1's precomputed s = dB*sum(qB));
    else symmetric (x = d*(q - offset), the offset folds into the same s
    term: -offset*d*s/dB... computed as d*dB*dot(q - offset, qB))."""

    def fn(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
        assert k % 32 == 0
        parsed = parse(a_bytes)
        da = parsed[0].reshape(m, k // 32)
        qa = parsed[-1].reshape(m, k // 32, 32)
        db, s, qb = _parse_q8_1_matrix(b_bytes, n, k)
        r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
        c = np.einsum("mb,nb,mnb->mn", da, db, r.astype(np.float32))
        if offset is None:
            mn = parsed[1].reshape(m, k // 32)
            c += np.einsum("mb,nb->mn", mn, s)
        else:
            # sum_j offset*d*x_j = offset * d * (s/dB) * dB = offset*d*s
            c -= np.float32(offset) * np.einsum("mb,nb->mn", da, s)
        return c.T.astype(np.float32)

    return fn


def _make_legacy_goldens():
    from .legacy import parse_q4_0, parse_q4_1, parse_q5_0, parse_q5_1

    return {
        "q4_0": _legacy_golden(parse_q4_0, 8.0),
        "q4_1": _legacy_golden(parse_q4_1, None),
        "q5_0": _legacy_golden(parse_q5_0, 16.0),
        "q5_1": _legacy_golden(parse_q5_1, None),
    }


_lg = _make_legacy_goldens()
mmq_q4_0_q8_1_golden = _lg["q4_0"]
mmq_q4_1_q8_1_golden = _lg["q4_1"]
mmq_q5_0_q8_1_golden = _lg["q5_0"]
mmq_q5_1_q8_1_golden = _lg["q5_1"]
del _lg


def mmq_iq4_nl_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """IQ4_NL weights x Q8_1 activations. Per 32-block:
    d * dB * dot(int32 KVALUES[codes], qB) — purely symmetric, no s term
    (the codebook values carry the signs)."""
    from .iq4 import KVALUES, parse_iq4_nl

    assert k % 32 == 0
    d, codes = parse_iq4_nl(a_bytes)
    da = d.reshape(m, k // 32)
    qa = KVALUES[codes].reshape(m, k // 32, 32)
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)
    r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", da, db, r.astype(np.float32))
    return c.T.astype(np.float32)


def mmq_iq4_xs_q8_1_golden(a_bytes, b_bytes, m: int, n: int, k: int) -> np.ndarray:
    """IQ4_XS weights x Q8_1 activations. Per 32-sub-block:
    d * (ls-32) * dB * dot(int32 KVALUES[codes], qB)."""
    from .iq4 import KVALUES, parse_iq4_xs

    assert k % 256 == 0
    d, ls, codes = parse_iq4_xs(a_bytes)
    sb = k // 256
    scale32 = (d.reshape(m, sb)[:, :, None]
               * ls.reshape(m, sb, 8).astype(np.float32)).reshape(m, k // 32)
    qa = KVALUES[codes].reshape(m, k // 32, 32)
    db, _, qb = _parse_q8_1_matrix(b_bytes, n, k)
    r = np.einsum("mbk,nbk->mnb", qa.astype(np.int32), qb.astype(np.int32))
    c = np.einsum("mb,nb,mnb->mn", scale32, db, r.astype(np.float32))
    return c.T.astype(np.float32)


def _split_blocks(parsed: tuple, expected_blocks: int) -> tuple:
    """Validate block count of a parse_* result and pass it through."""
    assert parsed[0].shape[0] == expected_blocks, (
        f"expected {expected_blocks} superblocks, got {parsed[0].shape[0]}"
    )
    return parsed
