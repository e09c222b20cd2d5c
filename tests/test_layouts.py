"""SoA device-layout transforms: lossless round-trip to GGUF bytes, and the
jnp dequantizer must match the byte-level numpy dequantizer exactly."""

import numpy as np
import pytest

from gguf_tpu.quant import (
    quantize_q8_0, quantize_q2_k, quantize_q3_k, quantize_q4_k,
    quantize_q5_k, quantize_q6_k, quantize_iq4_nl, quantize_iq4_xs,
    dequantize_q8_0, dequantize_q2_k, dequantize_q3_k, dequantize_q4_k,
    dequantize_q5_k, dequantize_q6_k, dequantize_iq4_nl, dequantize_iq4_xs,
)
from gguf_tpu.quant.layouts import (
    to_soa, from_soa, quantize_to_soa, fp16_bits_to_f32,
)

QUANTIZERS = {"q8_0": quantize_q8_0, "q2_k": quantize_q2_k,
              "q3_k": quantize_q3_k, "q4_k": quantize_q4_k,
              "q5_k": quantize_q5_k, "q6_k": quantize_q6_k,
              "iq4_nl": quantize_iq4_nl, "iq4_xs": quantize_iq4_xs}
DEQUANTIZERS = {"q8_0": dequantize_q8_0, "q2_k": dequantize_q2_k,
                "q3_k": dequantize_q3_k, "q4_k": dequantize_q4_k,
                "q5_k": dequantize_q5_k, "q6_k": dequantize_q6_k,
                "iq4_nl": dequantize_iq4_nl, "iq4_xs": dequantize_iq4_xs}


@pytest.mark.parametrize("fmt", ["q8_0", "q2_k", "q3_k", "q4_k", "q5_k",
                                 "q6_k", "iq4_nl", "iq4_xs"])
@pytest.mark.parametrize("m,k", [(2, 256), (8, 512), (3, 1024)])
def test_soa_roundtrip_lossless(rng, fmt, m, k):
    x = rng.standard_normal((m, k)).astype(np.float32)
    qbytes = QUANTIZERS[fmt](x)
    t = to_soa(fmt, qbytes, m, k)
    back = from_soa(t)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(qbytes).view(np.uint8))


@pytest.mark.parametrize("fmt", ["q8_0", "q2_k", "q3_k", "q4_k", "q5_k",
                                 "q6_k", "iq4_nl", "iq4_xs"])
def test_jnp_dequant_matches_numpy(rng, fmt):
    m, k = 4, 512
    x = rng.standard_normal((m, k)).astype(np.float32)
    qbytes = QUANTIZERS[fmt](x)
    t = to_soa(fmt, qbytes, m, k)
    got = np.asarray(t.dequantize())
    if fmt == "q8_0":
        # the byte-level dequantizer rounds d*q to fp16 (reference semantics);
        # the device dequantizer keeps f32 — build the f32 oracle directly
        blocks = np.asarray(qbytes).view(np.uint8).reshape(-1, 34)
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        expect = (blocks[:, 2:].view(np.int8).astype(np.float32) * d).reshape(m, k)
    else:
        expect = np.asarray(DEQUANTIZERS[fmt](qbytes, (m, k))).astype(np.float32)
    np.testing.assert_allclose(got, expect, rtol=0, atol=0)


def test_quantize_to_soa_shapes(rng):
    x = rng.standard_normal((16, 1024)).astype(np.float32)
    # K-major layout: K-ish dim first, M on lanes
    t = quantize_to_soa(x, "q4_k")
    assert t.d_bits.shape == (4, 16)
    assert t.sc.shape == (32, 16)
    assert t.qs.shape == (512, 16)
    t6 = quantize_to_soa(x, "q6_k")
    assert t6.ql.shape == (512, 16) and t6.qh.shape == (256, 16)
    assert t6.sc.shape == (64, 16)


def test_fp16_bits_to_f32_all_finite_patterns():
    """The integer-op fp16 widening matches IEEE on every finite bit pattern
    (and preserves inf); this is the conversion every kernel relies on."""
    bits = np.arange(2**16, dtype=np.uint16)
    ref = bits.view(np.float16).astype(np.float32)
    ok = np.isfinite(ref) | np.isinf(ref)
    got = np.asarray(fp16_bits_to_f32(bits[ok]))
    np.testing.assert_array_equal(got, ref[ok])


def test_quant_tensor_is_pytree(rng):
    import jax

    t = quantize_to_soa(rng.standard_normal((4, 256)).astype(np.float32), "q4_k")
    leaves = jax.tree_util.tree_leaves(t)
    assert len(leaves) == 5  # d, dmin, sc, mn, qs
    t2 = jax.tree_util.tree_map(lambda a: a, t)
    assert t2.fmt == "q4_k" and t2.shape == (4, 256)


def test_pad_k_to_integer_rows():
    """Float-ratio row scaling truncated a row for many (k, k_target)
    pairs (e.g. 6016 * 12288/12032 = 6143.99); every SoA field must scale
    by exact integer math and agree on the padded K."""
    import numpy as np

    from gguf_tpu.models.loader import _pad_k_to
    from gguf_tpu.quant import quantize_q4_k
    from gguf_tpu.quant.layouts import to_soa

    rng = np.random.default_rng(0)
    m, k, k_target = 128, 12032, 12288
    w = to_soa("q4_k", quantize_q4_k(
        rng.standard_normal((m, k)).astype(np.float16)), m, k)
    padded = _pad_k_to(w, k_target)
    assert padded.shape == (m, k_target), padded.shape
    assert padded.qs.shape[0] == k_target // 2
    assert padded.d_bits.shape[0] == k_target // 256


@pytest.mark.parametrize("fmt", ["q8_0", "q2_k", "q3_k", "q4_k", "q5_k", "q6_k"])
def test_native_soa_matches_numpy(fmt):
    """The C SoA transform core must produce byte-identical arrays to the
    numpy reference transforms for every format and field."""
    import numpy as np

    from gguf_tpu.quant.layouts import to_soa

    rng = np.random.default_rng(hash(fmt) % 2**31)
    m, k = 160, 1536     # non-tile-multiple M, several superblocks
    quant = QUANTIZERS[fmt]
    qbytes = quant(rng.standard_normal((m, k)).astype(np.float16))

    ref = to_soa(fmt, qbytes, m, k, native=False)
    nat = to_soa(fmt, qbytes, m, k, native=True)
    for field in ("d_bits", "dmin_bits", "sc", "mn", "qs", "ql", "qh"):
        a, b = getattr(ref, field), getattr(nat, field)
        assert (a is None) == (b is None), field
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=field)
