"""Fused decode-attention kernel (ops/attention.py) vs a numpy reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gguf_tpu.ops.attention import decode_attention


def _quant(x):
    amax = np.abs(x).max(-1)
    sc = amax / 127.0
    sc[sc == 0] = 1e-9
    q = np.clip(np.rint(x / sc[..., None]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(sc.astype(np.float32))


def _reference(q, k_i, ks, v_i, vs, pos, t):
    """Dequantize-everything einsum attention, f64."""
    b, h, _, hd = q.shape
    kvh, s = k_i.shape[1], k_i.shape[2]
    g = h // kvh
    k_all = np.asarray(k_i).astype(np.float64) * np.asarray(ks)[..., None]
    v_all = np.asarray(v_i).astype(np.float64) * np.asarray(vs)[..., None]
    qg = np.asarray(q).astype(np.float64).reshape(b, kvh, g * t, hd)
    scores = np.einsum("bgqd,bgsd->bgqs", qg, k_all) / np.sqrt(hd)
    tok = np.asarray(pos)[:, None] + (np.arange(g * t) % t)[None, :]
    mask = np.arange(s)[None, None, :] <= tok[:, :, None]          # (b, Q, s)
    scores = np.where(mask[:, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bgqs,bgsd->bgqd", probs, v_all).reshape(b, h, t, hd)


@pytest.mark.parametrize("t", [1, 2, 4])
@pytest.mark.parametrize("b,h,kvh,s,hd", [
    (4, 8, 2, 64, 64),     # GQA
    (2, 4, 4, 32, 64),     # MHA (g=1)
    (3, 8, 1, 128, 128),   # MQA, 128 head dim
])
def test_decode_attention_matches_reference(t, b, h, kvh, s, hd):
    rng = np.random.default_rng(hash((t, b, h)) % 2**31)
    q = jnp.asarray(rng.standard_normal((b, h, t, hd)), jnp.float32)
    k_i, ks = _quant(rng.standard_normal((b, kvh, s, hd)).astype(np.float32))
    v_i, vs = _quant(rng.standard_normal((b, kvh, s, hd)).astype(np.float32))
    pos = jnp.asarray(rng.integers(1, s - t, b), jnp.int32)

    ref = _reference(q, k_i, ks, v_i, vs, pos, t)
    for precision, tol in [("high", 2e-5), ("fast", 2e-2)]:
        out = np.asarray(decode_attention(
            q, k_i, ks, v_i, vs, pos, t=t, precision=precision))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        assert err < tol, (precision, err)


def test_decode_attention_causality():
    """Key slots beyond pos must not influence the output."""
    rng = np.random.default_rng(0)
    b, h, kvh, s, hd, t = 2, 4, 2, 32, 64, 1
    q = jnp.asarray(rng.standard_normal((b, h, t, hd)), jnp.float32)
    kf = rng.standard_normal((b, kvh, s, hd)).astype(np.float32)
    vf = rng.standard_normal((b, kvh, s, hd)).astype(np.float32)
    pos = jnp.asarray([5, 9], jnp.int32)

    k_i, ks = _quant(kf)
    v_i, vs = _quant(vf)
    out_a = np.asarray(decode_attention(q, k_i, ks, v_i, vs, pos, t=t))

    # scribble on the future slots — output must not move
    kf2, vf2 = kf.copy(), vf.copy()
    for i, p in enumerate([5, 9]):
        kf2[i, :, p + 1:] = 1e3
        vf2[i, :, p + 1:] = -1e3
    k_i2, ks2 = _quant(kf2)
    v_i2, vs2 = _quant(vf2)
    out_b = np.asarray(decode_attention(q, k_i2, ks2, v_i2, vs2, pos, t=t))
    np.testing.assert_allclose(out_a, out_b, rtol=0, atol=1e-6)
