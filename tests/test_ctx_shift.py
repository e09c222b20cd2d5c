"""Context shifting (llama.cpp --ctx-shift): dropping the oldest cache
rows and sliding the rest down with rope re-rotation, so conversations
outlive max_seq. Correctness hinges on the rotation identity
K(p-d) = R(-d)·K(p) — a shifted cache must equal the cache a fresh
prefill of the surviving tokens would build (modulo one int8 requant)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gguf_tpu.engine import LLM, SamplerConfig
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import (LlamaConfig, MMOpts, forward, init_kv_cache,
                             load_llama, write_random_llama_gguf)
from gguf_tpu.models.llama import shift_kv_cache

CFG = LlamaConfig(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=256, max_seq_len=32)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cs") / "m.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=51)
    cfg, params = load_llama(path)
    return path, cfg, params


@pytest.mark.parametrize("kind", ["plain", "yarn", "neox"])
def test_shift_equals_fresh_prefill_cache(model, kind, tmp_path):
    """Prefill tokens 0..11, shift keep=2 drop=4: the cache must match a
    fresh prefill of tokens [0:2] + [6:12] (the rotation re-bases the
    moved keys exactly; V moves bit-exactly)."""
    import dataclasses

    path, cfg, params = model
    if kind != "plain":
        over = (dict(rope_scaling_kind="yarn", rope_scale=4.0,
                     rope_orig_ctx=16) if kind == "yarn"
                else dict(rope_neox=True))
        cfg2 = dataclasses.replace(CFG, **over)
        p2 = str(tmp_path / f"{kind}.gguf")
        write_random_llama_gguf(p2, cfg2, fmt=GGMLType.Q8_0, seed=52,
                                arch="qwen2" if kind == "neox" else "llama")
        cfg, params = load_llama(p2)
        if kind == "yarn":
            assert cfg.rope_scaling_kind == "yarn"
        else:
            assert cfg.rope_neox

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)
    cache = init_kv_cache(cfg, batch=1, max_seq=32)
    _, cache = forward(params, cfg, jnp.asarray(toks),
                       jnp.zeros(1, jnp.int32), cache,
                       MMOpts(precision="high"))
    shifted = shift_kv_cache(cache, cfg, slot=0, keep=2, drop=4)

    # contract: every surviving row equals the ORIGINAL row rotated by
    # -drop (deeper layers deliberately retain the dropped context's
    # influence in their hidden states — llama.cpp's shift does too; the
    # cache-row transform itself is what must be exact)
    hd = cfg.head_dim
    freqs = cfg.rope_theta ** (-np.arange(0, hd, 2) / hd)
    if cfg.rope_scaling_kind == "yarn":
        # yarn's angle is still LINEAR in position: pos * f_eff with
        # f_eff mixing interpolated/extrapolated freqs over the
        # NTK-by-parts ramp (computed here independently)
        import math

        orig, scale, theta = cfg.rope_orig_ctx, cfg.rope_scale, cfg.rope_theta
        corr = lambda n: (hd * math.log(orig / (n * 2 * math.pi))
                          / (2 * math.log(theta)))
        low = max(0.0, math.floor(corr(32.0)))
        high = min(hd - 1.0, math.ceil(corr(1.0)))
        ramp = 1.0 - np.clip((np.arange(hd // 2) - low)
                             / max(1e-3, high - low), 0.0, 1.0)
        freqs = freqs * ((1.0 - ramp) / scale + ramp)
    ang = -4.0 * freqs
    for i in range(cfg.n_layers):
        orig_k = (np.asarray(cache[i]["k"][0]).astype(np.float32)
                  * np.asarray(cache[i]["k_scale"][0])[..., None])
        got_k = (np.asarray(shifted[i]["k"][0]).astype(np.float32)
                 * np.asarray(shifted[i]["k_scale"][0])[..., None])
        orig_v = np.asarray(cache[i]["v"][0])
        got_v = np.asarray(shifted[i]["v"][0])
        c, s = np.cos(ang), np.sin(ang)
        for j in range(2, 8):                      # moved rows
            src = orig_k[:, j + 4, :]
            if cfg.rope_neox:
                e, o = src[..., :hd // 2], src[..., hd // 2:]
                exp = np.concatenate([e * c - o * s, e * s + o * c], -1)
            else:
                e, o = src[..., 0::2], src[..., 1::2]
                exp = np.stack([e * c - o * s, e * s + o * c],
                               -1).reshape(src.shape)
            denom = np.abs(exp).max() + 1e-9
            assert np.max(np.abs(got_k[:, j] - exp)) / denom < 0.03, \
                (kind, i, j)
            np.testing.assert_array_equal(got_v[:, j], orig_v[:, j + 4])
        # pinned rows untouched
        np.testing.assert_array_equal(got_v[:, :2], orig_v[:, :2])


def test_unmoved_rows_bit_exact(model):
    """Rows before `keep` must come back bit-identical (identity
    rotation requantizes to the same codes)."""
    path, cfg, params = model
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 10)).astype(np.int32)
    cache = init_kv_cache(cfg, batch=1, max_seq=32)
    _, cache = forward(params, cfg, jnp.asarray(toks),
                       jnp.zeros(1, jnp.int32), cache,
                       MMOpts(precision="high"))
    shifted = shift_kv_cache(cache, cfg, slot=0, keep=4, drop=2)
    for i in range(cfg.n_layers):
        np.testing.assert_array_equal(
            np.asarray(shifted[i]["k"][0, :, :4]),
            np.asarray(cache[i]["k"][0, :, :4]))
        np.testing.assert_array_equal(
            np.asarray(shifted[i]["v"][0, :, :4]),
            np.asarray(cache[i]["v"][0, :, :4]))


def test_session_outlives_max_seq(model):
    """A ctx_shift session keeps answering past max_seq; the shifted
    continuation tracks a session that only ever saw the surviving
    context."""
    path, cfg, params = model
    llm = LLM(path, max_batch=2, max_seq=32, ctx_shift=True)
    sess = llm.start_session(n_keep=2)
    g = SamplerConfig(temperature=0.0)
    total = 0
    for turn in range(6):
        res = sess.send([3 + turn, 7, 11], max_new_tokens=6, sampler=g,
                        stop_at_eos=False)
        total += len(res.token_ids)
        assert res.token_ids, turn
    # shifts fire mid-decode too (llama.cpp behavior), so every turn
    # delivers its full 6 tokens despite the 32-row cache
    assert total == 36
    assert sess.cached < 32                  # yet the slot never overflowed
    assert len(sess._history) <= 32          # trimmed alongside the cache
    assert sess._history[:2] == [3, 7]       # the pinned prefix survived


def test_ctx_shift_guards(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(CFG, sliding_window=8, swa_pattern=2)
    path = str(tmp_path / "swa.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=53,
                            arch="gemma2")
    with pytest.raises(AssertionError, match="ctx_shift"):
        LLM(path, max_batch=1, max_seq=32, ctx_shift=True)


def test_shift_with_freq_factors(tmp_path):
    """llama-3.1-style rope_freqs per-dim divisors: the shift rotation
    must use the DIVIDED frequencies (plain freqs would re-base moved
    keys wrongly on 3.1-scaled checkpoints)."""
    import dataclasses

    ff = tuple(float(1.0 + (i % 4)) for i in range(CFG.head_dim // 2))
    cfg = dataclasses.replace(CFG, rope_freq_factors=ff)
    path = str(tmp_path / "ff.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=54)
    lcfg, params = load_llama(path)
    assert lcfg.rope_freq_factors == ff

    rng = np.random.default_rng(3)
    toks = rng.integers(0, lcfg.vocab_size, (1, 10)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    _, cache = forward(params, lcfg, jnp.asarray(toks),
                       jnp.zeros(1, jnp.int32), cache,
                       MMOpts(precision="high"))
    shifted = shift_kv_cache(cache, lcfg, slot=0, keep=1, drop=3)

    hd = lcfg.head_dim
    freqs = lcfg.rope_theta ** (-np.arange(0, hd, 2) / hd) / np.asarray(ff)
    ang = -3.0 * freqs
    c, s = np.cos(ang), np.sin(ang)
    for i in range(lcfg.n_layers):
        orig_k = (np.asarray(cache[i]["k"][0]).astype(np.float32)
                  * np.asarray(cache[i]["k_scale"][0])[..., None])
        got_k = (np.asarray(shifted[i]["k"][0]).astype(np.float32)
                 * np.asarray(shifted[i]["k_scale"][0])[..., None])
        for j in range(1, 7):
            src = orig_k[:, j + 3, :]
            e, o = src[..., 0::2], src[..., 1::2]     # NORM pairs
            exp = np.stack([e * c - o * s, e * s + o * c],
                           -1).reshape(src.shape)
            denom = np.abs(exp).max() + 1e-9
            assert np.max(np.abs(got_k[:, j] - exp)) / denom < 0.03, (i, j)


def test_ctx_shift_refuses_learned_positions(tmp_path):
    """gpt2-style learned positions are baked into K/V values — no
    rotation can re-base them, so ctx_shift must refuse."""
    import dataclasses

    cfg = dataclasses.replace(CFG, norm_type="layer", act_fn="gelu_tanh",
                              learned_pos=True)
    path = str(tmp_path / "g2.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=55,
                            arch="gpt2")
    with pytest.raises(AssertionError, match="learned-position"):
        LLM(path, max_batch=1, max_seq=32, ctx_shift=True)
