"""Tensor/data-parallel sharding on the virtual 8-device CPU mesh:
the sharded forward must reproduce single-device logits exactly-ish."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import (
    LlamaConfig, MMOpts, forward, init_kv_cache, load_llama,
    write_random_llama_gguf,
)
from gguf_tpu.parallel import (
    init_sharded_cache, make_mesh, make_tp_forward, shard_llama,
)

# row-parallel sharding needs dim % (256*tp) == 0; ffn 768 = 3 superblocks
# forces the exact zero-padding path at tp=2 (768 -> 1024)
CFG = LlamaConfig(
    vocab_size=64, dim=512, n_layers=2, n_heads=4, n_kv_heads=4,
    ffn_dim=768, max_seq_len=32,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tp") / "tiny.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=5)
    return load_llama(path)


def _single_device_logits(cfg, params, tokens, pos):
    cache = init_kv_cache(cfg, batch=tokens.shape[0], max_seq=16)
    logits, _ = forward(params, cfg, tokens, pos, cache, MMOpts(precision="high"))
    return np.asarray(logits)


@pytest.mark.parametrize("tp,dp", [
    (2, 1),
    pytest.param(2, 2, marks=pytest.mark.slow),
    pytest.param(2, 4, marks=pytest.mark.slow),
])
def test_tp_forward_matches_single_device(model, tp, dp):
    cfg, params = model
    mesh = make_mesh(tp=tp, dp=dp)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(0)
    b = 2 * dp
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)).astype(np.int32))
    pos = jnp.zeros(b, jnp.int32)
    cache = init_sharded_cache(cfg_pad, mesh, batch=b, max_seq=16)

    logits, cache2 = fwd(sharded, tokens, pos, cache)
    ref = _single_device_logits(cfg, params, tokens, pos)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-2 * np.abs(ref).max())
    # cache stays sharded over tp (kv-head dim) for the next step; GSPMD
    # normalizes trailing Nones away, so just check the axes in use
    assert "tp" in tuple(cache2[0]["k"].sharding.spec)


@pytest.mark.slow
def test_tp_decode_after_prefill(model):
    """Sharded prefill + sharded decode step chain (cache carried through)."""
    cfg, params = model
    mesh = make_mesh(tp=2, dp=1)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 4)).astype(np.int32))
    cache = init_sharded_cache(cfg_pad, mesh, batch=2, max_seq=16)
    logits, cache = fwd(sharded, tokens, jnp.zeros(2, jnp.int32), cache)
    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    logits2, cache = fwd(sharded, nxt, jnp.full(2, 4, jnp.int32), cache)

    # reference: same chain on one device
    ref_cache = init_kv_cache(cfg, batch=2, max_seq=16)
    ref1, ref_cache = forward(params, cfg, tokens, jnp.zeros(2, jnp.int32),
                              ref_cache, MMOpts(precision="high"))
    ref_nxt = jnp.argmax(ref1[:, -1], axis=-1).astype(jnp.int32)[:, None]
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(ref_nxt))
    ref2, _ = forward(params, cfg, ref_nxt, jnp.full(2, 4, jnp.int32),
                      ref_cache, MMOpts(precision="high"))
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(ref2),
        atol=2e-2 * float(jnp.abs(ref2).max()))


def test_ffn_padding_is_exact(model):
    """The 768->1024 ffn zero-padding at tp=4 must not change any logit
    (zero superblocks are exact zeros)."""
    cfg, params = model
    from gguf_tpu.parallel import pad_ffn_for_tp

    params_pad, cfg_pad = pad_ffn_for_tp(params, cfg, tp=2)
    assert cfg_pad.ffn_dim == 1024
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 3)).astype(np.int32))
    a = _single_device_logits(cfg, params, tokens, jnp.zeros(1, jnp.int32))
    b = _single_device_logits(cfg_pad, params_pad, tokens, jnp.zeros(1, jnp.int32))
    np.testing.assert_array_equal(a, b)


def test_init_distributed_single_and_mesh_health():
    """init_distributed is a safe no-op single-process, and the slice
    health-check psum counts every device on the virtual mesh."""
    from gguf_tpu.parallel import init_distributed

    info = init_distributed()
    assert info["num_processes"] == 1
    assert info["global_devices"] == len(jax.devices())
    if info["global_devices"] > 1:
        assert info["psum_ok"]


def test_qwen3_tp_forward_matches_single_device(tmp_path):
    """qwen3-family (per-head QK-norm) through tensor-parallel sharding:
    the replicated q/k norm vectors apply identically on every shard."""
    cfg0 = LlamaConfig(vocab_size=64, dim=512, n_layers=1, n_heads=4,
                       n_kv_heads=4, ffn_dim=512, max_seq_len=32)
    path = str(tmp_path / "q3tp.gguf")
    write_random_llama_gguf(path, cfg0, fmt=GGMLType.Q4_K, seed=13,
                            arch="qwen3")
    cfg, params = load_llama(path)
    assert "q_norm" in params["layers"][0]
    mesh = make_mesh(tp=2, dp=1)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 4)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)
    cache = init_sharded_cache(cfg_pad, mesh, batch=2, max_seq=16)
    logits, _ = fwd(sharded, tokens, pos, cache)
    ref = _single_device_logits(cfg, params, tokens, pos)
    np.testing.assert_allclose(np.asarray(logits), ref,
                               atol=2e-2 * np.abs(ref).max())


def test_phi2_tp_forward_matches_single_device(tmp_path):
    """phi2-family sharded serving: the bias/LayerNorm layer keys
    (bo/bup/bdown/attn_norm_bias + top-level output/output_norm biases)
    must shard (regression: param_specs KeyError'd on 'bo')."""
    cfg0 = LlamaConfig(vocab_size=64, dim=512, n_layers=1, n_heads=4,
                       n_kv_heads=4, ffn_dim=512, max_seq_len=32)
    path = str(tmp_path / "p2tp.gguf")
    write_random_llama_gguf(path, cfg0, fmt=GGMLType.Q4_K, seed=15,
                            arch="phi2")
    cfg, params = load_llama(path)
    assert "bo" in params["layers"][0] and "output_bias" in params
    mesh = make_mesh(tp=2, dp=1)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 4)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)
    cache = init_sharded_cache(cfg_pad, mesh, batch=2, max_seq=16)
    logits, _ = fwd(sharded, tokens, pos, cache)
    ref = _single_device_logits(cfg, params, tokens, pos)
    np.testing.assert_allclose(np.asarray(logits), ref,
                               atol=2e-2 * np.abs(ref).max())
