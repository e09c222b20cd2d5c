"""Command-R / Granite / OLMo-2 / StarCoder2 serving parity.

Each arch is pinned against a numpy forward that reads the same GGUF and
implements the family's published semantics independently of the JAX
code: command-r (parallel residual, shared LayerNorm pre-norm, logit
multiplier, interleaved NORM rope), granite (the four scalar
multipliers), olmo2 (post-norm-only blocks, whole-vector q/k RMSNorm,
NEOX rope), starcoder2 (biased LayerNorms + projections, gateless GELU
FFN). Reference lineage: llama.cpp build_command_r / build_granite /
build_olmo2 / build_starcoder2.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType, GGUFReader
from gguf_tpu.models import (LlamaConfig, MMOpts, forward, init_kv_cache,
                             load_llama, write_random_llama_gguf)

BASE = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=256, max_seq_len=64)


def _numpy_forward(path, cfg, tokens):
    """GGUF-reading reference forward for the four arch variants."""
    r = GGUFReader(path)
    deq = lambda n: r.dequantize(n)
    has = lambda n: n in r.tensors
    la = lambda n: r.load_array(n)
    eps = cfg.norm_eps
    b, t = tokens.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def rmsn(v, wt):
        return v / np.sqrt(np.mean(v * v, -1, keepdims=True) + eps) * wt

    def layern(v, wt, bias):
        m = v.mean(-1, keepdims=True)
        var = ((v - m) ** 2).mean(-1, keepdims=True)
        out = (v - m) / np.sqrt(var + eps) * wt
        return out + bias if bias is not None else out

    def norm(v, name):
        if not has(name + ".weight"):
            return v
        wt = la(name + ".weight")
        if cfg.norm_type == "layer":
            return layern(v, wt, la(name + ".bias")
                          if has(name + ".bias") else None)
        return rmsn(v, wt)

    posn = np.arange(t)
    freqs = cfg.rope_theta ** (-np.arange(0, hd, 2) / hd)
    ang = posn[:, None] * freqs[None, :]
    cosh, sinh = np.cos(ang), np.sin(ang)

    def rope(x):
        c, s = cosh[None, :, None, :], sinh[None, :, None, :]
        if cfg.rope_neox:   # rotate-half pairing (j, j+hd/2)
            e, o = x[..., :hd // 2], x[..., hd // 2:]
            return np.concatenate([e * c - o * s, e * s + o * c], -1)
        e, o = x[..., 0::2], x[..., 1::2]   # NORM interleaved pairs
        return np.stack([e * c - o * s, e * s + o * c], -1).reshape(x.shape)

    x = deq("token_embd.weight")[tokens.reshape(-1)].reshape(b, t, cfg.dim)
    if cfg.embed_scale != 1.0:
        x = x * np.float32(np.float32(cfg.embed_scale).astype(np.float32))

    def lin(v, name):
        out = v @ deq(name + ".weight").T
        if has(name + ".bias"):
            out = out + la(name + ".bias")
        return out

    scale = cfg.attn_scale or 1.0 / np.sqrt(hd)
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        hx = norm(x, p + "attn_norm")
        q = lin(hx, p + "attn_q").reshape(b, t, h, hd)
        k = lin(hx, p + "attn_k").reshape(b, t, kvh, hd)
        v = lin(hx, p + "attn_v").reshape(b, t, kvh, hd)
        if has(p + "attn_q_norm.weight"):   # olmo2: whole-vector rms
            q = rmsn(q.reshape(b, t, -1),
                     la(p + "attn_q_norm.weight")).reshape(b, t, h, hd)
            k = rmsn(k.reshape(b, t, -1),
                     la(p + "attn_k_norm.weight")).reshape(b, t, kvh, hd)
        q, k = rope(q), rope(k)
        rep = h // kvh
        kf = np.repeat(k, rep, 2)
        vf = np.repeat(v, rep, 2)
        sc = np.einsum("bqhd,bkhd->bhqk", q, kf) * scale
        mask = np.tril(np.ones((t, t), bool))
        sc = np.where(mask[None, None], sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, vf).reshape(b, t, h * hd)
        att = lin(att, p + "attn_output")
        if has(p + "post_attention_norm.weight"):
            att = rmsn(att, la(p + "post_attention_norm.weight"))
        att = att * cfg.residual_scale

        def ffn(hin):
            u = lin(hin, p + "ffn_up")
            if has(p + "ffn_gate.weight"):
                g = lin(hin, p + "ffn_gate")
                if cfg.act_fn == "silu":
                    a = g / (1 + np.exp(-g)) * u
                else:
                    a = 0.5 * g * (1 + np.tanh(
                        0.7978845608 * (g + 0.044715 * g ** 3))) * u
            else:
                a = 0.5 * u * (1 + np.tanh(
                    0.7978845608 * (u + 0.044715 * u ** 3)))
            return lin(a, p + "ffn_down")

        if cfg.parallel_residual:
            x = x + att + ffn(hx)
        else:
            x = x + att
            hx2 = norm(x, p + "ffn_norm")
            out = ffn(hx2)
            if has(p + "post_ffw_norm.weight"):
                out = rmsn(out, la(p + "post_ffw_norm.weight"))
            x = x + out * cfg.residual_scale

    x = norm(x, "output_norm")
    logits = x @ deq("output.weight").T
    if cfg.logit_scale:
        logits = logits * cfg.logit_scale
    r.close()
    return logits


ARCHS = {
    "command-r": dict(norm_type="layer", parallel_residual=True,
                      logit_scale=0.6),
    "granite": dict(embed_scale=8.0, residual_scale=0.25,
                    attn_scale=0.0078125, logit_scale=1.0 / 12.0),
    "olmo2": dict(rope_neox=True),
    "starcoder2": dict(norm_type="layer", act_fn="gelu_tanh",
                       rope_neox=True),
}


@pytest.mark.parametrize("arch", sorted(ARCHS))
def test_arch_matches_numpy_reference(tmp_path, arch):
    cfg = LlamaConfig(**BASE, **ARCHS[arch])
    path = str(tmp_path / f"{arch}.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=13,
                            arch=arch)
    lcfg, params = load_llama(path)
    assert lcfg.norm_type == cfg.norm_type
    assert lcfg.parallel_residual == cfg.parallel_residual
    assert lcfg.rope_neox == cfg.rope_neox
    assert lcfg.logit_scale == pytest.approx(cfg.logit_scale)
    assert lcfg.residual_scale == pytest.approx(cfg.residual_scale)
    assert lcfg.attn_scale == pytest.approx(cfg.attn_scale)
    if arch == "olmo2":
        l0 = params["layers"][0]
        assert "q_norm_full" in l0 and "attn_norm" not in l0
    if arch == "starcoder2":
        l0 = params["layers"][0]
        assert "bo" in l0 and "bup" in l0 and "gate" not in l0
        assert "attn_norm_bias" in l0

    rng = np.random.default_rng(17)
    tokens = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=2, max_seq=32)
    logits, _ = forward(params, lcfg, jnp.asarray(tokens),
                        jnp.zeros(2, jnp.int32), cache,
                        opts=MMOpts(precision="high"))
    ref = _numpy_forward(path, lcfg, tokens)
    got = np.asarray(logits)
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        (arch, np.max(np.abs(got - ref)) / denom)


@pytest.mark.parametrize("arch", sorted(ARCHS))
def test_arch_decode_continuity(tmp_path, arch):
    """Prefill-then-decode equals full prefill at the last position (the
    KV cache path exercises each arch's attention variants)."""
    cfg = LlamaConfig(**BASE, **ARCHS[arch])
    path = str(tmp_path / f"{arch}d.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=14,
                            arch=arch)
    lcfg, params = load_llama(path)
    rng = np.random.default_rng(18)
    toks = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    full, _ = forward(params, lcfg, jnp.asarray(toks),
                      jnp.zeros(1, jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    _, cache = forward(params, lcfg, jnp.asarray(toks[:, :5]),
                       jnp.zeros(1, jnp.int32), cache,
                       opts=MMOpts(precision="high"))
    step, _ = forward(params, lcfg, jnp.asarray(toks[:, 5:]),
                      jnp.asarray([5], jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    a, b = np.asarray(full)[0, -1], np.asarray(step)[0, 0]
    denom = np.abs(a).max()
    assert np.max(np.abs(a - b)) / denom < 0.02, (arch,
                                                  np.max(np.abs(a - b)) / denom)


def test_olmo2_tp_whole_vector_norm(tmp_path):
    """olmo2 under tp=2: the whole-vector q/k norms shard with the head
    columns and psum their mean square — logits must match single-device."""
    from gguf_tpu.parallel import (
        init_sharded_cache, make_mesh, make_tp_forward, shard_llama,
    )

    cfg = LlamaConfig(**{**BASE, "dim": 512, "ffn_dim": 512}, rope_neox=True)
    path = str(tmp_path / "olmo2tp.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=15,
                            arch="olmo2")
    cfg, params = load_llama(path)
    mesh = make_mesh(tp=2)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(19)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                      (2, 4)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)
    cache = init_sharded_cache(cfg_pad, mesh, batch=2, max_seq=16)
    logits, _ = fwd(sharded, tokens, pos, cache)

    ref_cache = init_kv_cache(cfg, batch=2, max_seq=16)
    ref, _ = forward(params, cfg, tokens, pos, ref_cache,
                     MMOpts(precision="high"))
    ref = np.asarray(ref)
    np.testing.assert_allclose(np.asarray(logits), ref,
                               atol=2e-2 * np.abs(ref).max())


def test_gpt2_learned_positions(tmp_path):
    """GPT-2 family: learned absolute positions (no rope), fused biased
    qkv, biased LayerNorms, gateless GELU, tied head — pinned against a
    numpy forward. A shifted decode must DIFFER from an unshifted one
    only through the position embedding (sanity that positions apply)."""
    cfg = LlamaConfig(**BASE, norm_type="layer", act_fn="gelu_tanh",
                      learned_pos=True)
    path = str(tmp_path / "gpt2.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=71,
                            arch="gpt2")
    lcfg, params = load_llama(path)
    assert lcfg.learned_pos and lcfg.norm_type == "layer"
    assert "position_embd" in params
    l0 = params["layers"][0]
    assert "wq" in l0 and "bq" in l0 and "bo" in l0 and "gate" not in l0

    # numpy reference (learned positions, no rope)
    r = GGUFReader(path)
    deq = lambda n: r.dequantize(n)
    la = lambda n: r.load_array(n)
    rng = np.random.default_rng(20)
    tokens = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int32)
    b, t = tokens.shape
    h, hd = cfg.n_heads, cfg.head_dim
    eps = lcfg.norm_eps

    def ln(v, wt, bi):
        m = v.mean(-1, keepdims=True)
        va = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) / np.sqrt(va + eps) * wt + bi

    import math as _m
    gelu = lambda v: 0.5 * v * (1 + np.tanh(
        0.7978845608 * (v + 0.044715 * v ** 3)))
    x = deq("token_embd.weight")[tokens.reshape(-1)].reshape(b, t, cfg.dim)
    x = x + la("position_embd.weight")[None, :t]
    qd, kvd = h * hd, cfg.n_kv_heads * hd
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        hx = ln(x, la(p + "attn_norm.weight"), la(p + "attn_norm.bias"))
        qkv = hx @ deq(p + "attn_qkv.weight").T + la(p + "attn_qkv.bias")
        q = qkv[..., :qd].reshape(b, t, h, hd)
        k = qkv[..., qd:qd + kvd].reshape(b, t, cfg.n_kv_heads, hd)
        v = qkv[..., qd + kvd:].reshape(b, t, cfg.n_kv_heads, hd)
        rep = h // cfg.n_kv_heads
        k, v = np.repeat(k, rep, 2), np.repeat(v, rep, 2)
        sc = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        sc = np.where(mask[None, None], sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, -1)
        x = x + att @ deq(p + "attn_output.weight").T \
            + la(p + "attn_output.bias")
        hx = ln(x, la(p + "ffn_norm.weight"), la(p + "ffn_norm.bias"))
        u = hx @ deq(p + "ffn_up.weight").T + la(p + "ffn_up.bias")
        x = x + gelu(u) @ deq(p + "ffn_down.weight").T \
            + la(p + "ffn_down.bias")
    x = ln(x, la("output_norm.weight"), la("output_norm.bias"))
    ref = x @ deq("token_embd.weight").T
    r.close()

    cache = init_kv_cache(lcfg, batch=2, max_seq=32)
    logits, _ = forward(params, lcfg, jnp.asarray(tokens),
                        jnp.zeros(2, jnp.int32), cache,
                        opts=MMOpts(precision="high"))
    got = np.asarray(logits)[:, :, :cfg.vocab_size]
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        np.max(np.abs(got - ref)) / denom

    # decode continuity through the cache (positions via pos arg)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    _, cache = forward(params, lcfg, jnp.asarray(tokens[:1, :6]),
                       jnp.zeros(1, jnp.int32), cache,
                       opts=MMOpts(precision="high"))
    step, _ = forward(params, lcfg, jnp.asarray(tokens[:1, 6:]),
                      jnp.asarray([6], jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    a = got[0, -1]
    bstep = np.asarray(step)[0, 0, :cfg.vocab_size]
    assert np.max(np.abs(a - bstep)) / denom < 0.02


def test_falcon_parallel_separate_norms(tmp_path):
    """Falcon family: parallel residual with SEPARATE attn/mlp LayerNorms
    (40b-style), fused unbiased qkv, gateless GELU, NEOX rope — pinned
    against a numpy forward."""
    cfg = LlamaConfig(**BASE, norm_type="layer", parallel_residual=True,
                      act_fn="gelu_tanh", rope_neox=True)
    path = str(tmp_path / "falcon.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=72,
                            arch="falcon")
    lcfg, params = load_llama(path)
    assert lcfg.parallel_residual and lcfg.rope_neox
    l0 = params["layers"][0]
    assert "wq" in l0 and "bq" not in l0 and "ffn_norm" in l0

    r = GGUFReader(path)
    deq = lambda n: r.dequantize(n)
    la = lambda n: r.load_array(n)
    rng = np.random.default_rng(21)
    tokens = rng.integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)
    b, t = tokens.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    eps = lcfg.norm_eps

    def ln(v, wt, bi):
        m = v.mean(-1, keepdims=True)
        va = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) / np.sqrt(va + eps) * wt + bi

    gelu = lambda v: 0.5 * v * (1 + np.tanh(
        0.7978845608 * (v + 0.044715 * v ** 3)))
    freqs = cfg.rope_theta ** (-np.arange(0, hd, 2) / hd)
    ang = np.arange(t)[:, None] * freqs[None, :]
    c, s_ = np.cos(ang)[None, :, None, :], np.sin(ang)[None, :, None, :]

    def rope(x):   # NEOX rotate-half
        e, o = x[..., :hd // 2], x[..., hd // 2:]
        return np.concatenate([e * c - o * s_, e * s_ + o * c], -1)

    qd, kvd = h * hd, kvh * hd
    x = deq("token_embd.weight")[tokens.reshape(-1)].reshape(b, t, cfg.dim)
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        ha = ln(x, la(p + "attn_norm.weight"), la(p + "attn_norm.bias"))
        hm = ln(x, la(p + "ffn_norm.weight"), la(p + "ffn_norm.bias"))
        qkv = ha @ deq(p + "attn_qkv.weight").T
        q = rope(qkv[..., :qd].reshape(b, t, h, hd))
        k = rope(qkv[..., qd:qd + kvd].reshape(b, t, kvh, hd))
        v = qkv[..., qd + kvd:].reshape(b, t, kvh, hd)
        rep = h // kvh
        k, v = np.repeat(k, rep, 2), np.repeat(v, rep, 2)
        sc = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        sc = np.where(mask[None, None], sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, -1)
        att = att @ deq(p + "attn_output.weight").T
        u = hm @ deq(p + "ffn_up.weight").T
        mlp_o = gelu(u) @ deq(p + "ffn_down.weight").T
        x = x + att + mlp_o
    x = ln(x, la("output_norm.weight"), la("output_norm.bias"))
    ref = x @ deq("output.weight").T
    r.close()

    cache = init_kv_cache(lcfg, batch=2, max_seq=32)
    logits, _ = forward(params, lcfg, jnp.asarray(tokens),
                        jnp.zeros(2, jnp.int32), cache,
                        opts=MMOpts(precision="high"))
    got = np.asarray(logits)[:, :, :cfg.vocab_size]
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        np.max(np.abs(got - ref)) / denom


def test_stablelm_family(tmp_path):
    """StableLM (arch stablelm): biased LayerNorms + partial NEOX rotary
    + SwiGLU — pure recombination of existing switches, pinned by config
    parse + serve + decode continuity."""
    import dataclasses

    cfg = LlamaConfig(**BASE, norm_type="layer", rope_neox=True,
                      rope_dim=16)
    path = str(tmp_path / "slm.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=73,
                            arch="stablelm")
    lcfg, params = load_llama(path)
    assert lcfg.norm_type == "layer" and lcfg.rope_neox
    assert lcfg.rope_dim == 16

    rng = np.random.default_rng(22)
    toks = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    full, _ = forward(params, lcfg, jnp.asarray(toks),
                      jnp.zeros(1, jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    _, cache = forward(params, lcfg, jnp.asarray(toks[:, :5]),
                       jnp.zeros(1, jnp.int32), cache,
                       opts=MMOpts(precision="high"))
    step, _ = forward(params, lcfg, jnp.asarray(toks[:, 5:]),
                      jnp.asarray([5], jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    a, b = np.asarray(full)[0, -1], np.asarray(step)[0, 0]
    denom = np.abs(a).max()
    assert np.max(np.abs(a - b)) / denom < 0.02


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_gptneox_family(tmp_path, parallel_residual):
    """GPT-NeoX / Pythia (arch gptneox): dual biased LayerNorms per block,
    fused biased qkv, gateless GELU FFN, partial NEOX rotary, and the
    per-checkpoint use_parallel_residual flag that picks the block
    topology (llama.cpp build_gptneox). Pins config parse for both
    topologies + decode continuity."""
    cfg = LlamaConfig(**BASE, norm_type="layer", rope_neox=True,
                      rope_dim=8, act_fn="gelu_tanh",
                      parallel_residual=parallel_residual)
    path = str(tmp_path / "neox.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=91,
                            arch="gptneox")
    lcfg, params = load_llama(path)
    assert lcfg.norm_type == "layer"
    assert lcfg.rope_neox and lcfg.rope_dim == 8
    assert lcfg.act_fn == "gelu_tanh"
    assert lcfg.parallel_residual is parallel_residual
    # the separate mlp pre-norm must survive loading: the parallel-
    # residual path must feed the FFN ffn_norm(x), not the attn pre-norm
    assert "ffn_norm" in params["layers"][0]

    rng = np.random.default_rng(17)
    toks = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    full, _ = forward(params, lcfg, jnp.asarray(toks),
                      jnp.zeros(1, jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    assert np.isfinite(np.asarray(full)).all()
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    _, cache = forward(params, lcfg, jnp.asarray(toks[:, :5]),
                       jnp.zeros(1, jnp.int32), cache,
                       opts=MMOpts(precision="high"))
    step, _ = forward(params, lcfg, jnp.asarray(toks[:, 5:]),
                      jnp.asarray([5], jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    a, b = np.asarray(full)[0, -1], np.asarray(step)[0, 0]
    denom = np.abs(a).max()
    assert np.max(np.abs(a - b)) / denom < 0.02
