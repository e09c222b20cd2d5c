"""DeepSeek-V2-family (arch deepseek2) multi-head latent attention.

The served path runs the ABSORBED MLA form (models/llama.py:mla_attention):
the KV cache stores one [latent | rope-key] row per token and attn_kv_b is
folded into the query/output paths. These tests pin it against a NAIVE
numpy MLA reference that materializes per-head K/V exactly as the weights
define them — score/output equivalence of the two forms is the core MLA
identity ((W_uk q)·c == q·(W_uk^T c)), so any absorption/layout bug shows
up as a logits mismatch. MoE specifics (leading dense layers, shared
experts, routed scaling, no-renorm, sigmoid+bias gating) ride along.
Reference lineage: llama.cpp LLM_ARCH_DEEPSEEK2 / build_deepseek2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType, GGUFReader
from gguf_tpu.models import (
    LlamaConfig, MMOpts, forward, init_kv_cache, load_llama,
    write_random_llama_gguf,
)

# nope 64 + rope 32 qk heads, 64-wide v heads, 128-rank latent:
# kv_cache_dim pads 128+32 -> 256
CFG = LlamaConfig(
    vocab_size=128, dim=256, n_layers=3, n_heads=4, n_kv_heads=4,
    ffn_dim=256, max_seq_len=64, head_dim_override=96,
    q_lora_rank=64, kv_lora_rank=128, qk_rope_dim=32, v_head_dim=64,
    rope_dim=32,
    n_experts=4, n_experts_used=2, leading_dense_layers=1,
    n_shared_experts=1, routed_scale=2.0, moe_renorm=False,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mla") / "ds2.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=5,
                            arch="deepseek2")
    cfg, params = load_llama(path)
    return path, cfg, params


def _rmsn(x, w, eps):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def _numpy_mla_reference(path, cfg, tokens, cos=None, sin=None,
                         score_scale=None):
    """Naive MLA forward: per-head K/V materialized from attn_kv_b."""
    r = GGUFReader(path)
    deq = lambda n: r.dequantize(n)
    b, t = tokens.shape
    h, nope, rd = cfg.n_heads, cfg.qk_nope_dim, cfg.qk_rope_dim
    rank, vd = cfg.kv_lora_rank, cfg.v_head_dim
    eps = cfg.norm_eps
    x = deq("token_embd.weight")[tokens.reshape(-1)].reshape(b, t, cfg.dim)

    if cos is None:
        pos = np.arange(t)
        freqs = cfg.rope_theta ** (-np.arange(0, rd, 2) / rd)
        ang = pos[:, None] * freqs[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
    if score_scale is None:
        score_scale = 1.0 / np.sqrt(nope + rd)

    def rope(x):   # NORM interleaved pairs over the rd-wide rope slice
        # (llama.cpp ROPE_TYPE_NORM: deepseek2 GGUFs store q_pe/k_pe in
        # the interleaved order HF's modeling_deepseek effectively uses)
        c, s = cos[None, :, None, :], sin[None, :, None, :]
        e, o = x[..., 0::2], x[..., 1::2]
        return np.stack([e * c - o * s, e * s + o * c],
                        -1).reshape(x.shape)

    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        hx = _rmsn(x, r.load_array(p + "attn_norm.weight"), eps)
        if p + "attn_q_a.weight" in r.tensors:
            qa = _rmsn(hx @ deq(p + "attn_q_a.weight").T,
                       r.load_array(p + "attn_q_a_norm.weight"), eps)
            q = qa @ deq(p + "attn_q_b.weight").T
        else:
            q = hx @ deq(p + "attn_q.weight").T
        q = q.reshape(b, t, h, nope + rd)
        q_nope, q_pe = q[..., :nope], rope(q[..., nope:])

        kv = hx @ deq(p + "attn_kv_a_mqa.weight").T
        c_kv = _rmsn(kv[..., :rank],
                     r.load_array(p + "attn_kv_a_norm.weight"), eps)
        k_pe = rope(kv[..., None, rank:])[:, :, 0]         # (b, t, rd)

        kvb = deq(p + "attn_kv_b.weight").reshape(h, nope + vd, rank)
        # naive: materialize per-head K and V from the latent
        k_nope = np.einsum("btr,hdr->bthd", c_kv, kvb[:, :nope])
        v = np.einsum("btr,hdr->bthd", c_kv, kvb[:, nope:])
        k = np.concatenate(
            [k_nope, np.broadcast_to(k_pe[:, :, None, :],
                                     (b, t, h, rd))], -1)
        q_full = np.concatenate([q_nope, q_pe], -1)

        sc = np.einsum("bqhd,bkhd->bhqk", q_full, k) * score_scale
        mask = np.tril(np.ones((t, t), bool))
        sc = np.where(mask[None, None], sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, h * vd)
        x = x + att @ deq(p + "attn_output.weight").T

        hx = _rmsn(x, r.load_array(p + "ffn_norm.weight"), eps)
        hf = hx.reshape(b * t, -1)
        if p + "ffn_gate_inp.weight" in r.tensors:
            out = _numpy_ds_moe(r, p, cfg, hf)
        else:   # leading dense layer
            g = hf @ deq(p + "ffn_gate.weight").T
            u = hf @ deq(p + "ffn_up.weight").T
            out = (g / (1 + np.exp(-g)) * u) @ deq(p + "ffn_down.weight").T
        x = x + out.reshape(b, t, -1)

    x = _rmsn(x, r.load_array("output_norm.weight"), eps)
    logits = x @ deq("output.weight").T
    r.close()
    return logits


def _numpy_ds_moe(r, p, cfg, hf):
    """deepseek2 routed FFN: softmax/sigmoid scores, bias-adjusted
    selection, NO renorm (unless moe_renorm), routed scaling, + shared
    experts."""
    deq = lambda n: r.dequantize(n)
    logits = hf @ r.load_array(p + "ffn_gate_inp.weight").T
    if cfg.moe_gating == "sigmoid":
        probs = 1 / (1 + np.exp(-logits))
    else:
        pe = np.exp(logits - logits.max(-1, keepdims=True))
        probs = pe / pe.sum(-1, keepdims=True)
    sel_scores = probs
    if p + "exp_probs_b.bias" in r.tensors:
        sel_scores = probs + r.load_array(p + "exp_probs_b.bias")[None, :]
    order = np.argsort(-sel_scores, axis=-1)[:, :cfg.n_experts_used]
    w = np.zeros_like(probs)
    np.put_along_axis(w, order, np.take_along_axis(probs, order, -1), -1)
    if cfg.moe_renorm:
        w /= w.sum(-1, keepdims=True)
    w *= cfg.routed_scale
    gate = deq(p + "ffn_gate_exps.weight")
    up = deq(p + "ffn_up_exps.weight")
    down = deq(p + "ffn_down_exps.weight")
    out = np.zeros_like(hf)
    for e in range(cfg.n_experts):
        g = hf @ gate[e].T
        u = hf @ up[e].T
        out += w[:, e:e + 1] * ((g / (1 + np.exp(-g)) * u) @ down[e].T)
    if p + "ffn_gate_shexp.weight" in r.tensors:
        g = hf @ deq(p + "ffn_gate_shexp.weight").T
        u = hf @ deq(p + "ffn_up_shexp.weight").T
        out += (g / (1 + np.exp(-g)) * u) @ deq(p + "ffn_down_shexp.weight").T
    return out


def test_mla_config_roundtrip(model):
    _, cfg, params = model
    assert cfg.kv_lora_rank == 128 and cfg.q_lora_rank == 64
    assert cfg.qk_rope_dim == 32 and cfg.qk_nope_dim == 64
    assert cfg.v_head_dim == 64 and cfg.head_dim == 96
    assert cfg.kv_cache_heads == 1 and cfg.kv_cache_dim == 256
    assert cfg.leading_dense_layers == 1 and cfg.n_shared_experts == 1
    assert cfg.routed_scale == 2.0 and not cfg.moe_renorm
    l0, l1 = params["layers"][0], params["layers"][1]
    assert "wq_a" in l0 and "wkv_a" in l0 and "w_uk" in l0
    assert l0["w_uk"].shape == (4, 64, 128)
    assert l0["w_uv"].shape == (4, 64, 128)
    assert "gate" in l0 and "gate_exps" not in l0      # leading dense
    assert "gate_exps" in l1 and "gate_shexp" in l1    # routed + shared


def test_mla_absorbed_matches_naive_reference(model):
    """Prefill: the absorbed latent-cache forward must equal the naive
    per-head K/V materialization."""
    path, cfg, params = model
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    cache = init_kv_cache(cfg, batch=2, max_seq=32)
    assert cache[0]["k"].shape == (2, 1, 32, 256)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.zeros(2, jnp.int32), cache,
                        opts=MMOpts(precision="high"))
    ref = _numpy_mla_reference(path, cfg, tokens)
    got = np.asarray(logits)
    assert got.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        np.max(np.abs(got - ref)) / denom


def test_mla_prefill_equals_stepwise_decode(model):
    """The latent cache round-trips: prefilling T tokens then decoding
    must match the full-prefill logits at the last position."""
    path, cfg, params = model
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    cache = init_kv_cache(cfg, batch=1, max_seq=32)
    full, _ = forward(params, cfg, jnp.asarray(toks),
                      jnp.zeros(1, jnp.int32), cache,
                      opts=MMOpts(precision="high"))

    cache = init_kv_cache(cfg, batch=1, max_seq=32)
    _, cache = forward(params, cfg, jnp.asarray(toks[:, :5]),
                       jnp.zeros(1, jnp.int32), cache,
                       opts=MMOpts(precision="high"))
    step, _ = forward(params, cfg, jnp.asarray(toks[:, 5:]),
                      jnp.asarray([5], jnp.int32), cache,
                      opts=MMOpts(precision="high"))
    a, b = np.asarray(full)[0, -1], np.asarray(step)[0, 0]
    denom = np.abs(a).max()
    assert np.max(np.abs(a - b)) / denom < 0.02, np.max(np.abs(a - b)) / denom


def test_mla_lite_direct_q_and_sigmoid_gating(tmp_path):
    """V2-Lite's direct q projection (q_lora_rank 0) and V3's
    sigmoid+bias gating both serve and match the reference."""
    import dataclasses

    cfg = dataclasses.replace(CFG, q_lora_rank=0, moe_gating="sigmoid",
                              n_layers=2)
    path = str(tmp_path / "lite.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=9,
                            arch="deepseek2")
    lcfg, params = load_llama(path)
    assert lcfg.q_lora_rank == 0 and lcfg.moe_gating == "sigmoid"
    assert "wq" in params["layers"][0] and "wq_a" not in params["layers"][0]
    assert "gate_inp_b" in params["layers"][1]
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, lcfg.vocab_size, (1, 8)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    logits, _ = forward(params, lcfg, jnp.asarray(tokens),
                        jnp.zeros(1, jnp.int32), cache,
                        opts=MMOpts(precision="high"))
    ref = _numpy_mla_reference(path, lcfg, tokens)
    got = np.asarray(logits)
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        np.max(np.abs(got - ref)) / denom


def test_mla_deepseek_yarn_mscale(tmp_path):
    """DeepSeek's yarn convention (rope.scaling.yarn_log_multiplier set):
    cos/sin carry NO magnitude factor and the score scale gains mscale^2,
    mscale = 1 + yarn_log_mul * ln(factor) — llama.cpp build_deepseek2's
    attn_factor_scaled / kq_scale pair. Pinned against a numpy forward
    with yarn angles implemented from the NTK-by-parts formula."""
    import dataclasses
    import math

    factor, log_mul = 4.0, 0.0707
    cfg = dataclasses.replace(
        CFG, n_layers=1, n_experts=0, n_experts_used=0,
        leading_dense_layers=0, n_shared_experts=0, routed_scale=1.0,
        rope_scaling_kind="yarn", rope_scale=factor, rope_orig_ctx=16,
        rope_yarn_log_mul=log_mul)
    path = str(tmp_path / "yarn.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=11,
                            arch="deepseek2")
    lcfg, params = load_llama(path)
    assert lcfg.rope_yarn_log_mul == pytest.approx(log_mul)
    assert lcfg.rope_scaling_kind == "yarn"

    rng = np.random.default_rng(4)
    tokens = rng.integers(0, lcfg.vocab_size, (1, 8)).astype(np.int32)
    cache = init_kv_cache(lcfg, batch=1, max_seq=32)
    logits, _ = forward(params, lcfg, jnp.asarray(tokens),
                        jnp.zeros(1, jnp.int32), cache,
                        opts=MMOpts(precision="high"))

    # numpy reference: yarn angles (NTK-by-parts ramp), no cos/sin
    # magnitude, mscale^2 on the scores
    rd, theta, orig = lcfg.qk_rope_dim, lcfg.rope_theta, lcfg.rope_orig_ctx
    freqs = theta ** (-np.arange(0, rd, 2) / rd)
    posn = np.arange(tokens.shape[1])
    extrap = posn[:, None] * freqs[None, :]
    interp = extrap / factor
    corr = lambda n_rot: (rd * math.log(orig / (n_rot * 2 * math.pi))
                          / (2 * math.log(theta)))
    low = max(0.0, math.floor(corr(32.0)))
    high = min(rd - 1.0, math.ceil(corr(1.0)))
    i_half = np.arange(rd // 2)
    ramp = 1.0 - np.clip((i_half - low) / max(1e-3, high - low), 0.0, 1.0)
    ang = interp * (1.0 - ramp) + extrap * ramp
    mscale = 1.0 + log_mul * math.log(factor)

    ref = _numpy_mla_reference(
        path, lcfg, tokens, cos=np.cos(ang), sin=np.sin(ang),
        score_scale=mscale * mscale / math.sqrt(lcfg.head_dim))
    got = np.asarray(logits)
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 0.03, \
        np.max(np.abs(got - ref)) / denom


def test_mla_engine_serving(model):
    """End to end through the LLM engine: greedy decode is reproducible
    and the decode path (t=1 windowed insert) agrees with prefill."""
    from gguf_tpu.engine import LLM, SamplerConfig

    path, cfg, _ = model
    llm = LLM(path, max_batch=2, max_seq=32)
    g = SamplerConfig(temperature=0.0)
    [a] = llm.generate([[1, 5, 9]], max_new_tokens=8, sampler=g,
                       stop_at_eos=False)
    [b] = llm.generate([[1, 5, 9]], max_new_tokens=8, sampler=g,
                       stop_at_eos=False)
    assert a.token_ids == b.token_ids and len(a.token_ids) == 8


@pytest.mark.parametrize("tp", [2])   # tp=4 would need dim % 1024 == 0
def test_mla_tp_sharding_matches_single_device(tmp_path_factory, tp):
    """Tensor-parallel MLA on the virtual mesh: heads shard over tp, the
    latent cache replicates, and logits must match single-device serving
    (k == E keeps MoE routing smooth; see test_moe's module note)."""
    import dataclasses

    from gguf_tpu.parallel import (
        init_sharded_cache, make_mesh, make_tp_forward, shard_llama,
    )

    cfg = dataclasses.replace(
        CFG, dim=512, ffn_dim=512, n_experts_used=4, n_layers=2)
    path = str(tmp_path_factory.mktemp("mlatp") / "ds2tp.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=6,
                            arch="deepseek2")
    cfg, params = load_llama(path)
    mesh = make_mesh(tp=tp)
    sharded, cfg_pad = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_pad, mesh, MMOpts(precision="high"))

    rng = np.random.default_rng(3)
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
