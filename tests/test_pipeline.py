"""Pipeline parallelism (parallel/pp.py): the staggered pipelined decode on
the virtual mesh must reproduce single-device greedy decode exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import (
    LlamaConfig, MMOpts, forward, init_kv_cache, load_llama,
    write_random_llama_gguf,
)
from gguf_tpu.parallel.pp import make_pp_mesh, pp_generate, shard_pp

# 4 layers so pp=2 and pp=4 both divide; dim 512 covers the tp=2 case
CFG = LlamaConfig(
    vocab_size=128, dim=512, n_layers=4, n_heads=4, n_kv_heads=2,
    ffn_dim=512, max_seq_len=64,
)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "tiny.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=7)
    return load_llama(path)


def _greedy_reference(cfg, params, prompts, n_new):
    """Single-device greedy decode, token by token (teacher-forced prompt)."""
    b = len(prompts)
    cache = init_kv_cache(cfg, batch=b, max_seq=32)
    opts = MMOpts(precision="high")
    toks = [list(p) for p in prompts]
    out = [[] for _ in range(b)]
    maxlen = max(len(p) for p in prompts) + n_new
    pos = np.zeros(b, np.int64)
    cur = np.asarray([p[0] for p in prompts], np.int64)
    for step in range(maxlen - 1):
        logits, cache = forward(
            params, cfg, jnp.asarray(cur[:, None], jnp.int32),
            jnp.asarray(pos, jnp.int32), cache, opts)
        nxt = np.asarray(jnp.argmax(logits[:, 0, :], -1))
        for i in range(b):
            if pos[i] + 1 < len(toks[i]):      # still in prompt
                cur[i] = toks[i][pos[i] + 1]
            elif len(out[i]) < n_new:
                out[i].append(int(nxt[i]))
                cur[i] = nxt[i]
            pos[i] += 1
    return out


@pytest.mark.parametrize("pp,tp", [(2, 1), (4, 1), (2, 2)])
def test_pp_decode_matches_single_device(model, pp, tp):
    cfg, params = model
    mesh = make_pp_mesh(pp=pp, tp=tp)
    sharded, cfg_pp = shard_pp(params, cfg, mesh)

    rng = np.random.default_rng(0)
    b = 2 * pp
    prompts = [list(rng.integers(0, cfg.vocab_size, 3)) for _ in range(b)]
    got = pp_generate(sharded, cfg_pp, mesh, prompts, max_new_tokens=5,
                      max_seq=32, opts=MMOpts(precision="high"))
    ref = _greedy_reference(cfg, params, prompts, 5)
    assert got == ref, (got, ref)


def test_pp_stage_stacking_shapes(model):
    from gguf_tpu.parallel.pp import stack_stages

    cfg, params = model
    stacked = stack_stages(params, cfg, pp=2)
    assert len(stacked["layers"]) == 2          # 4 layers -> 2 per stage
    # every leaf gained a leading pp axis
    lf = stacked["layers"][0]["wq"].d_bits
    orig = params["layers"][0]["wq"].d_bits
    assert lf.shape == (2, *orig.shape)


def test_pp_gptneox_parallel_residual_matches_single_device(
        tmp_path_factory):
    """gptneox default topology (parallel residual WITH a separate mlp
    pre-norm) under PP must match single-device decode — pins the fix
    where pp.py fed the FFN the attn-norm output instead of ffn_norm(x)."""
    cfg = LlamaConfig(
        vocab_size=128, dim=512, n_layers=4, n_heads=4, n_kv_heads=4,
        ffn_dim=512, max_seq_len=64, norm_type="layer", rope_neox=True,
        act_fn="gelu_tanh", parallel_residual=True,
    )
    path = str(tmp_path_factory.mktemp("ppneox") / "neox.gguf")
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q8_0, seed=11,
                            arch="gptneox")
    lcfg, params = load_llama(path)
    assert lcfg.parallel_residual and "ffn_norm" in params["layers"][0]

    mesh = make_pp_mesh(pp=2, tp=1)
    sharded, cfg_pp = shard_pp(params, lcfg, mesh)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, cfg.vocab_size, 3)) for _ in range(4)]
    got = pp_generate(sharded, cfg_pp, mesh, prompts, max_new_tokens=5,
                      max_seq=32, opts=MMOpts(precision="high"))
    ref = _greedy_reference(lcfg, params, prompts, 5)
    assert got == ref, (got, ref)
