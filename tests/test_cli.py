"""CLI tools (gguf_tpu.tools.cli): inspect / requantize / generate / ppl."""

import json

import numpy as np
import pytest

from gguf_tpu.models import LlamaConfig, load_llama, write_random_llama_gguf
from gguf_tpu.tools.cli import main

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=1, n_heads=4,
                  n_kv_heads=2, ffn_dim=512, max_seq_len=64)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "tiny.gguf")
    write_random_llama_gguf(path, CFG, seed=5)
    return path


def test_inspect(model, capsys):
    main(["inspect", model])
    out = capsys.readouterr().out
    assert "token_embd.weight" in out and "Q4_K" in out and "tensors," in out


def test_requantize_roundtrip(model, tmp_path):
    out_path = str(tmp_path / "re.gguf")
    main(["requantize", model, out_path, "--fmt", "q8_0"])
    cfg, params = load_llama(out_path)
    assert cfg.dim == CFG.dim
    assert params["layers"][0]["wq"].fmt == "q8_0"
    # requantized model still runs
    import jax.numpy as jnp

    from gguf_tpu.models import forward, init_kv_cache
    logits, _ = forward(params, cfg, jnp.zeros((1, 2), jnp.int32),
                        jnp.zeros(1, jnp.int32), init_kv_cache(cfg, 1, 8))
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize("fmt", ["q2_k", "q3_k", "q4_0", "q4_1", "q5_0", "q5_1",
                                 "iq4_nl", "iq4_xs"])
def test_requantize_low_bit_serves(model, tmp_path, fmt):
    """The sub-4-bit K-quants and legacy 32-block formats requantize and
    serve end to end (formats the upstream reference cannot produce at
    all)."""
    out_path = str(tmp_path / f"re_{fmt}.gguf")
    main(["requantize", model, out_path, "--fmt", fmt])
    cfg, params = load_llama(out_path)
    assert params["layers"][0]["wq"].fmt == fmt
    import jax.numpy as jnp

    from gguf_tpu.models import forward, init_kv_cache
    logits, _ = forward(params, cfg, jnp.zeros((1, 2), jnp.int32),
                        jnp.zeros(1, jnp.int32), init_kv_cache(cfg, 1, 8))
    assert bool(jnp.isfinite(logits).all())


def test_generate_cli(model, capsys):
    main(["generate", model, "--ids", "1 5 9", "-n", "4",
          "--temperature", "0.0"])
    out = capsys.readouterr().out.strip()
    assert out  # token ids or text line


def test_ppl_cli(model, tmp_path, capsys):
    toks = tmp_path / "ids.tok"
    toks.write_text(" ".join(str(i % CFG.vocab_size) for i in range(100)))
    main(["ppl", model, str(toks), "--window", "32"])
    res = json.loads(capsys.readouterr().out)
    assert np.isfinite(res["perplexity"]) and res["tokens"] == 100
