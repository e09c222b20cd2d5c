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


def test_merge_lora_applies_delta(model, tmp_path):
    """merge-lora bakes B@A*(alpha/r) into the named tensors: the merged
    weight must equal base + delta within one quantization step, untouched
    tensors must be byte-identical, and the merged model must serve."""
    from gguf_tpu.gguf import GGUFReader
    from gguf_tpu.models.lora import merge_lora, write_lora_adapter

    rng = np.random.default_rng(7)
    with GGUFReader(model) as r:
        w0 = r.dequantize("blk.0.attn_q.weight")
        other0 = np.asarray(r.tensor_bytes("blk.0.attn_k.weight")).copy()
    m, k = w0.shape
    rank, alpha = 4, 8.0
    a = (rng.standard_normal((rank, k)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((m, rank)) * 0.05).astype(np.float32)
    lora_path = str(tmp_path / "adapter.gguf")
    write_lora_adapter(lora_path, alpha, {"blk.0.attn_q.weight": (a, b)})

    out_path = str(tmp_path / "merged.gguf")
    main(["merge-lora", model, lora_path, out_path])
    with GGUFReader(out_path) as r:
        w1 = r.dequantize("blk.0.attn_q.weight")
        other1 = np.asarray(r.tensor_bytes("blk.0.attn_k.weight"))
    delta = (alpha / rank) * (b @ a)
    # requantization noise bounds the comparison: the patched weight is one
    # quantize() away from the exact float sum
    err = np.abs(w1 - (w0 + delta))
    qstep = np.abs(w0 + delta).max() / 7.0   # ~q4 worst-case step
    assert err.max() < qstep, (err.max(), qstep)
    # the delta itself is much larger than the noise (it really landed)
    assert np.abs(delta).max() > 4 * err.max()
    np.testing.assert_array_equal(other0, other1)

    cfg2, params2 = load_llama(out_path)
    assert params2["layers"][0]["wq"].fmt == "q4_k"


def test_merge_lora_transposed_factors(model, tmp_path):
    """Factor orientation is reconciled: (K, r) / (r, M) storage merges to
    the same weights as the canonical (r, K) / (M, r)."""
    from gguf_tpu.gguf import GGUFReader
    from gguf_tpu.models.lora import merge_lora, write_lora_adapter

    rng = np.random.default_rng(8)
    with GGUFReader(model) as r:
        m, k = r.dequantize("blk.0.ffn_gate.weight").shape
    rank = 2
    a = (rng.standard_normal((rank, k)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((m, rank)) * 0.05).astype(np.float32)
    p1, p2 = str(tmp_path / "l1.gguf"), str(tmp_path / "l2.gguf")
    write_lora_adapter(p1, 4.0, {"blk.0.ffn_gate.weight": (a, b)})
    write_lora_adapter(p2, 4.0, {"blk.0.ffn_gate.weight": (a.T, b.T)})
    o1, o2 = str(tmp_path / "m1.gguf"), str(tmp_path / "m2.gguf")
    merge_lora(model, p1, o1)
    merge_lora(model, p2, o2)
    with GGUFReader(o1) as r1, GGUFReader(o2) as r2:
        np.testing.assert_array_equal(
            np.asarray(r1.tensor_bytes("blk.0.ffn_gate.weight")),
            np.asarray(r2.tensor_bytes("blk.0.ffn_gate.weight")))


def test_merge_lora_rejects_bad_adapter(model, tmp_path):
    from gguf_tpu.models.lora import merge_lora, write_lora_adapter

    bad = str(tmp_path / "bad.gguf")
    write_lora_adapter(bad, 4.0, {"blk.9.no_such.weight":
                                  (np.zeros((2, 8), np.float32),
                                   np.zeros((8, 2), np.float32))})
    with pytest.raises(ValueError, match="no base counterpart"):
        merge_lora(model, bad, str(tmp_path / "x.gguf"))


def test_tokenize_cli(tmp_path, capsys):
    """cli tokenize round-trips text through the embedded tokenizer."""
    from gguf_tpu.models import LlamaConfig

    path = str(tmp_path / "tok.gguf")
    big = LlamaConfig(vocab_size=512, dim=256, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=512, max_seq_len=64)
    toks = (["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
            + ["▁", "▁hi", "h", "i"])
    toks = (toks + [f"<p{i}>" for i in range(512)])[:512]
    scores = np.zeros(512, np.float32)
    scores[259:263] = [1.0, 3.0, 1.0, 1.0]
    write_random_llama_gguf(path, big, seed=5, extra_metadata={
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    })
    main(["tokenize", path, "hi", "--decode"])
    out = capsys.readouterr().out
    ids = [int(x) for x in out.splitlines()[0].split()]
    assert ids, out
    from gguf_tpu.engine import tokenizer_from_metadata
    from gguf_tpu.gguf import GGUFReader
    with GGUFReader(path) as r:
        tok = tokenizer_from_metadata(r.metadata)
    assert tok.decode(ids) == "hi"
    assert "->" in out


def test_llm_runtime_lora(model, tmp_path):
    """LLM(lora=...) bakes the adapter in at load (llama.cpp --lora):
    serving output matches an offline merge, temp files are cleaned up,
    and the base model is untouched."""
    import glob
    import tempfile

    from gguf_tpu.engine import LLM, SamplerConfig
    from gguf_tpu.gguf import GGUFReader
    from gguf_tpu.models.lora import merge_lora, write_lora_adapter

    rng = np.random.default_rng(8)
    with GGUFReader(model) as r:
        m, k = r.dequantize("blk.0.attn_q.weight").shape
    rank, alpha = 4, 8.0
    a = (rng.standard_normal((rank, k)) * 0.2).astype(np.float32)
    b = (rng.standard_normal((m, rank)) * 0.2).astype(np.float32)
    lora_path = str(tmp_path / "adapter.gguf")
    write_lora_adapter(lora_path, alpha, {"blk.0.attn_q.weight": (a, b)})

    g = SamplerConfig(temperature=0.0)
    llm = LLM(model, max_batch=1, max_seq=32, lora=lora_path)
    [tuned] = llm.generate([[1, 5, 9]], max_new_tokens=5, sampler=g,
                           stop_at_eos=False)
    assert not glob.glob(
        tempfile.gettempdir() + "/gguf_tpu_lora_*.gguf")   # cleaned up

    merged_path = str(tmp_path / "merged.gguf")
    merge_lora(model, lora_path, merged_path)
    offline = LLM(merged_path, max_batch=1, max_seq=32)
    [ref] = offline.generate([[1, 5, 9]], max_new_tokens=5, sampler=g,
                             stop_at_eos=False)
    assert tuned.token_ids == ref.token_ids

    base = LLM(model, max_batch=1, max_seq=32)
    [plain] = base.generate([[1, 5, 9]], max_new_tokens=5, sampler=g,
                            stop_at_eos=False)
    assert plain.token_ids != tuned.token_ids   # the adapter changed it
