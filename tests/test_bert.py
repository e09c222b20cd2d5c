"""BERT-family encoders (llama.cpp arch bert / nomic-bert): WordPiece
tokenization, bidirectional forward vs a numpy reference, masked
pooling, and the embeddings serving surface."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from gguf_tpu.engine import LLM
from gguf_tpu.engine.wordpiece import WordPieceTokenizer
from gguf_tpu.gguf import GGUFReader
from gguf_tpu.models import LlamaConfig, load_llama
from gguf_tpu.models.bert import bert_forward, write_random_bert_gguf

CFG = LlamaConfig(vocab_size=64, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=4, ffn_dim=128, max_seq_len=32,
                  causal=False, pooling="mean", norm_eps=1e-5)


def _wp_vocab():
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "hello", "world", "un", "##aff", "##able", "##ed",
              "want", ",", "!", "runn", "##ing"]
    tokens += [f"[unused{i}]" for i in range(CFG.vocab_size - len(tokens))]
    return tokens[:CFG.vocab_size]


def _wp():
    return WordPieceTokenizer(_wp_vocab(), cls_id=2, sep_id=3, unk_id=1,
                              pad_id=0)


def test_wordpiece_greedy_longest_match():
    tok = _wp()
    assert tok.encode("unaffable", add_bos=False) == [7, 8, 9]
    assert tok.encode("hello world", add_bos=False) == [5, 6]
    assert tok.encode("running", add_bos=False) == [14, 15]


def test_wordpiece_cls_sep_and_unknown():
    tok = _wp()
    ids = tok.encode("hello zzz world")
    assert ids[0] == 2 and ids[-1] == 3          # [CLS] ... [SEP]
    assert ids[1:-1] == [5, 1, 6]                # zzz -> [UNK]


def test_wordpiece_punct_lowercase_accents():
    tok = _wp()
    # punctuation splits into its own word; case and accents fold
    assert tok.encode("Hello, wörld!", add_bos=False) == [5, 12, 6, 13]


def test_wordpiece_decode():
    tok = _wp()
    assert tok.decode([2, 7, 8, 9, 6, 3]) == "unaffable world"


def test_wordpiece_from_metadata():
    md = {"tokenizer.ggml.model": "bert",
          "tokenizer.ggml.tokens": _wp_vocab(),
          "tokenizer.ggml.cls_token_id": 2,
          "tokenizer.ggml.seperator_token_id": 3,
          "tokenizer.ggml.unknown_token_id": 1,
          "tokenizer.ggml.padding_token_id": 0}
    from gguf_tpu.engine.bpe_tokenizer import tokenizer_from_metadata

    tok = tokenizer_from_metadata(md)
    assert isinstance(tok, WordPieceTokenizer)
    assert tok.cls_id == 2 and tok.sep_id == 3


def _bert_md():
    return {"tokenizer.ggml.model": "bert",
            "tokenizer.ggml.tokens": _wp_vocab(),
            "tokenizer.ggml.cls_token_id": 2,
            "tokenizer.ggml.seperator_token_id": 3,
            "tokenizer.ggml.unknown_token_id": 1,
            "tokenizer.ggml.padding_token_id": 0}


@pytest.fixture(scope="module", params=["bert", "nomic-bert"])
def model(request, tmp_path_factory):
    arch = request.param
    path = str(tmp_path_factory.mktemp("bert") / f"{arch}.gguf")
    write_random_bert_gguf(path, CFG, seed=43, arch=arch,
                           extra_metadata=_bert_md())
    cfg, params = load_llama(path)
    return arch, path, cfg, params


def _numpy_bert(path, cfg, tokens, lengths):
    r = GGUFReader(path)
    la = lambda n: r.load_array(n)
    has = lambda n: n in r.tensors
    b, t = tokens.shape
    eps = cfg.norm_eps

    def ln(v, w, bi):
        m = v.mean(-1, keepdims=True)
        va = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) / np.sqrt(va + eps) * w + bi

    x = la("token_embd.weight")[tokens.reshape(-1)].reshape(b, t, cfg.dim)
    x = x + la("token_types.weight")[0][None, None, :]
    if has("position_embd.weight"):
        x = x + la("position_embd.weight")[None, :t, :]
    x = ln(x, la("token_embd_norm.weight"), la("token_embd_norm.bias"))

    h, hd = cfg.n_heads, cfg.dim // cfg.n_heads
    valid = np.arange(t)[None, :] < lengths[:, None]
    if not has("position_embd.weight"):   # nomic: NEOX rope
        freqs = cfg.rope_theta ** (-np.arange(0, hd, 2) / hd)
        ang = np.arange(t)[:, None] * freqs[None, :]
        c, s = np.cos(ang)[None, :, None, :], np.sin(ang)[None, :, None, :]

        def rope(v):
            e, o = v[..., :hd // 2], v[..., hd // 2:]
            return np.concatenate([e * c - o * s, e * s + o * c], -1)

    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        q = (x @ la(p + "attn_q.weight").T + la(p + "attn_q.bias"))
        k = (x @ la(p + "attn_k.weight").T + la(p + "attn_k.bias"))
        v = (x @ la(p + "attn_v.weight").T + la(p + "attn_v.bias"))
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)
        if not has("position_embd.weight"):
            q, k = rope(q), rope(k)
        sc = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        sc = np.where(valid[:, None, None, :], sc, -np.inf)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, -1)
        att = att @ la(p + "attn_output.weight").T + la(p + "attn_output.bias")
        x = ln(x + att, la(p + "attn_output_norm.weight"),
               la(p + "attn_output_norm.bias"))
        u = x @ la(p + "ffn_up.weight").T + la(p + "ffn_up.bias")
        if has(p + "ffn_gate.weight"):
            g = x @ la(p + "ffn_gate.weight").T
            act = g / (1 + np.exp(-g)) * u
        else:
            import math

            act = 0.5 * u * (1 + np.vectorize(math.erf)(u / np.sqrt(2)))
        ffn = act @ la(p + "ffn_down.weight").T + la(p + "ffn_down.bias")
        x = ln(x + ffn, la(p + "layer_output_norm.weight"),
               la(p + "layer_output_norm.bias"))
    r.close()
    return x


def test_bert_forward_matches_numpy(model):
    arch, path, cfg, params = model
    assert not cfg.causal and cfg.pooling == "mean"
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10)).astype(np.int32)
    lengths = np.array([10, 7])
    got = np.asarray(bert_forward(params, cfg, jnp.asarray(tokens),
                                  jnp.asarray(lengths, jnp.int32)))
    ref = _numpy_bert(path, cfg, tokens, lengths)
    denom = np.abs(ref).max()
    # compare only valid positions (pad rows differ arbitrarily)
    for i, ln_ in enumerate(lengths):
        d = np.max(np.abs(got[i, :ln_] - ref[i, :ln_])) / denom
        assert d < 1e-3, (arch, i, d)


def test_bert_padding_invariance(model):
    """A prompt's embedding must not change with batch padding — the
    pad mask keeps pad keys out of every softmax."""
    arch, path, cfg, params = model
    llm = LLM(path, max_batch=4)
    a = llm.embed(["hello world"])
    b = llm.embed(["hello world", "unaffable hello world running"])
    np.testing.assert_allclose(a[0], b[0], atol=2e-5)
    assert np.abs(np.linalg.norm(b, axis=1) - 1).max() < 1e-5


def test_bert_engine_guards(model):
    arch, path, cfg, params = model
    llm = LLM(path, max_batch=2)
    with pytest.raises(AssertionError, match="encoder-only"):
        llm.generate([[1, 2, 3]], max_new_tokens=2)
    with pytest.raises(AssertionError, match="encoder-only"):
        llm.start_session()


def test_bert_cls_pooling(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(CFG, pooling="cls")
    path = str(tmp_path / "cls.gguf")
    write_random_bert_gguf(path, cfg, seed=44, extra_metadata=_bert_md())
    llm = LLM(path, max_batch=2)
    assert llm.cfg.pooling == "cls"
    out = llm.embed(["hello world"], normalize=False)
    ref = _numpy_bert(path, llm.cfg,
                      np.asarray([llm.tokenizer.encode("hello world")],
                                 np.int32),
                      np.array([4]))
    np.testing.assert_allclose(out[0], ref[0, 0], atol=2e-4 *
                               np.abs(ref).max())


def test_bert_embeddings_endpoint(model):
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    arch, path, cfg, params = model
    worker = EngineWorker(LLM(path, max_batch=2))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embeddings",
            data=json.dumps({"input": ["hello world", "running"]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert len(out["data"]) == 2
        assert len(out["data"][0]["embedding"]) == CFG.dim
    finally:
        httpd.shutdown()


def test_rerank_scores_and_endpoint(tmp_path):
    """Reranker (pooling rank + cls head): pair encoding, numpy-pinned
    scores, and the /v1/rerank endpoint with score-sorted results."""
    import dataclasses

    from gguf_tpu.models.bert import rank_scores  # noqa: F401

    cfg = dataclasses.replace(CFG, pooling="rank")
    path = str(tmp_path / "rank.gguf")
    write_random_bert_gguf(path, cfg, seed=45, extra_metadata=_bert_md())
    llm = LLM(path, max_batch=2)
    assert llm.cfg.pooling == "rank" and "cls" in llm.params

    docs = ["hello world", "unaffable running world hello"]
    scores = llm.rerank("hello", docs)
    assert scores.shape == (2,)

    # numpy pin: [CLS] q [SEP] d [SEP] through the reference encoder,
    # then the cls head on the CLS row
    r = GGUFReader(path)
    cls_w, cls_b = r.load_array("cls.weight"), r.load_array("cls.bias")
    r.close()
    tok = llm.tokenizer
    for i, doc in enumerate(docs):
        ids = tok.encode("hello") + tok.encode(doc, add_bos=False) + \
            [tok.sep_id]
        ref_h = _numpy_bert(path, llm.cfg,
                            np.asarray([ids], np.int32),
                            np.array([len(ids)]))
        ref = (ref_h[0, 0] @ cls_w.T + cls_b)[0]
        assert abs(scores[i] - ref) < 1e-3 * max(1.0, abs(ref)), (i, scores[i], ref)

    # endpoint
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/rerank",
            data=json.dumps({"query": "hello",
                             "documents": docs, "top_n": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert len(out["results"]) == 1
        best = int(np.argmax(scores))
        assert out["results"][0]["index"] == best
        assert out["results"][0]["relevance_score"] == \
            pytest.approx(float(scores[best]), abs=1e-5)
    finally:
        httpd.shutdown()


def test_rank_checkpoint_rejects_embed(tmp_path):
    """A reranker's cls head yields scores, not embeddings — embed()
    must refuse instead of silently mean-pooling (llama.cpp rejects
    embeddings on RANK pooling too)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, pooling="rank")
    path = str(tmp_path / "rank2.gguf")
    write_random_bert_gguf(path, cfg, seed=46, extra_metadata=_bert_md())
    llm = LLM(path, max_batch=1)
    with pytest.raises(ValueError, match="reranker"):
        llm.embed(["hello"])
