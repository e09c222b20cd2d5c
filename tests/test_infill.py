"""Fill-in-middle (/infill) serving: FIM token discovery from GGUF
metadata (explicit ids and well-known spellings), prompt assembly in PSM /
SPM order, terminator handling, and the llama.cpp-shaped HTTP endpoint.
Reference lineage: llama.cpp server /infill + llama_vocab special_fim_*.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gguf_tpu.engine import LLM, SamplerConfig
from gguf_tpu.engine.tokenizer import fim_tokens_from_metadata
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

CFG = LlamaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=256, max_seq_len=64)


def _fim_vocab():
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens += ["<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>",
               "<|endoftext|>"]
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:CFG.vocab_size]
    return {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }


def test_fim_tokens_from_names():
    md = _fim_vocab()
    fim = fim_tokens_from_metadata(md)
    assert fim["pre"] == 259 and fim["suf"] == 260 and fim["mid"] == 261
    assert fim["eot"] == 262
    assert "rep" not in fim and "pad" not in fim


def test_fim_explicit_ids_win_over_names():
    md = _fim_vocab()
    md["tokenizer.ggml.fim_pre_token_id"] = 7
    md["tokenizer.ggml.suffix_token_id"] = 8      # legacy alias
    fim = fim_tokens_from_metadata(md)
    assert fim["pre"] == 7 and fim["suf"] == 8 and fim["mid"] == 261


def test_fim_absent():
    assert fim_tokens_from_metadata({
        "tokenizer.ggml.tokens": ["<s>", "</s>", "x"]}) == {}


@pytest.fixture(scope="module")
def fim_llm(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fim") / "fim.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=4,
                            extra_metadata=_fim_vocab())
    # prefix_cache off: the determinism asserts below compare back-to-back
    # identical calls, and a cache hit changes the last-token prefill
    # bucketing (same rows, different padded matmul shapes) — with this
    # tiny random model that can flip a near-tie greedy choice
    return LLM(path, max_batch=2, max_seq=64, prefix_cache=False)


def test_build_infill_tokens_psm_and_spm(fim_llm):
    fim = fim_llm.fim
    tok = fim_llm.tokenizer
    pre = tok.encode("ab", add_bos=False)
    suf = tok.encode("cd", add_bos=False)
    ids = fim_llm.build_infill_tokens("ab", "cd")
    assert ids == [tok.bos_id, fim["pre"], *pre, fim["suf"], *suf,
                   fim["mid"]]
    ids = fim_llm.build_infill_tokens("ab", "cd", spm=True)
    assert ids == [tok.bos_id, fim["suf"], *suf, fim["pre"], *pre,
                   fim["mid"]]


def test_build_infill_extra_without_rep_tokens_prepends(fim_llm):
    """No FIM_REP/FIM_SEP in this vocab: repo chunks prepend as text."""
    with_extra = fim_llm.build_infill_tokens(
        "ab", "cd", extra=[{"text": "xy", "filename": "f.py"}])
    plain = fim_llm.build_infill_tokens("xyab", "cd")
    assert with_extra == plain


def test_infill_generates_and_stops(fim_llm):
    res = fim_llm.infill("hello ", " world", max_new_tokens=8,
                         sampler=SamplerConfig(temperature=0.0))
    assert 0 <= len(res.token_ids) <= 8
    fim = fim_llm.fim
    assert all(t not in (fim["eot"], fim_llm.tokenizer.eos_id)
               for t in res.token_ids)
    # deterministic across calls
    res2 = fim_llm.infill("hello ", " world", max_new_tokens=8,
                          sampler=SamplerConfig(temperature=0.0))
    assert res.token_ids == res2.token_ids


def test_generate_stop_ids_trims_terminator(fim_llm):
    """stop_ids terminate and are trimmed exactly like EOS: replay a
    greedy run, then re-run with its first emitted token as a stop id."""
    [base] = fim_llm.generate([[1, 5, 9]], max_new_tokens=6,
                              sampler=SamplerConfig(temperature=0.0),
                              stop_at_eos=False)
    assert len(base.token_ids) >= 2
    first = base.token_ids[0]
    [res] = fim_llm.generate([[1, 5, 9]], max_new_tokens=6,
                             sampler=SamplerConfig(temperature=0.0),
                             stop_at_eos=False, stop_ids=[first])
    assert res.finished and res.token_ids == []


@pytest.fixture(scope="module")
def fim_server(fim_llm):
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    worker = EngineWorker(fim_llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, route, payload):
    req = urllib.request.Request(
        url + route, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_infill_endpoint(fim_server):
    out = _post(fim_server, "/infill",
                {"input_prefix": "hello ", "input_suffix": " world",
                 "n_predict": 6, "temperature": 0.0})
    assert "content" in out and out["tokens_predicted"] <= 6
    assert out["tokens_evaluated"] > 0
    assert isinstance(out["stop"], bool)


def test_infill_endpoint_no_fim_vocab(tmp_path):
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    path = str(tmp_path / "plain.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=5)
    worker = EngineWorker(LLM(path, max_batch=1, max_seq=32))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://127.0.0.1:{port}", "/infill",
                  {"input_prefix": "a", "input_suffix": "b"})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
