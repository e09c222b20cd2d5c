"""HTTP serving frontend: /v1/completions over the batching engine."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from gguf_tpu.engine import LLM
from gguf_tpu.engine.server import EngineWorker, make_handler
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

CFG = LlamaConfig(vocab_size=64, dim=256, n_layers=1, n_heads=4,
                  n_kv_heads=2, ffn_dim=512, max_seq_len=64)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "tiny.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=3)
    llm = LLM(path, max_batch=2, max_seq=32)
    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/v1/completions", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["model"]["dim"] == CFG.dim


def test_completion_with_token_ids(server):
    res = _post(server, {"prompt": [1, 5, 9], "max_tokens": 4,
                         "temperature": 0.0})
    c = res["choices"][0]
    assert len(c["token_ids"]) == 4
    assert res["usage"]["prompt_tokens"] == 3


def test_concurrent_requests_batch(server):
    """Two concurrent clients share the slot pool (continuous batching)."""
    out = [None, None]

    def call(i):
        out[i] = _post(server, {"prompt": [2 + i, 7], "max_tokens": 3,
                                "temperature": 0.0})

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert all(o and len(o["choices"][0]["token_ids"]) == 3 for o in out)


def test_bad_request(server):
    req = urllib.request.Request(
        server + "/v1/completions", data=b'{"max_tokens": 4}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_streaming_completion(server):
    """stream=true returns SSE chunks whose token ids concatenate to the
    non-streaming result."""
    ref = _post(server, {"prompt": [1, 5, 9], "max_tokens": 6,
                         "temperature": 0.0, "seed": 1})
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": [1, 5, 9], "max_tokens": 6,
                         "temperature": 0.0, "seed": 1,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    ids, finish = [], None
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        saw_done = False
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                saw_done = True
                break
            chunk = json.loads(body)["choices"][0]
            ids.extend(chunk["token_ids"])
            if chunk["finish_reason"] is not None:
                finish = chunk["finish_reason"]
    assert saw_done
    assert ids == ref["choices"][0]["token_ids"]
    assert finish == "stop" or len(ids) == 6


def _toy_spm_metadata():
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:CFG.vocab_size]
    return {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }


def test_chat_completions_with_template(tmp_path):
    """/v1/chat/completions renders the GGUF's jinja chat template and
    returns an assistant message."""
    tpl = ("{{ bos_token }}{% for m in messages %}[{{ m.role }}]: "
           "{{ m.content }}\n{% endfor %}"
           "{% if add_generation_prompt %}[assistant]: {% endif %}")
    path = str(tmp_path / "chat.gguf")
    md = _toy_spm_metadata()
    md["tokenizer.chat_template"] = tpl
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=3,
                            extra_metadata=md)
    llm = LLM(path, max_batch=2, max_seq=64)
    rendered = llm.apply_chat_template(
        [{"role": "user", "content": "hi"}])
    assert rendered == "<s>[user]: hi\n[assistant]: "

    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "hi"}],
                             "max_tokens": 4, "temperature": 0.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert len(body["choices"][0]["token_ids"]) >= 1
    finally:
        httpd.shutdown()


def test_completion_logprobs(server):
    res = _post(server, {"prompt": [1, 5, 9], "max_tokens": 3,
                         "temperature": 0.0, "logprobs": 2})
    c = res["choices"][0]
    assert len(c["logprobs"]) == len(c["token_ids"])
    for tok, entry in zip(c["token_ids"], c["logprobs"]):
        assert entry["top"][0][0] == tok          # greedy picks top-1
        assert entry["logprob"] <= 0.0


@pytest.mark.slow
def test_chat_session_reuses_cache(tmp_path):
    """'session' chat requests prefill only the rendered-template suffix;
    turn 2's prompt_tokens must be far smaller than the full conversation,
    and the replies must still match the stateless endpoint."""
    tpl = ("{% for m in messages %}[{{ m.role }}]: {{ m.content }}\n"
           "{% endfor %}{% if add_generation_prompt %}[assistant]: {% endif %}")
    path = str(tmp_path / "sess.gguf")
    md = _toy_spm_metadata()
    md["tokenizer.chat_template"] = tpl
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=3,
                            extra_metadata=md)
    llm = LLM(path, max_batch=2, max_seq=256)
    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/v1/chat/completions"

    def chat(messages, session=None):
        body = {"messages": messages, "max_tokens": 4, "temperature": 0.0}
        if session:
            body["session"] = session
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    try:
        m1 = [{"role": "user", "content": "hello"}]
        r1 = chat(m1, session="c1")
        reply1 = r1["choices"][0]["message"]["content"]
        m2 = m1 + [{"role": "assistant", "content": reply1},
                   {"role": "user", "content": "more"}]
        r2 = chat(m2, session="c1")
        # turn 2 prefilled only the suffix (closing + new turn), not the
        # whole conversation
        assert r2["usage"]["prompt_tokens"] < r1["usage"]["prompt_tokens"] + 25
        # stateless endpoint over the identical conversation agrees
        ref = chat(m2)
        assert (r2["choices"][0]["message"]["content"]
                == ref["choices"][0]["message"]["content"])
    finally:
        httpd.shutdown()


def test_stream_reply_splits_multibyte_utf8():
    """A multi-byte UTF-8 character whose byte-fallback tokens arrive in
    different SSE chunks must stream out intact: the incremental decoder
    holds back the incomplete tail instead of emitting U+FFFD and slicing
    the next delta at the wrong offset."""
    import io
    import queue

    from gguf_tpu.engine.server import _Request, make_handler

    class Tok:
        bos_id, eos_id = 1, 2
        add_space_prefix = False

        def decode_token(self, tid):
            return bytes([tid])           # token id IS the raw byte

    class WorkerStub:
        class llm:
            tokenizer = Tok()

    Handler = make_handler(WorkerStub())
    h = Handler.__new__(Handler)          # no socket; drive the method alone
    h.wfile = io.BytesIO()
    h.send_response = lambda code: None
    h.send_header = lambda *a: None
    h.end_headers = lambda: None

    req = _Request("p", 4, None, 0, stream=True)
    # "né!" = 6e | c3 a9 | 21 — é's two bytes split across two chunks
    req.events.put(([0x6E, 0xC3], False))
    req.events.put(([0xA9, 0x21], True))
    req.events.put(None)
    h._stream_reply(req)

    deltas = []
    for line in h.wfile.getvalue().decode().splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            deltas.append(json.loads(line[6:])["choices"][0]["text"])
    assert "".join(deltas) == "né!"
    assert "�" not in "".join(deltas)
    # the held-back byte belongs to the SECOND delta, not the first
    assert deltas[0] == "n"


def test_embeddings_endpoint(server):
    req = urllib.request.Request(
        server + "/v1/embeddings",
        data=json.dumps({"input": [[1, 5, 9], [2, 7]]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        res = json.loads(r.read())
    assert res["object"] == "list" and len(res["data"]) == 2
    for i, d in enumerate(res["data"]):
        assert d["index"] == i
        v = np.asarray(d["embedding"], np.float32)
        assert v.shape == (CFG.dim,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-4)
    # single token-id input is auto-wrapped
    req = urllib.request.Request(
        server + "/v1/embeddings",
        data=json.dumps({"input": [1, 5]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        res = json.loads(r.read())
    assert len(res["data"]) == 1


def test_embeddings_missing_input(server):
    req = urllib.request.Request(
        server + "/v1/embeddings", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_models_endpoint(server):
    with urllib.request.urlopen(server + "/v1/models", timeout=60) as r:
        res = json.loads(r.read())
    assert res["object"] == "list"
    assert res["data"][0]["meta"]["dim"] == CFG.dim


def test_response_format_json(tmp_path):
    """response_format {'type': 'json_object'} constrains the completion
    to (a prefix of) valid JSON via the built-in grammar."""
    from gguf_tpu.engine.grammar import Grammar, GrammarState, JSON_GBNF

    path = str(tmp_path / "rf.gguf")
    # CFG's 64-token vocab can't even spell '{': use a byte-complete one
    big = LlamaConfig(vocab_size=512, dim=256, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=512, max_seq_len=64)
    tokens = (["<unk>", "<s>", "</s>"]
              + [f"<0x{b:02X}>" for b in range(256)])
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:512]
    md = {"tokenizer.ggml.tokens": tokens,
          "tokenizer.ggml.scores": np.zeros(512, np.float32),
          "tokenizer.ggml.bos_token_id": 1,
          "tokenizer.ggml.eos_token_id": 2}
    write_random_llama_gguf(path, big, fmt=GGMLType.Q4_K, seed=3,
                            extra_metadata=md)
    llm = LLM(path, max_batch=2, max_seq=48)
    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "give me json", "max_tokens": 24,
                             "temperature": 0.0,
                             "response_format": {"type": "json_object"}}
                            ).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        text = body["choices"][0]["text"]
        assert text.startswith("{"), text
        st = GrammarState(Grammar(JSON_GBNF))
        assert st.advance_text(text), text
    finally:
        httpd.shutdown()


def test_props_and_slots(server):
    """llama.cpp server parity: /props reports slot count + defaults,
    /slots reports per-slot occupancy."""
    with urllib.request.urlopen(server + "/props", timeout=60) as r:
        props = json.loads(r.read())
    assert props["total_slots"] == 2
    assert props["default_generation_settings"]["n_ctx"] == 32
    assert "temperature" in props["default_generation_settings"]["params"]
    with urllib.request.urlopen(server + "/slots", timeout=60) as r:
        slots = json.loads(r.read())
    assert len(slots) == 2
    assert all(s["id"] == i for i, s in enumerate(slots))
    assert all(s["session"] is None for s in slots)  # stateless fixture


def test_tokenize_detokenize(tmp_path):
    """/tokenize + /detokenize round-trip through the embedded tokenizer
    (llama.cpp server API shapes, incl. with_pieces)."""
    path = str(tmp_path / "tok.gguf")
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    words = ["▁hello", "▁world", "▁", "h", "e", "l", "o", "w", "r", "d"]
    tokens += words
    scores = np.zeros(len(tokens), np.float32)
    for i, w in enumerate(words):
        scores[259 + i] = float(len(w))
    cfg = LlamaConfig(vocab_size=len(tokens), dim=256, n_layers=1,
                      n_heads=4, n_kv_heads=2, ffn_dim=512, max_seq_len=64)
    write_random_llama_gguf(path, cfg, fmt=GGMLType.Q4_K, seed=3,
                            extra_metadata={
                                "tokenizer.ggml.tokens": tokens,
                                "tokenizer.ggml.scores": scores,
                                "tokenizer.ggml.bos_token_id": 1,
                                "tokenizer.ggml.eos_token_id": 2,
                            })
    llm = LLM(path, max_batch=2, max_seq=32)
    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(route, payload):
        req = urllib.request.Request(
            base + route, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read()), r.status

    try:
        toks, _ = post("/tokenize", {"content": "hello world"})
        assert toks["tokens"] and all(isinstance(t, int)
                                      for t in toks["tokens"])
        # add_special prepends BOS
        with_bos, _ = post("/tokenize", {"content": "hello world",
                                         "add_special": True})
        assert with_bos["tokens"][0] == llm.tokenizer.bos_id
        assert with_bos["tokens"][1:] == toks["tokens"]
        pieces, _ = post("/tokenize", {"content": "hello",
                                       "with_pieces": True})
        assert all(set(p) == {"id", "piece"} for p in pieces["tokens"])
        detok, _ = post("/detokenize", {"tokens": toks["tokens"]})
        assert detok["content"] == "hello world"
        # errors surface as 400s
        try:
            post("/tokenize", {})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_n_multiple_choices(server):
    """OpenAI 'n': one request returns n independent sampled choices
    (per-choice seeds), each with its own index."""
    out = _post(server, {"prompt": [1, 5, 9], "max_tokens": 5, "n": 2,
                         "temperature": 1.0, "seed": 4})
    assert len(out["choices"]) == 2
    assert [c["index"] for c in out["choices"]] == [0, 1]
    # one batch, independent per-row draws: not identical
    texts = {tuple(c["token_ids"]) for c in out["choices"]}
    assert len(texts) >= 2
    assert out["usage"]["completion_tokens"] == sum(
        len(c["token_ids"]) for c in out["choices"])


def test_chat_template_receives_tools(tmp_path):
    """'tools' passes into the jinja template (hermes/qwen-style
    templates render function specs into the system prompt)."""
    import numpy as np

    from gguf_tpu.models import write_random_llama_gguf
    path = str(tmp_path / "tools.gguf")
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:CFG.vocab_size]
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=9,
                            extra_metadata={
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.chat_template":
            "{% if tools %}TOOLS:{% for t in tools %}"
            "{{ t.function.name }};{% endfor %}{% endif %}"
            "{% for m in messages %}[{{ m.role }}]{{ m.content }}"
            "{% endfor %}",
    })
    llm = LLM(path, max_batch=1, max_seq=64)
    tools = [{"type": "function",
              "function": {"name": "get_weather", "parameters": {}}}]
    text = llm.apply_chat_template(
        [{"role": "user", "content": "hi"}], tools=tools)
    assert text.startswith("TOOLS:get_weather;")
    text2 = llm.apply_chat_template([{"role": "user", "content": "hi"}])
    assert not text2.startswith("TOOLS")


def test_metrics_prometheus_and_json(server):
    """/metrics serves Prometheus text exposition (llama.cpp default);
    ?format=json keeps the structured form."""
    import urllib.request

    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE gguf_tpu:requests_total counter" in body
    assert "gguf_tpu:queue_depth" in body

    with urllib.request.urlopen(server + "/metrics?format=json",
                                timeout=60) as r:
        data = json.loads(r.read())
    assert "requests_total" in data and "queue_depth" in data


def test_legacy_completion_endpoint(server):
    """llama.cpp-native /completion: n_predict request field, {content,
    stop, tokens_predicted} response, and legacy stream chunk shape."""
    import urllib.request

    def post(payload, stream=False):
        req = urllib.request.Request(
            server + "/completion", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=300)

    with post({"prompt": [1, 5, 9], "n_predict": 4,
               "temperature": 0.0}) as r:
        out = json.loads(r.read())
    assert out["tokens_predicted"] <= 4
    assert isinstance(out["content"], str)
    assert out["stop"] is True
    assert "stopped_eos" in out and "stopped_limit" in out

    with post({"prompt": [1, 5, 9], "n_predict": 4, "temperature": 0.0,
               "stream": True}) as r:
        lines = [ln for ln in r.read().decode().splitlines() if ln]
    assert all(ln.startswith("data: ") for ln in lines)
    chunks = [json.loads(ln[6:]) for ln in lines]   # every line is JSON
    assert chunks[-1]["stop"] is True
    assert all("content" in c for c in chunks)
