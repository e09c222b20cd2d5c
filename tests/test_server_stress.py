"""Concurrency stress: mixed request types racing through the engine
thread — stateless completions (incl. n-fanout and streams), chat
sessions, embeddings-on-decoder, tokenize, slot saves, metrics reads.
Everything must complete without 500s (except deliberate 4xx), and the
serving counters must stay consistent (single-writer engine thread)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gguf_tpu.engine import LLM
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

pytestmark = pytest.mark.slow

CFG = LlamaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=256, max_seq_len=64)


def _spm_md():
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:CFG.vocab_size]
    return {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }


def test_mixed_concurrent_requests(tmp_path):
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    path = str(tmp_path / "m.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=81,
                            extra_metadata=_spm_md())
    save_dir = str(tmp_path / "slots")
    import os

    os.makedirs(save_dir)
    worker = EngineWorker(LLM(path, max_batch=4, max_seq=64))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(worker, slot_save_dir=save_dir))
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(route, payload):
        req = urllib.request.Request(
            base + route, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read()
            if r.headers.get("Content-Type", "").startswith(
                    "text/event-stream"):
                return body.decode()
            return json.loads(body)

    errors = []
    results = {}

    def worker_fn(i):
        try:
            kind = i % 6
            if kind == 0:
                out = post("/v1/completions",
                           {"prompt": [1, 5, 9, 3 + i], "max_tokens": 5,
                            "temperature": 0.0})
                assert out["choices"][0]["token_ids"], out
            elif kind == 1:
                out = post("/v1/chat/completions",
                           {"messages": [{"role": "user",
                                          "content": f"hi {i}"}],
                            "session": f"s{i % 2}", "max_tokens": 4})
                assert "choices" in out
            elif kind == 2:
                out = post("/v1/completions",
                           {"prompt": [2, 7, i % 100], "max_tokens": 4,
                            "n": 2, "temperature": 0.9, "seed": i})
                assert len(out["choices"]) == 2
            elif kind == 3:
                out = post("/v1/completions",
                           {"prompt": [4, 8], "max_tokens": 4,
                            "temperature": 0.0, "stream": True})
                assert "data: " in out
            elif kind == 4:
                out = post("/tokenize", {"content": f"hello {i}"})
                assert out["tokens"]
            else:
                with urllib.request.urlopen(base + "/metrics",
                                            timeout=120) as r:
                    assert b"requests_total" in r.read()
            results[i] = True
        except Exception as e:   # noqa: BLE001 - collect everything
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker_fn, args=(i,))
               for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(results) == 24

    # a slot op interleaved after traffic still works
    out = post("/slots/0?action=save", {"filename": "stress.npz"})
    assert out["n_saved"] > 0
    out = post("/slots/0?action=restore", {"filename": "stress.npz"})
    assert out["n_restored"] > 0

    with urllib.request.urlopen(base + "/metrics?format=json",
                                timeout=120) as r:
        m = json.loads(r.read())
    # every engine-processed request counted exactly once; none failed
    assert m["requests_failed"] == 0
    assert m["requests_total"] >= 16   # completions/chat/n/stream + slots
    httpd.shutdown()
