"""Concurrency stress: mixed request types racing through the engine
thread — stateless completions (incl. n-fanout and streams), chat
sessions, embeddings, tokenize, slot saves, metrics reads. Everything
must complete without 500s, and the serving counters must stay exactly
consistent (single-writer engine thread)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from conftest import toy_spm_metadata
from gguf_tpu.engine import LLM
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

pytestmark = pytest.mark.slow

CFG = LlamaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=256, max_seq_len=64)


class _Server(ThreadingHTTPServer):
    # 24 simultaneous connects overflow the default accept backlog (5)
    # and clients get ECONNRESET before the handler ever runs
    request_queue_size = 128


def test_mixed_concurrent_requests(tmp_path):
    from gguf_tpu.engine.server import EngineWorker, make_handler

    path = str(tmp_path / "m.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=81,
                            extra_metadata=toy_spm_metadata(CFG.vocab_size))
    save_dir = str(tmp_path / "slots")
    import os

    os.makedirs(save_dir)
    worker = EngineWorker(LLM(path, max_batch=4, max_seq=64))
    httpd = _Server(("127.0.0.1", 0),
                    make_handler(worker, slot_save_dir=save_dir))
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
                # two sessions, alternating across the four chat calls
                out = post("/v1/chat/completions",
                           {"messages": [{"role": "user",
                                          "content": f"hi {i}"}],
                            "session": f"s{(i // 6) % 2}",
                            "max_tokens": 4})
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
                out = post("/v1/embeddings",
                           {"input": [[1, 5, 9 + (i % 50)]]})
                assert out["data"][0]["embedding"]
            else:
                out = post("/tokenize", {"content": f"hello {i}"})
                assert out["tokens"]
                with urllib.request.urlopen(base + "/metrics",
                                            timeout=120) as r:
                    assert b"requests_total" in r.read()
            results[i] = True
        except Exception as e:   # noqa: BLE001 - collect everything
            errors.append((i, repr(e)))

    try:
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
        # exactly once per engine-processed request: 4 each of
        # completions / chat / n-fanout / stream / embed = 20, plus the
        # two slot ops (tokenize + metrics never touch the engine)
        assert m["requests_failed"] == 0
        assert m["requests_total"] == 22, m
    finally:
        httpd.shutdown()
