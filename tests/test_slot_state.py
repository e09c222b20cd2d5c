"""Slot state persistence: LLM.save_state/load_state (.npz KV rows +
token history), ChatSession.save/restore, and the llama.cpp
/slots/{id}?action=save|restore|erase endpoints. The INT8 cache rows and
f32 scales round-trip bit-exactly, so a restored conversation continues
with the exact token stream the unbroken one produces."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gguf_tpu.engine import LLM, SamplerConfig
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

CFG = LlamaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=256, max_seq_len=64)


@pytest.fixture(scope="module")
def gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ss") / "tiny.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q8_0, seed=6)
    return path


def test_session_save_restore_exact_continuation(gguf, tmp_path):
    """A restored session must continue with the exact token stream the
    unbroken session produces (same cache rows, positions, key stream)."""
    g = SamplerConfig(temperature=0.0)
    llm1 = LLM(gguf, max_batch=2, max_seq=64)
    s1 = llm1.start_session()
    s1.send([1, 5, 9, 12], max_new_tokens=6, sampler=g, stop_at_eos=False)
    unbroken = s1.send([7, 3], max_new_tokens=6, sampler=g,
                       stop_at_eos=False)

    llm2 = LLM(gguf, max_batch=2, max_seq=64)
    s2 = llm2.start_session()
    s2.send([1, 5, 9, 12], max_new_tokens=6, sampler=g, stop_at_eos=False)
    state = str(tmp_path / "sess.npz")
    saved = s2.save(state)
    assert saved == s2.cached

    llm3 = LLM(gguf, max_batch=2, max_seq=64)
    s3 = llm3.start_session()
    assert s3.restore(state) == saved
    resumed = s3.send([7, 3], max_new_tokens=6, sampler=g,
                      stop_at_eos=False)
    assert resumed.token_ids == unbroken.token_ids


def test_slot_history_save_and_prefix_reuse(gguf, tmp_path):
    """Stateless path: a released slot's history saves, and loading it
    into a fresh LLM seeds the prefix cache (suffix-only prefill)."""
    g = SamplerConfig(temperature=0.0)
    llm = LLM(gguf, max_batch=1, max_seq=64)
    [res] = llm.generate([[1, 5, 9, 12, 8, 4, 2, 6]], max_new_tokens=4,
                         sampler=g, stop_at_eos=False)
    state = str(tmp_path / "slot.npz")
    rows = llm.save_state(state, slot=0)
    assert rows >= 8

    llm2 = LLM(gguf, max_batch=1, max_seq=64)
    tokens, rows2 = llm2.load_state(state, slot=0)
    assert rows2 == rows and tokens[:8] == [1, 5, 9, 12, 8, 4, 2, 6]
    assert llm2.prefix_cache_hits == 0
    llm2.generate([tokens + [11]], max_new_tokens=2, sampler=g,
                  stop_at_eos=False)
    assert llm2.prefix_cache_hits >= 8     # restored rows were reused


def test_save_without_history_raises(gguf, tmp_path):
    llm = LLM(gguf, max_batch=1, max_seq=64)
    with pytest.raises(ValueError, match="no resident history"):
        llm.save_state(str(tmp_path / "x.npz"), slot=0)


def test_geometry_mismatch_raises(gguf, tmp_path):
    import dataclasses

    llm = LLM(gguf, max_batch=1, max_seq=64)
    llm.generate([[1, 2, 3, 4, 5, 6, 7, 8]], max_new_tokens=2,
                 stop_at_eos=False)
    state = str(tmp_path / "s.npz")
    llm.save_state(state, slot=0)

    other_path = str(tmp_path / "other.gguf")
    write_random_llama_gguf(
        other_path, dataclasses.replace(CFG, n_layers=1), seed=7,
        fmt=GGMLType.Q8_0)
    other = LLM(other_path, max_batch=1, max_seq=64)
    with pytest.raises(ValueError, match="geometry"):
        other.load_state(state, slot=0)


def test_erase_slot(gguf):
    llm = LLM(gguf, max_batch=1, max_seq=64)
    llm.generate([[1, 2, 3, 4, 5, 6, 7, 8]], max_new_tokens=2,
                 stop_at_eos=False)
    assert llm.erase_slot(0) > 0
    assert llm.erase_slot(0) == 0          # already gone
    llm.generate([[1, 2, 3, 4, 5, 6, 7, 8]], max_new_tokens=2,
                 stop_at_eos=False)
    assert llm.prefix_cache_hits == 0      # no reuse after erase


@pytest.fixture(scope="module")
def server(gguf, tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from gguf_tpu.engine.server import EngineWorker, make_handler

    save_dir = str(tmp_path_factory.mktemp("slotsave"))
    worker = EngineWorker(LLM(gguf, max_batch=2, max_seq=64))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(worker, slot_save_dir=save_dir))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", save_dir
    httpd.shutdown()


def _post(base, route, payload):
    req = urllib.request.Request(
        base + route, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_slots_save_restore_erase_endpoints(server):
    base, save_dir = server
    _post(base, "/v1/completions",
          {"prompt": [1, 5, 9, 12, 8, 4, 2, 6], "max_tokens": 3,
           "temperature": 0.0})
    out = _post(base, "/slots/0?action=save", {"filename": "a.npz"})
    assert out["id_slot"] == 0 and out["n_saved"] >= 8
    assert out["filename"].startswith(save_dir)

    out = _post(base, "/slots/0?action=erase", {})
    assert out["n_erased"] >= 8

    out = _post(base, "/slots/0?action=restore", {"filename": "a.npz"})
    assert out["n_restored"] >= 8


def test_slots_endpoint_errors(server):
    base, _ = server
    for route, payload, frag in [
            ("/slots/0?action=explode", {}, "action"),
            ("/slots/99?action=erase", {}, "out of range"),
            ("/slots/0?action=restore", {"filename": "missing.npz"}, "")]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, route, payload)
        assert ei.value.code == 400
        assert frag in json.loads(ei.value.read()).get("error", "")
