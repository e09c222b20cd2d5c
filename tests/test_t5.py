"""T5 encoder-decoder (arch t5): relative-position-bucket attention,
unscaled scores, cross-attention decode — pinned against a numpy
seq2seq reference implementing the HF/llama.cpp semantics directly."""

import numpy as np
import pytest

import jax.numpy as jnp

from gguf_tpu.engine import LLM, SamplerConfig
from gguf_tpu.gguf import GGUFReader
from gguf_tpu.models.t5 import (T5Config, load_t5, t5_decode_step,
                                t5_encode, t5_generate,
                                write_random_t5_gguf)

CFG = T5Config(vocab_size=96, dim=64, n_enc_layers=2, n_dec_layers=2,
               n_heads=4, head_dim=16, ffn_dim=128, norm_eps=1e-6,
               rel_buckets=8, rel_max_dist=128, decoder_start=0,
               max_seq_len=64)


def _np_bucket(rel, bidirectional, n_buckets, max_dist):
    """HF transformers _relative_position_bucket, independently."""
    rel = np.asarray(rel)
    ret = np.zeros_like(rel)
    n = n_buckets
    if bidirectional:
        n //= 2
        ret = ret + (rel > 0).astype(np.int64) * n
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    exact = n // 2
    is_small = rel < exact
    large = exact + (np.log(np.maximum(rel, 1) / exact)
                     / np.log(max_dist / exact) * (n - exact)).astype(np.int64)
    large = np.minimum(large, n - 1)
    return ret + np.where(is_small, rel, large)


def test_rel_bucket_matches_hf():
    from gguf_tpu.models.t5 import _rel_bucket

    rel = np.arange(-40, 41).reshape(9, 9)
    for bidir in (True, False):
        got = np.asarray(_rel_bucket(jnp.asarray(rel), bidir, 32, 128))
        ref = _np_bucket(rel, bidir, 32, 128)
        np.testing.assert_array_equal(got, ref)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("t5") / "t5.gguf")
    write_random_t5_gguf(path, CFG, seed=61)
    with GGUFReader(path) as r:
        cfg, params = load_t5(r)
    return path, cfg, params


def _np_t5(path, cfg, enc_ids, dec_ids):
    """Numpy seq2seq: encoder over enc_ids, full-recompute decoder over
    dec_ids. Returns decoder logits (Td, V)."""
    r = GGUFReader(path)
    la = lambda n: r.load_array(n)
    has = lambda n: n in r.tensors
    eps = cfg.norm_eps
    h, hd = cfg.n_heads, cfg.head_dim

    def rmsn(v, wt):
        return v / np.sqrt(np.mean(v * v, -1, keepdims=True) + eps) * wt

    def gelu(v):
        import math

        return 0.5 * v * (1 + np.vectorize(math.erf)(v / np.sqrt(2)))

    def mha(q, k, v, bias):
        sc = np.einsum("qhd,khd->hqk", q, k) + bias
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        return np.einsum("hqk,khd->qhd", pr, v).reshape(q.shape[0], -1)

    def ffn(p, x):
        hx = rmsn(x, la(p + "ffn_norm.weight"))
        u = hx @ la(p + "ffn_up.weight").T
        if has(p + "ffn_gate.weight"):
            act = gelu(hx @ la(p + "ffn_gate.weight").T) * u
        else:
            act = np.maximum(u, 0)
        return x + act @ la(p + "ffn_down.weight").T

    emb = la("token_embd.weight")
    # encoder
    se = len(enc_ids)
    x = emb[enc_ids]
    rel_b = la("enc.blk.0.attn_rel_b.weight").T          # (H, buckets)
    pos = np.arange(se)
    bias = rel_b[:, _np_bucket(pos[None, :] - pos[:, None], True,
                               cfg.rel_buckets, cfg.rel_max_dist)]
    for i in range(cfg.n_enc_layers):
        p = f"enc.blk.{i}."
        rr = rmsn(x, la(p + "attn_norm.weight"))
        q = (rr @ la(p + "attn_q.weight").T).reshape(se, h, hd)
        k = (rr @ la(p + "attn_k.weight").T).reshape(se, h, hd)
        v = (rr @ la(p + "attn_v.weight").T).reshape(se, h, hd)
        x = x + mha(q, k, v, bias) @ la(p + "attn_o.weight").T
        x = ffn(p, x)
    enc = rmsn(x, la("enc.output_norm.weight"))

    # decoder, full recompute
    td = len(dec_ids)
    x = emb[dec_ids]
    rel_b = la("dec.blk.0.attn_rel_b.weight").T
    pos = np.arange(td)
    rel = pos[None, :] - pos[:, None]
    bias = rel_b[:, _np_bucket(rel, False, cfg.rel_buckets,
                               cfg.rel_max_dist)]
    bias = bias + np.where(rel > 0, -np.inf, 0.0)[None]   # causal
    for i in range(cfg.n_dec_layers):
        p = f"dec.blk.{i}."
        rr = rmsn(x, la(p + "attn_norm.weight"))
        q = (rr @ la(p + "attn_q.weight").T).reshape(td, h, hd)
        k = (rr @ la(p + "attn_k.weight").T).reshape(td, h, hd)
        v = (rr @ la(p + "attn_v.weight").T).reshape(td, h, hd)
        x = x + mha(q, k, v, bias) @ la(p + "attn_o.weight").T
        rr = rmsn(x, la(p + "cross_attn_norm.weight"))
        cq = (rr @ la(p + "cross_attn_q.weight").T).reshape(td, h, hd)
        ek = (enc @ la(p + "cross_attn_k.weight").T).reshape(se, h, hd)
        ev = (enc @ la(p + "cross_attn_v.weight").T).reshape(se, h, hd)
        x = x + mha(cq, ek, ev, 0.0) @ la(p + "cross_attn_o.weight").T
        x = ffn(p, x)
    x = rmsn(x, la("dec.output_norm.weight"))
    x = x * cfg.dim ** -0.5                               # tied head scale
    logits = x @ emb.T
    r.close()
    return logits


def test_t5_decode_matches_numpy(model):
    """Cached step-by-step decode equals the numpy full-recompute
    decoder at every position."""
    path, cfg, params = model
    rng = np.random.default_rng(0)
    enc_ids = rng.integers(2, cfg.vocab_size, 7).astype(np.int32)
    dec_ids = np.array([cfg.decoder_start, 5, 9, 3], np.int32)

    enc_out = t5_encode(params, cfg, jnp.asarray(enc_ids[None]),
                        jnp.asarray([7], jnp.int32))
    cache = [{"k": jnp.zeros((1, 8, cfg.n_heads, cfg.head_dim)),
              "v": jnp.zeros((1, 8, cfg.n_heads, cfg.head_dim))}
             for _ in range(cfg.n_dec_layers)]
    got = []
    for i, tok in enumerate(dec_ids):
        logits, cache = t5_decode_step(
            params, cfg, jnp.asarray([[tok]], jnp.int32), jnp.int32(i),
            cache, enc_out, jnp.asarray([7], jnp.int32))
        got.append(np.asarray(logits)[0, 0])
    got = np.stack(got)
    ref = _np_t5(path, cfg, enc_ids, dec_ids)
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 2e-3, \
        np.max(np.abs(got - ref)) / denom


def test_t5_generate_greedy_matches_numpy(model):
    path, cfg, params = model
    rng = np.random.default_rng(1)
    enc_ids = rng.integers(2, cfg.vocab_size, 5).astype(np.int32)
    outs, hit_eos = t5_generate(params, cfg, enc_ids[None], [5],
                                max_new_tokens=6, eos_id=-1)
    assert hit_eos == [False]
    # numpy greedy rollout
    dec = [cfg.decoder_start]
    for _ in range(6):
        lg = _np_t5(path, cfg, enc_ids, np.asarray(dec, np.int32))
        dec.append(int(np.argmax(lg[-1])))
    assert outs[0] == dec[1:], (outs[0], dec[1:])


def test_t5_engine_and_tokenizer(tmp_path):
    """LLM routes arch t5 to the lockstep encoder-decoder loop; string
    prompts encode SPM + EOS with no BOS."""
    tokens = ["<pad>", "</s>", "<unk>"]
    tokens += [f"<0x{b:02X}>" for b in range(93)]
    md = {"tokenizer.ggml.model": "llama",
          "tokenizer.ggml.tokens": tokens[:CFG.vocab_size],
          "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
          "tokenizer.ggml.bos_token_id": 0,
          "tokenizer.ggml.eos_token_id": 1,
          "tokenizer.ggml.unknown_token_id": 2}
    path = str(tmp_path / "t5.gguf")
    write_random_t5_gguf(path, CFG, seed=62, extra_metadata=md)
    llm = LLM(path, max_batch=2, max_seq=64)
    assert llm.t5
    outs = llm.generate(["ab", "c"], max_new_tokens=5,
                        sampler=SamplerConfig(temperature=0.0))
    assert len(outs) == 2
    # finished reflects EOS (finish_reason stop) vs the length cap
    assert all(len(o.token_ids) <= 5 for o in outs)
    assert all(o.finished == (len(o.token_ids) < 5) for o in outs)
    # batched greedy equals solo (padding must not leak)
    [solo] = llm.generate(["ab"], max_new_tokens=5,
                          sampler=SamplerConfig(temperature=0.0))
    assert solo.token_ids == outs[0].token_ids


def test_t5_streaming_and_stop(tmp_path):
    """on_tokens streams per chunk; stop strings finish early and trim
    .text; finished reflects the cause."""
    tokens = ["<pad>", "</s>", "<unk>"]
    tokens += [f"<0x{b:02X}>" for b in range(93)]
    md = {"tokenizer.ggml.model": "llama",
          "tokenizer.ggml.tokens": tokens[:CFG.vocab_size],
          "tokenizer.ggml.scores": np.zeros(CFG.vocab_size, np.float32),
          "tokenizer.ggml.bos_token_id": 0,
          "tokenizer.ggml.eos_token_id": 1,
          "tokenizer.ggml.unknown_token_id": 2}
    path = str(tmp_path / "t5s.gguf")
    write_random_t5_gguf(path, CFG, seed=63, extra_metadata=md)
    llm = LLM(path, max_batch=1, max_seq=64)
    got = []
    [res] = llm.generate(["ab"], max_new_tokens=10,
                         sampler=SamplerConfig(temperature=0.0),
                         stop_at_eos=False,
                         on_tokens=lambda r, ids, fin: got.append(
                             (r, list(ids), fin)))
    streamed = [t for _, ids, _ in got for t in ids]
    assert streamed == res.token_ids          # stream covers the output
    assert any(fin for _, _, fin in got)      # a finished notification

    # stop_ids: first emitted token as terminator -> empty, finished
    first = res.token_ids[0]
    [res2] = llm.generate(["ab"], max_new_tokens=10,
                          sampler=SamplerConfig(temperature=0.0),
                          stop_at_eos=False, stop_ids=[first])
    assert res2.finished and res2.token_ids == []

    with pytest.raises(AssertionError, match="t5 serving"):
        llm.generate(["ab"], max_new_tokens=2, logprobs=3)


def test_t5_quantized_weights(tmp_path):
    """Quantized T5 checkpoints (madlad/flan ship q8_0/q4_k mixes) load
    as MMQ QuantTensors and match the f32 model within quant noise."""
    from gguf_tpu.gguf import GGMLType
    from gguf_tpu.quant.layouts import QuantTensor

    pf = str(tmp_path / "f32.gguf")
    pq = str(tmp_path / "q8.gguf")
    write_random_t5_gguf(pf, CFG, seed=64)
    write_random_t5_gguf(pq, CFG, seed=64, fmt=GGMLType.Q8_0)
    with GGUFReader(pq) as r:
        cfgq, pq_params = load_t5(r)
    with GGUFReader(pf) as r:
        cfgf, pf_params = load_t5(r)
    assert isinstance(pq_params["enc_layers"][0]["wq"], QuantTensor)

    rng = np.random.default_rng(2)
    enc_ids = rng.integers(2, CFG.vocab_size, 6).astype(np.int32)
    ef = np.asarray(t5_encode(pf_params, cfgf, jnp.asarray(enc_ids[None]),
                              jnp.asarray([6], jnp.int32)))
    eq = np.asarray(t5_encode(pq_params, cfgq, jnp.asarray(enc_ids[None]),
                              jnp.asarray([6], jnp.int32)))
    denom = np.abs(ef).max()
    assert np.max(np.abs(ef - eq)) / denom < 0.03

    outs_f, _ = t5_generate(pf_params, cfgf, enc_ids[None], [6],
                            max_new_tokens=4, eos_id=-1)
    outs_q, _ = t5_generate(pq_params, cfgq, enc_ids[None], [6],
                            max_new_tokens=4, eos_id=-1)
    assert len(outs_q[0]) == 4     # serves; greedy may differ by quant
