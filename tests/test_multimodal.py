"""Multimodal serving: mmproj CLIP vision tower + LLaVA projector +
image prompts through the engine (llama.cpp clip.cpp / libmtmd parity).

The vision encoder is pinned against a naive numpy ViT forward reading
the same mmproj GGUF; the engine path checks that image embeddings
splice into prompts (placeholder ids, embeds prefill) and steer the
output.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gguf_tpu.gguf import GGMLType, GGUFReader
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf
from gguf_tpu.models.clip import (ClipVisionConfig, encode_image,
                                  load_clip, preprocess_image,
                                  write_random_mmproj)

VCFG = ClipVisionConfig(
    image_size=32, patch_size=8, dim=64, n_layers=2, n_heads=4,
    ffn_dim=128, norm_eps=1e-5, proj_dim=128,
    image_mean=(0.48145466, 0.4578275, 0.40821073),
    image_std=(0.26862954, 0.26130258, 0.27577711), projector="mlp")

LCFG = LlamaConfig(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                   n_kv_heads=2, ffn_dim=256, max_seq_len=64)


@pytest.fixture(scope="module")
def mmproj(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mm") / "mmproj.gguf")
    write_random_mmproj(path, VCFG, seed=33)
    return path


def _numpy_vit(path, pixels):
    """Naive numpy CLIP-ViT + llava MLP projector from the GGUF."""
    r = GGUFReader(path)
    la = lambda n: r.load_array(n)
    cfg = ClipVisionConfig.from_gguf_metadata(r.metadata)
    P, D, eps = cfg.patch_size, cfg.dim, cfg.norm_eps
    g = cfg.image_size // P

    def ln(v, w, b):
        m = v.mean(-1, keepdims=True)
        va = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) / np.sqrt(va + eps) * w + b

    x = np.asarray(pixels, np.float32)
    patches = x.reshape(g, P, g, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(g * g, 3 * P * P)
    kern = la("v.patch_embd.weight").reshape(D, 3 * P * P)
    x = patches @ kern.T
    x = np.concatenate([la("v.class_embd")[None, :], x], axis=0)
    x = x + la("v.position_embd.weight")[:x.shape[0]]
    x = ln(x, la("v.pre_ln.weight"), la("v.pre_ln.bias"))

    h, hd = cfg.n_heads, D // cfg.n_heads
    gelu = lambda v: 0.5 * v * (1 + _erf(v / np.sqrt(2)))
    for i in range(cfg.n_layers):
        p = f"v.blk.{i}."
        rr = ln(x, la(p + "ln1.weight"), la(p + "ln1.bias"))
        q = (rr @ la(p + "attn_q.weight").T + la(p + "attn_q.bias"))
        k = (rr @ la(p + "attn_k.weight").T + la(p + "attn_k.bias"))
        v = (rr @ la(p + "attn_v.weight").T + la(p + "attn_v.bias"))
        q = q.reshape(-1, h, hd)
        k = k.reshape(-1, h, hd)
        v = v.reshape(-1, h, hd)
        sc = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
        pr = np.exp(sc - sc.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("hqk,khd->qhd", pr, v).reshape(-1, D)
        x = x + att @ la(p + "attn_out.weight").T + la(p + "attn_out.bias")
        rr = ln(x, la(p + "ln2.weight"), la(p + "ln2.bias"))
        rr = rr @ la(p + "ffn_up.weight").T + la(p + "ffn_up.bias")
        rr = gelu(rr)
        x = x + rr @ la(p + "ffn_down.weight").T + la(p + "ffn_down.bias")

    x = x[1:]                                    # llava: drop CLS
    x = x @ la("mm.0.weight").T + la("mm.0.bias")
    x = gelu(x)
    x = x @ la("mm.2.weight").T + la("mm.2.bias")
    r.close()
    return x


import math


def _erf(v):
    return np.vectorize(math.erf)(v)


def test_clip_config_roundtrip(mmproj):
    cfg, params = load_clip(mmproj)
    assert cfg.image_size == 32 and cfg.patch_size == 8
    assert cfg.n_patches == 16 and cfg.proj_dim == 128
    assert len(params["layers"]) == 2
    assert params["patch"].shape == (64, 3 * 64)


def test_preprocess_resizes_and_normalizes():
    img = (np.arange(48 * 64 * 3, dtype=np.uint8)
           .reshape(48, 64, 3))
    px = preprocess_image(img, VCFG)
    assert px.shape == (32, 32, 3)
    # identity for an already-sized float image: pure normalization
    raw = np.full((32, 32, 3), 0.5, np.float32)
    px2 = preprocess_image(raw, VCFG)
    expect = (0.5 - np.asarray(VCFG.image_mean)) / np.asarray(VCFG.image_std)
    np.testing.assert_allclose(px2, np.broadcast_to(expect, (32, 32, 3)),
                               rtol=1e-6)


def test_encode_image_matches_numpy_vit(mmproj):
    cfg, params = load_clip(mmproj)
    rng = np.random.default_rng(7)
    px = rng.standard_normal((32, 32, 3)).astype(np.float32)
    got = np.asarray(encode_image(params, cfg, px))[0]
    ref = _numpy_vit(mmproj, px)
    assert got.shape == (16, 128)
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 1e-3, \
        np.max(np.abs(got - ref)) / denom


@pytest.fixture(scope="module")
def mm_llm(tmp_path_factory, mmproj):
    from gguf_tpu.engine import LLM

    path = str(tmp_path_factory.mktemp("mml") / "lm.gguf")
    write_random_llama_gguf(path, LCFG, fmt=GGMLType.Q8_0, seed=34)
    return LLM(path, max_batch=2, max_seq=64, mmproj=mmproj)


def test_mm_prompt_prepare(mm_llm):
    rng = np.random.default_rng(8)
    img = rng.random((32, 32, 3)).astype(np.float32)
    ids, emb = mm_llm._prepare_prompt([1, 5, img, 9])
    assert len(ids) == 3 + VCFG.n_patches
    assert emb.shape == (len(ids), LCFG.dim)
    assert ids[:2] == [1, 5] and ids[-1] == 9
    # text-only prompts stay on the token path
    ids2, emb2 = mm_llm._prepare_prompt([1, 5, 9])
    assert emb2 is None and ids2 == [1, 5, 9]


def test_mm_generate_deterministic_and_image_sensitive(mm_llm):
    from gguf_tpu.engine import SamplerConfig

    rng = np.random.default_rng(9)
    img_a = rng.random((32, 32, 3)).astype(np.float32)
    img_b = rng.random((32, 32, 3)).astype(np.float32)
    g = SamplerConfig(temperature=0.0)
    [a1] = mm_llm.generate([[1, 5, img_a, 9]], max_new_tokens=8,
                           sampler=g, stop_at_eos=False)
    [a2] = mm_llm.generate([[1, 5, img_a, 9]], max_new_tokens=8,
                           sampler=g, stop_at_eos=False)
    [b] = mm_llm.generate([[1, 5, img_b, 9]], max_new_tokens=8,
                          sampler=g, stop_at_eos=False)
    assert a1.token_ids == a2.token_ids and len(a1.token_ids) == 8
    assert a1.token_ids != b.token_ids   # the image steers the output
    assert len(a1.prompt_ids) == 3 + VCFG.n_patches


def test_mm_mixed_batch(mm_llm):
    """An image prompt and a plain text prompt share the slot pool."""
    from gguf_tpu.engine import SamplerConfig

    rng = np.random.default_rng(10)
    img = rng.random((32, 32, 3)).astype(np.float32)
    g = SamplerConfig(temperature=0.0)
    outs = mm_llm.generate([[1, 5, img, 9], [2, 7, 4]], max_new_tokens=6,
                           sampler=g, stop_at_eos=False)
    assert all(len(o.token_ids) == 6 for o in outs)
    [solo] = mm_llm.generate([[2, 7, 4]], max_new_tokens=6, sampler=g,
                             stop_at_eos=False)
    assert outs[1].token_ids == solo.token_ids


def test_mm_chat_endpoint(tmp_path, mmproj):
    """OpenAI content-part chat with a base64 data-URI image through the
    real HTTP server: image parts become embedding spans in the prompt."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from PIL import Image

    from gguf_tpu.engine import LLM
    from gguf_tpu.engine.server import EngineWorker, make_handler

    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens = (tokens + [f"<p{i}>" for i in range(256)])[:LCFG.vocab_size]
    path = str(tmp_path / "lm.gguf")
    write_random_llama_gguf(
        path, LCFG, fmt=GGMLType.Q8_0, seed=35,
        extra_metadata={
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.scores": np.zeros(LCFG.vocab_size, np.float32),
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
            "tokenizer.chat_template":
                "{% for m in messages %}[{{ m.role }}]{{ m.content }}"
                "{% endfor %}",
        })
    llm = LLM(path, max_batch=2, max_seq=64, mmproj=mmproj)
    worker = EngineWorker(llm)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(11)
        img = Image.fromarray(
            (rng.random((32, 32, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        uri = "data:image/png;base64," + \
            base64.b64encode(buf.getvalue()).decode()
        payload = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "hi"},
                {"type": "image_url", "image_url": {"url": uri}},
            ]}],
            "max_tokens": 6, "temperature": 0.0,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = _json.loads(r.read())
        choice = out["choices"][0]
        assert len(choice["token_ids"]) <= 6
        # prompt covered template text + 16 image-patch rows
        assert out["usage"]["prompt_tokens"] > VCFG.n_patches
    finally:
        httpd.shutdown()


def test_mm_prompt_string_bos_position(tmp_path, mmproj):
    """BOS belongs only at true position 0: image- or id-led prompts
    must not grow a BOS mid-sequence (llama.cpp mtmd puts BOS first)."""
    from gguf_tpu.engine import LLM

    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(253)]
    path = str(tmp_path / "lmtok.gguf")
    write_random_llama_gguf(
        path, LCFG, fmt=GGMLType.Q8_0, seed=36,
        extra_metadata={
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.scores": np.zeros(256, np.float32),
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
        })
    llm = LLM(path, max_batch=1, max_seq=64, mmproj=mmproj)
    rng = np.random.default_rng(12)
    img = rng.random((32, 32, 3)).astype(np.float32)
    bos = llm.tokenizer.bos_id
    ids, _ = llm._prepare_prompt(["a", img])
    assert ids[0] == bos and ids.count(bos) == 1      # leading string: BOS
    ids, _ = llm._prepare_prompt([img, "a"])
    assert bos not in ids                              # image-led: none
    ids, _ = llm._prepare_prompt([7, "a", img])
    assert bos not in ids                              # id-led: none


def test_gemma3_siglip_projector(tmp_path):
    """gemma3 mmproj (SigLIP tower): biased patch conv, no CLS, post_ln,
    4x4 average pooling, soft_emb RMS norm, input_projection — pinned
    against a numpy pipeline."""
    from gguf_tpu.gguf import GGMLType, GGUFReader as _R
    from gguf_tpu.gguf.writer import write_gguf

    rng = np.random.default_rng(13)
    S, P, D, proj_d = 32, 4, 48, 96        # 8x8 patches -> 2x2 pooled
    s_ = 0.5 / np.sqrt(D)
    w = lambda *sh: (rng.standard_normal(sh) * s_).astype(np.float32)
    nrm = lambda n: (1 + 0.1 * rng.standard_normal(n)).astype(np.float32)
    f32 = lambda a: (GGMLType.F32, a.shape, a)
    g = S // P
    tensors = {
        "v.patch_embd.weight": f32(w(D, 3, P, P) * 2),
        "v.patch_embd.bias": f32(w(D)),
        "v.position_embd.weight": f32(w(g * g, D)),
        "v.post_ln.weight": f32(nrm(D)),
        "v.post_ln.bias": f32(w(D)),
        "mm.input_projection.weight": f32(w(proj_d, D)),
        "mm.soft_emb_norm.weight": f32(nrm(D)),
    }
    for i in range(1):
        p = f"v.blk.{i}."
        for name, shape in (("attn_q", (D, D)), ("attn_k", (D, D)),
                            ("attn_v", (D, D)), ("attn_out", (D, D)),
                            ("ffn_up", (2 * D, D)), ("ffn_down", (D, 2 * D))):
            tensors[p + name + ".weight"] = f32(w(*shape))
            tensors[p + name + ".bias"] = f32(w(shape[0]))
        for name in ("ln1", "ln2"):
            tensors[p + name + ".weight"] = f32(nrm(D))
            tensors[p + name + ".bias"] = f32(w(D))
    md = {"general.architecture": "clip",
          "clip.projector_type": "gemma3",
          "clip.vision.projector.scale_factor": 4,
          "clip.vision.image_size": S, "clip.vision.patch_size": P,
          "clip.vision.embedding_length": D,
          "clip.vision.block_count": 1,
          "clip.vision.attention.head_count": 4,
          "clip.vision.feed_forward_length": 2 * D,
          "clip.vision.attention.layer_norm_epsilon": 1e-6,
          "clip.vision.projection_dim": proj_d}
    path = str(tmp_path / "g3.gguf")
    write_gguf(path, md, tensors)

    cfg, params = load_clip(path)
    assert cfg.projector == "gemma3" and cfg.proj_scale == 4
    px = rng.standard_normal((S, S, 3)).astype(np.float32)
    got = np.asarray(encode_image(params, cfg, px))[0]
    assert got.shape == ((g // 4) ** 2, proj_d)    # 4 soft tokens

    # numpy pipeline
    r = _R(path)
    la = lambda n: r.load_array(n)
    import math as _m
    erf = np.vectorize(_m.erf)
    patches = px.reshape(g, P, g, P, 3).transpose(0, 2, 4, 1, 3)
    patches = patches.reshape(g * g, 3 * P * P)
    x = patches @ la("v.patch_embd.weight").reshape(D, -1).T \
        + la("v.patch_embd.bias")
    x = x + la("v.position_embd.weight")

    def ln(v, wt, bi):
        m = v.mean(-1, keepdims=True)
        va = ((v - m) ** 2).mean(-1, keepdims=True)
        return (v - m) / np.sqrt(va + cfg.norm_eps) * wt + bi

    p = "v.blk.0."
    rr = ln(x, la(p + "ln1.weight"), la(p + "ln1.bias"))
    h, hd = 4, D // 4
    q = (rr @ la(p + "attn_q.weight").T + la(p + "attn_q.bias")).reshape(-1, h, hd)
    k = (rr @ la(p + "attn_k.weight").T + la(p + "attn_k.bias")).reshape(-1, h, hd)
    v = (rr @ la(p + "attn_v.weight").T + la(p + "attn_v.bias")).reshape(-1, h, hd)
    sc = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    pr = np.exp(sc - sc.max(-1, keepdims=True))
    pr /= pr.sum(-1, keepdims=True)
    att = np.einsum("hqk,khd->qhd", pr, v).reshape(-1, D)
    x = x + att @ la(p + "attn_out.weight").T + la(p + "attn_out.bias")
    rr = ln(x, la(p + "ln2.weight"), la(p + "ln2.bias"))
    rr = rr @ la(p + "ffn_up.weight").T + la(p + "ffn_up.bias")
    rr = 0.5 * rr * (1 + erf(rr / np.sqrt(2)))
    x = x + rr @ la(p + "ffn_down.weight").T + la(p + "ffn_down.bias")
    x = ln(x, la("v.post_ln.weight"), la("v.post_ln.bias"))
    x = x.reshape(2, 4, 2, 4, D).mean(axis=(1, 3)).reshape(4, D)
    x = x / np.sqrt(np.mean(x * x, -1, keepdims=True) + cfg.norm_eps) \
        * la("mm.soft_emb_norm.weight")
    ref = x @ la("mm.input_projection.weight").T
    r.close()
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 1e-3, \
        np.max(np.abs(got - ref)) / denom
