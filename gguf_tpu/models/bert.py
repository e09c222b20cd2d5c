"""BERT-family encoders (llama.cpp arch bert / nomic-bert): embedding
models — bge, all-MiniLM, nomic-embed-text.

Post-LN bidirectional transformer over learned (bert) or rotary
(nomic-bert) positions:

    x = LN(tok_embd + token_type_0 + pos_embd)
    per block: x = LN(x + attn(x));  x = LN(x + ffn(x))

with biased q/k/v/o projections, GELU (bert) or SwiGLU (nomic) FFN, and
padding masked out of the attention scores (no causal mask, no KV
cache — one bidirectional pass, then pooling in the engine). Reference
lineage: llama.cpp build_bert / LLM_ARCH_BERT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import LlamaConfig


def load_bert(reader, cfg: LlamaConfig):
    """bert tensor schema -> params dict (all f32; encoders are small)."""
    import jax.numpy as jnp

    t = lambda n: jnp.asarray(reader.dequantize(n), jnp.float32)
    has = lambda n: n in reader.tensors
    params = {
        "token_embd": t("token_embd.weight"),
        "embd_norm": (t("token_embd_norm.weight"),
                      t("token_embd_norm.bias")),
        "token_types": t("token_types.weight")
        if has("token_types.weight") else None,
        "pos_embd": t("position_embd.weight")
        if has("position_embd.weight") else None,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer = {
            "q": (t(p + "attn_q.weight"), t(p + "attn_q.bias")
                  if has(p + "attn_q.bias") else None),
            "k": (t(p + "attn_k.weight"), t(p + "attn_k.bias")
                  if has(p + "attn_k.bias") else None),
            "v": (t(p + "attn_v.weight"), t(p + "attn_v.bias")
                  if has(p + "attn_v.bias") else None),
            "o": (t(p + "attn_output.weight"),
                  t(p + "attn_output.bias")
                  if has(p + "attn_output.bias") else None),
            "attn_norm": (t(p + "attn_output_norm.weight"),
                          t(p + "attn_output_norm.bias")),
            "up": (t(p + "ffn_up.weight"), t(p + "ffn_up.bias")
                   if has(p + "ffn_up.bias") else None),
            "down": (t(p + "ffn_down.weight"), t(p + "ffn_down.bias")
                     if has(p + "ffn_down.bias") else None),
            "out_norm": (t(p + "layer_output_norm.weight"),
                         t(p + "layer_output_norm.bias")),
        }
        if has(p + "ffn_gate.weight"):   # nomic-bert SwiGLU
            layer["gate"] = (t(p + "ffn_gate.weight"), None)
        params["layers"].append(layer)
    if has("cls.weight"):   # reranker classification head (pooling rank)
        params["cls"] = (t("cls.weight"), t("cls.bias")
                         if has("cls.bias") else None)
        if has("cls.output.weight"):   # optional second projection
            params["cls_out"] = (t("cls.output.weight"),
                                 t("cls.output.bias")
                                 if has("cls.output.bias") else None)
    return params


def rank_scores(params, cfg: LlamaConfig, hidden) -> "jax.Array":
    """Reranker head: CLS hidden state -> relevance score per sequence
    (llama.cpp pooling RANK: cls [+ tanh + cls.output])."""
    x = hidden[:, 0, :]                  # CLS row
    x = _lin(params["cls"], x)
    if "cls_out" in params:
        x = _lin(params["cls_out"], jnp.tanh(x))
    return x[:, 0]


def _ln(x, wb, eps):
    """(weight, bias)-tuple adapter over the shared LayerNorm."""
    from .llama import layer_norm

    return layer_norm(x, wb[0], wb[1], eps)


def _lin(wb, x):
    w, b = wb
    out = x @ w.T
    return out + b if b is not None else out


def bert_forward(params, cfg: LlamaConfig, tokens, lengths):
    """tokens (B, T) padded, lengths (B,) -> final hidden states
    (B, T, dim) f32. Pad positions are masked out of every attention
    score; pooling happens in the caller with the same mask."""
    b, t = tokens.shape
    x = params["token_embd"][tokens.reshape(-1)].reshape(b, t, -1)
    if params["token_types"] is not None:
        x = x + params["token_types"][0][None, None, :]
    if params["pos_embd"] is not None:
        x = x + params["pos_embd"][None, :t, :]
    x = _ln(x, params["embd_norm"], cfg.norm_eps)

    h, hd = cfg.n_heads, cfg.dim // cfg.n_heads
    valid = jnp.arange(t)[None, :] < lengths[:, None]          # (B, T)
    bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]   # (B,1,1,T)

    if params["pos_embd"] is None:   # nomic-bert: rotary positions
        from .llama import apply_rope, rope_cos_sin

        cos, sin = rope_cos_sin(jnp.arange(t)[None, :],
                                cfg.rope_dim or hd, cfg.rope_theta)

    for lyr in params["layers"]:
        q = _lin(lyr["q"], x).reshape(b, t, h, hd)
        k = _lin(lyr["k"], x).reshape(b, t, h, hd)
        v = _lin(lyr["v"], x).reshape(b, t, h, hd)
        if params["pos_embd"] is None:
            q = apply_rope(q, cos[:, :, None, :], sin[:, :, None, :],
                           neox=True)
            k = apply_rope(k, cos[:, :, None, :], sin[:, :, None, :],
                           neox=True)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(hd))
        pr = jax.nn.softmax(sc + bias, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, -1)
        x = _ln(x + _lin(lyr["o"], att), lyr["attn_norm"], cfg.norm_eps)
        u = _lin(lyr["up"], x)
        if "gate" in lyr:   # nomic SwiGLU
            act = jax.nn.silu(_lin(lyr["gate"], x)) * u
        else:
            act = jax.nn.gelu(u, approximate=False)
        x = _ln(x + _lin(lyr["down"], act), lyr["out_norm"], cfg.norm_eps)
    return x


def write_random_bert_gguf(path: str, cfg: LlamaConfig, seed: int = 0,
                           extra_metadata: dict | None = None,
                           arch: str = "bert") -> None:
    """Random bert-schema GGUF (tests). arch='nomic-bert' swaps learned
    positions for rope and GELU for SwiGLU."""
    import numpy as np

    from ..gguf import GGMLType
    from ..gguf.writer import write_gguf

    rng = np.random.default_rng(seed)
    d, f, v = cfg.dim, cfg.ffn_dim, cfg.vocab_size
    s = 0.5 / np.sqrt(d)
    w = lambda *sh: (rng.standard_normal(sh) * s).astype(np.float32)
    nrm = lambda n: (1 + 0.1 * rng.standard_normal(n)).astype(np.float32)
    f32 = lambda arr: (GGMLType.F32, arr.shape, arr)
    nomic = arch == "nomic-bert"
    tensors = {
        "token_embd.weight": f32(w(v, d)),
        "token_embd_norm.weight": f32(nrm(d)),
        "token_embd_norm.bias": f32(w(d)),
        "token_types.weight": f32(w(2, d)),
    }
    if not nomic:
        tensors["position_embd.weight"] = f32(w(cfg.max_seq_len, d))
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        for name, shape in (("attn_q", (d, d)), ("attn_k", (d, d)),
                            ("attn_v", (d, d)), ("attn_output", (d, d)),
                            ("ffn_up", (f, d)), ("ffn_down", (d, f))):
            tensors[p + name + ".weight"] = f32(w(*shape))
            tensors[p + name + ".bias"] = f32(w(shape[0]))
        if nomic:
            tensors[p + "ffn_gate.weight"] = f32(w(f, d))
        for name in ("attn_output_norm", "layer_output_norm"):
            tensors[p + name + ".weight"] = f32(nrm(d))
            tensors[p + name + ".bias"] = f32(w(d))
    if cfg.pooling == "rank":   # reranker cls head
        tensors["cls.weight"] = f32(w(1, d))
        tensors["cls.bias"] = f32(w(1))
    md = cfg.to_gguf_metadata(arch)
    md.update(extra_metadata or {})
    write_gguf(path, md, tensors)
