"""HuggingFace checkpoint -> GGUF converter (llama.cpp convert_hf parity
for the llama/mistral/qwen2/qwen3 families).

Reads a HF model directory directly — config.json, *.safetensors (parsed
natively: the format is an 8-byte little-endian header length, a JSON
tensor table, then raw data; no safetensors dependency), tokenizer.json
(both Unigram/SPM and byte-level-BPE fast-tokenizer layouts) — and
writes a llama.cpp-schema GGUF v3 with the weights quantized to the
requested format.

The critical transform is the rope permutation: HF checkpoints store
q_proj/k_proj for rotate-half rope (x1 = first half, x2 = second half of
each head), while GGUF/llama.cpp use interleaved pairs. Rows of wq/wk
are permuted head-by-head — reshape (heads, 2, hd/2, in), swap the
middle axes — exactly llama.cpp's convert permute().
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from ..gguf import GGMLType
from ..gguf.writer import quantize_tensor, write_gguf


def read_safetensors(path: str) -> dict:
    """*.safetensors -> {name: np.ndarray} (F32/F16/BF16/I32 supported)."""
    out = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        data = np.memmap(path, dtype=np.uint8, mode="r")
        for name, info in header.items():
            if name == "__metadata__":
                continue
            dt = info["dtype"]
            lo, hi = info["data_offsets"]
            raw = np.asarray(data[base + lo:base + hi])
            if dt == "F32":
                arr = raw.view(np.float32)
            elif dt == "F16":
                arr = raw.view(np.float16).astype(np.float32)
            elif dt == "BF16":
                # bf16 = top 16 bits of f32
                u = raw.view(np.uint16).astype(np.uint32) << 16
                arr = u.view(np.float32)
            elif dt in ("I32", "I64"):
                arr = raw.view(np.int32 if dt == "I32" else np.int64)
            else:
                raise ValueError(f"unsupported safetensors dtype {dt}")
            out[name] = arr.reshape(info["shape"]).copy()
    return out


def load_hf_weights(model_dir: str) -> dict:
    """All *.safetensors shards in a HF directory, merged."""
    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors in {model_dir}")
    weights = {}
    for f in files:
        weights.update(read_safetensors(os.path.join(model_dir, f)))
    return weights


def permute_rope(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF rotate-half -> GGUF interleaved rope ordering (llama.cpp
    convert permute): rows regrouped per head from [first-half dims,
    second-half dims] to interleaved pairs."""
    m, k = w.shape
    hd = m // n_heads
    return (w.reshape(n_heads, 2, hd // 2, k)
            .transpose(0, 2, 1, 3).reshape(m, k))


def tokenizer_metadata(model_dir: str) -> dict:
    """tokenizer.json (HF fast tokenizer) -> tokenizer.ggml.* metadata.
    Unigram models map to the SPM schema (pieces + scores), byte-level
    BPE to the gpt2 schema (tokens + merges)."""
    path = os.path.join(model_dir, "tokenizer.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        tj = json.load(f)
    model = tj.get("model", {})
    md: dict = {}
    cfg_path = os.path.join(model_dir, "tokenizer_config.json")
    tok_cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            tok_cfg = json.load(f)

    if model.get("type") == "Unigram":
        vocab = model["vocab"]                    # [[piece, score], ...]
        md["tokenizer.ggml.model"] = "llama"
        md["tokenizer.ggml.tokens"] = [p for p, _ in vocab]
        md["tokenizer.ggml.scores"] = np.asarray(
            [s for _, s in vocab], np.float32)
    elif model.get("type") == "BPE":
        vocab = model["vocab"]                    # {token: id}
        tokens = [None] * len(vocab)
        for t, i in vocab.items():
            tokens[i] = t
        merges = model.get("merges", [])
        md["tokenizer.ggml.model"] = "gpt2"
        md["tokenizer.ggml.tokens"] = tokens
        md["tokenizer.ggml.merges"] = [
            m if isinstance(m, str) else " ".join(m) for m in merges]
        # pre-tokenizer family from the HF regex (llama.cpp stores a
        # name; the serving tokenizer bounds merges by it)
        pt = json.dumps(tj.get("pre_tokenizer") or {})
        if "{1,3}" in pt:
            md["tokenizer.ggml.pre"] = "llama-bpe"
        elif "\\p{N}" in pt or "\\d" in pt:
            md["tokenizer.ggml.pre"] = "qwen2"
        else:
            md["tokenizer.ggml.pre"] = "gpt-2"
    else:
        return {}

    tokens = md["tokenizer.ggml.tokens"]
    index = {t: i for i, t in enumerate(tokens)}

    def tok_id(name, *cands):
        v = tok_cfg.get(name)
        if isinstance(v, dict):
            v = v.get("content")
        for c in (v, *cands):
            if c in index:
                return index[c]
        return None

    for key, name, cands in (
            ("bos_token_id", "bos_token", ("<s>", "<|begin_of_text|>")),
            ("eos_token_id", "eos_token", ("</s>", "<|end_of_text|>",
                                          "<|im_end|>")),
            ("unknown_token_id", "unk_token", ("<unk>",))):
        tid = tok_id(name, *cands)
        if tid is not None:
            md[f"tokenizer.ggml.{key}"] = tid
    if isinstance(tok_cfg.get("chat_template"), str):
        md["tokenizer.chat_template"] = tok_cfg["chat_template"]
    return md


# HF model_type -> GGUF architecture. Mixtral GGUFs are arch "llama"
# with llama.expert_count set (llama.cpp's convention).
_ARCHS = {"llama": "llama", "mistral": "llama", "mixtral": "llama",
          "qwen2": "qwen2", "qwen3": "qwen3", "qwen3_moe": "qwen3moe",
          "qwen2_moe": "qwen2moe",
          "gemma": "gemma", "gemma2": "gemma2",
          "gemma3_text": "gemma3", "gemma3": "gemma3", "phi3": "phi3",
          "phi": "phi2",
          "deepseek_v2": "deepseek2", "deepseek_v3": "deepseek2",
          "cohere": "command-r", "olmo2": "olmo2",
          "starcoder2": "starcoder2", "granite": "granite",
          "mamba": "mamba", "bert": "bert", "t5": "t5",
          "gpt2": "gpt2"}


def _convert_t5(hf: dict, weights: dict, md: dict, out_path: str,
                fmt: str) -> dict:
    """HF T5ForConditionalGeneration -> llama.cpp t5 GGUF schema
    (enc./dec. prefixes, rel_b on block 0, gated wi_0/wi_1 or plain
    wi)."""
    f32 = lambda w: (GGMLType.F32, w.shape,
                     np.ascontiguousarray(w, np.float32))

    def get(name):
        if name not in weights:
            raise KeyError(f"missing HF tensor {name}")
        return weights[name]

    n_heads = int(hf["num_heads"])
    md.update({
        "t5.embedding_length": hf["d_model"],
        "t5.block_count": hf["num_layers"],
        "t5.decoder_block_count": hf.get("num_decoder_layers",
                                         hf["num_layers"]),
        "t5.attention.head_count": n_heads,
        "t5.attention.key_length": hf.get("d_kv",
                                          hf["d_model"] // n_heads),
        "t5.attention.value_length": hf.get("d_kv",
                                            hf["d_model"] // n_heads),
        "t5.feed_forward_length": hf["d_ff"],
        "t5.attention.layer_norm_rms_epsilon": float(
            hf.get("layer_norm_epsilon", 1e-6)),
        "t5.attention.relative_buckets_count": int(
            hf.get("relative_attention_num_buckets", 32)),
        "t5.decoder_start_token_id": int(
            hf.get("decoder_start_token_id", 0)),
        "t5.context_length": hf.get("n_positions", 512),
        "t5.vocab_size": hf["vocab_size"],
    })
    tensors = {
        "token_embd.weight": f32(get("shared.weight")),
        "enc.output_norm.weight": f32(
            get("encoder.final_layer_norm.weight")),
        "dec.output_norm.weight": f32(
            get("decoder.final_layer_norm.weight")),
    }
    if "lm_head.weight" in weights:   # t5 v1.1/flan: untied head
        tensors["output.weight"] = f32(weights["lm_head.weight"])

    def ffn(hp, p):
        if hp + "DenseReluDense.wi_0.weight" in weights:   # gated
            tensors[p + "ffn_gate.weight"] = f32(
                get(hp + "DenseReluDense.wi_0.weight"))
            tensors[p + "ffn_up.weight"] = f32(
                get(hp + "DenseReluDense.wi_1.weight"))
        else:
            tensors[p + "ffn_up.weight"] = f32(
                get(hp + "DenseReluDense.wi.weight"))
        tensors[p + "ffn_down.weight"] = f32(
            get(hp + "DenseReluDense.wo.weight"))
        tensors[p + "ffn_norm.weight"] = f32(get(hp + "layer_norm.weight"))

    for i in range(int(hf["num_layers"])):
        hp = f"encoder.block.{i}."
        p = f"enc.blk.{i}."
        for hn, gn in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                       ("o", "attn_o")):
            tensors[p + gn + ".weight"] = f32(
                get(hp + f"layer.0.SelfAttention.{hn}.weight"))
        tensors[p + "attn_norm.weight"] = f32(
            get(hp + "layer.0.layer_norm.weight"))
        if i == 0:
            # HF stores (buckets, heads); the llama.cpp GGUF layout the
            # loader expects is the same numpy orientation
            tensors[p + "attn_rel_b.weight"] = f32(get(
                hp + "layer.0.SelfAttention.relative_attention_bias"
                ".weight"))
        ffn(hp + "layer.1.", p)
    for i in range(int(hf.get("num_decoder_layers", hf["num_layers"]))):
        hp = f"decoder.block.{i}."
        p = f"dec.blk.{i}."
        for hn, gn in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                       ("o", "attn_o")):
            tensors[p + gn + ".weight"] = f32(
                get(hp + f"layer.0.SelfAttention.{hn}.weight"))
        tensors[p + "attn_norm.weight"] = f32(
            get(hp + "layer.0.layer_norm.weight"))
        if i == 0:
            tensors[p + "attn_rel_b.weight"] = f32(get(
                hp + "layer.0.SelfAttention.relative_attention_bias"
                ".weight"))
        for hn, gn in (("q", "cross_attn_q"), ("k", "cross_attn_k"),
                       ("v", "cross_attn_v"), ("o", "cross_attn_o")):
            tensors[p + gn + ".weight"] = f32(
                get(hp + f"layer.1.EncDecAttention.{hn}.weight"))
        tensors[p + "cross_attn_norm.weight"] = f32(
            get(hp + "layer.1.layer_norm.weight"))
        ffn(hp + "layer.2.", p)
    write_gguf(out_path, md, tensors)
    return md


def _wordpiece_metadata(model_dir: str) -> dict:
    """tokenizer.json (WordPiece model) -> tokenizer.ggml.* bert schema."""
    path = os.path.join(model_dir, "tokenizer.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        tj = json.load(f)
    model = tj.get("model", {})
    if model.get("type") != "WordPiece":
        return {}
    vocab = model["vocab"]                    # {token: id}
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    index = {t: i for i, t in enumerate(tokens)}
    md = {"tokenizer.ggml.model": "bert",
          "tokenizer.ggml.tokens": tokens}
    for key, name in (("cls_token_id", "[CLS]"),
                      ("seperator_token_id", "[SEP]"),
                      ("unknown_token_id", "[UNK]"),
                      ("padding_token_id", "[PAD]"),
                      ("mask_token_id", "[MASK]")):
        if name in index:
            md[f"tokenizer.ggml.{key}"] = index[name]
    return md


def _convert_bert(hf: dict, weights: dict, model_dir: str, out_path: str,
                  fmt: str) -> dict:
    """HF BertModel -> llama.cpp bert GGUF (embedding encoder). Handles
    both bare and 'bert.'-prefixed state dicts; everything stays F32
    (encoders are small)."""
    pre = "bert." if "bert.embeddings.word_embeddings.weight" in weights \
        else ""

    def get(name):
        if pre + name not in weights:
            raise KeyError(f"missing HF tensor {pre}{name}")
        return weights[pre + name]

    f32 = lambda w: (GGMLType.F32, w.shape,
                     np.ascontiguousarray(w, np.float32))
    md = {
        "general.architecture": "bert",
        "general.name": os.path.basename(os.path.abspath(model_dir)),
        "bert.vocab_size": hf["vocab_size"],
        "bert.embedding_length": hf["hidden_size"],
        "bert.block_count": hf["num_hidden_layers"],
        "bert.attention.head_count": hf["num_attention_heads"],
        "bert.attention.head_count_kv": hf["num_attention_heads"],
        "bert.feed_forward_length": hf["intermediate_size"],
        "bert.attention.layer_norm_epsilon": float(
            hf.get("layer_norm_eps", 1e-12)),
        "bert.context_length": hf.get("max_position_embeddings", 512),
        "bert.attention.causal": False,
        "bert.pooling_type": 1,   # sentence-transformers default: mean
    }
    md.update(_wordpiece_metadata(model_dir))
    tensors = {
        "token_embd.weight": f32(get("embeddings.word_embeddings.weight")),
        "token_types.weight": f32(
            get("embeddings.token_type_embeddings.weight")),
        "position_embd.weight": f32(
            get("embeddings.position_embeddings.weight")),
        "token_embd_norm.weight": f32(get("embeddings.LayerNorm.weight")),
        "token_embd_norm.bias": f32(get("embeddings.LayerNorm.bias")),
    }
    for i in range(int(hf["num_hidden_layers"])):
        hp = f"encoder.layer.{i}."
        p = f"blk.{i}."
        for hn, gn in (("attention.self.query", "attn_q"),
                       ("attention.self.key", "attn_k"),
                       ("attention.self.value", "attn_v"),
                       ("attention.output.dense", "attn_output"),
                       ("intermediate.dense", "ffn_up"),
                       ("output.dense", "ffn_down")):
            tensors[p + gn + ".weight"] = f32(get(hp + hn + ".weight"))
            tensors[p + gn + ".bias"] = f32(get(hp + hn + ".bias"))
        tensors[p + "attn_output_norm.weight"] = f32(
            get(hp + "attention.output.LayerNorm.weight"))
        tensors[p + "attn_output_norm.bias"] = f32(
            get(hp + "attention.output.LayerNorm.bias"))
        tensors[p + "layer_output_norm.weight"] = f32(
            get(hp + "output.LayerNorm.weight"))
        tensors[p + "layer_output_norm.bias"] = f32(
            get(hp + "output.LayerNorm.bias"))
    write_gguf(out_path, md, tensors)
    return md


def _convert_mamba(hf: dict, weights: dict, md: dict, out_path: str,
                   fmt: str) -> dict:
    """HF MambaForCausalLM (backbone.*) -> llama.cpp mamba GGUF schema.
    Big projections (in/out) quantize; the small SSM tensors stay F32
    (llama.cpp's quantizer skips them too)."""
    import math

    target = GGMLType[fmt.upper()]
    d = int(hf["hidden_size"])
    di = int(hf.get("intermediate_size") or 2 * d)
    ds = int(hf.get("state_size", 16))
    dc = int(hf.get("conv_kernel", 4))
    dr = hf.get("time_step_rank", "auto")
    dr = int(math.ceil(d / 16)) if dr in (None, "auto") else int(dr)
    md.update({
        "mamba.ssm.inner_size": di, "mamba.ssm.state_size": ds,
        "mamba.ssm.conv_kernel": dc, "mamba.ssm.time_step_rank": dr,
        "mamba.attention.head_count": 0,
        "mamba.attention.head_count_kv": 0,
        "mamba.feed_forward_length": 0,
        "mamba.attention.layer_norm_rms_epsilon": float(
            hf.get("layer_norm_epsilon", 1e-5)),
    })

    def get(name):
        if name not in weights:
            raise KeyError(f"missing HF tensor {name}")
        return weights[name]

    def q(name, w):
        w = np.ascontiguousarray(w, np.float32)
        tensors[name] = (target, w.shape, quantize_tensor(w, target))

    def f32(name, w):
        w = np.ascontiguousarray(w, np.float32)
        tensors[name] = (GGMLType.F32, w.shape, w)

    tensors: dict = {}
    q("token_embd.weight", get("backbone.embeddings.weight"))
    f32("output_norm.weight", get("backbone.norm_f.weight"))
    if "lm_head.weight" in weights:
        q("output.weight", weights["lm_head.weight"])
    for i in range(int(hf["num_hidden_layers"])):
        hp = f"backbone.layers.{i}."
        p = f"blk.{i}."
        f32(p + "attn_norm.weight", get(hp + "norm.weight"))
        q(p + "ssm_in.weight", get(hp + "mixer.in_proj.weight"))
        f32(p + "ssm_conv1d.weight",
            get(hp + "mixer.conv1d.weight").reshape(di, dc))
        f32(p + "ssm_conv1d.bias", get(hp + "mixer.conv1d.bias"))
        f32(p + "ssm_x.weight", get(hp + "mixer.x_proj.weight"))
        f32(p + "ssm_dt.weight", get(hp + "mixer.dt_proj.weight"))
        f32(p + "ssm_dt.bias", get(hp + "mixer.dt_proj.bias"))
        f32(p + "ssm_a", get(hp + "mixer.A_log"))
        f32(p + "ssm_d", get(hp + "mixer.D"))
        q(p + "ssm_out.weight", get(hp + "mixer.out_proj.weight"))
    write_gguf(out_path, md, tensors)
    return md


def convert_hf(model_dir: str, out_path: str, fmt: str = "q4_k") -> dict:
    """Convert a HF llama-family checkpoint directory to GGUF. Returns the
    metadata written (for inspection/tests)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "llama")
    if mt == "gemma3" and "text_config" in hf:
        # multimodal gemma3 configs nest the LM under text_config
        hf = {**hf["text_config"], "model_type": "gemma3"}
    if mt not in _ARCHS:
        raise ValueError(f"unsupported model_type {mt!r} "
                         f"(supported: {sorted(_ARCHS)})")
    arch = _ARCHS[mt]

    if arch == "bert":    # encoder: different tensor tree + WordPiece vocab
        return _convert_bert(hf, load_hf_weights(model_dir), model_dir,
                             out_path, fmt)

    if arch == "gpt2":    # learned positions; HF Conv1D stores W transposed
        weights = load_hf_weights(model_dir)
        if any(k.startswith("transformer.") for k in weights):
            weights = {k[len("transformer."):] if
                       k.startswith("transformer.") else k: v
                       for k, v in weights.items()}
        target = GGMLType[fmt.upper()]

        def get(name):
            if name not in weights:
                raise KeyError(f"missing HF tensor {name}")
            return weights[name]

        f32 = lambda w: (GGMLType.F32, w.shape,
                         np.ascontiguousarray(w, np.float32))

        def q(w):
            w = np.ascontiguousarray(w, np.float32)
            if w.shape[-1] % 32:
                return f32(w)
            return (target, w.shape, quantize_tensor(w, target))

        dim = hf["n_embd"]
        md = {
            "general.architecture": "gpt2",
            "general.name": os.path.basename(os.path.abspath(model_dir)),
            "gpt2.vocab_size": hf["vocab_size"],
            "gpt2.embedding_length": dim,
            "gpt2.block_count": hf["n_layer"],
            "gpt2.attention.head_count": hf["n_head"],
            "gpt2.attention.head_count_kv": hf["n_head"],
            "gpt2.feed_forward_length": hf.get("n_inner") or 4 * dim,
            "gpt2.attention.layer_norm_epsilon": float(
                hf.get("layer_norm_epsilon", 1e-5)),
            "gpt2.context_length": hf.get("n_positions", 1024),
        }
        md.update(tokenizer_metadata(model_dir))
        tensors = {
            "token_embd.weight": q(get("wte.weight")),
            "position_embd.weight": f32(get("wpe.weight")),
            "output_norm.weight": f32(get("ln_f.weight")),
            "output_norm.bias": f32(get("ln_f.bias")),
        }
        for i in range(int(hf["n_layer"])):
            hp = f"h.{i}."
            p2 = f"blk.{i}."
            tensors[p2 + "attn_norm.weight"] = f32(get(hp + "ln_1.weight"))
            tensors[p2 + "attn_norm.bias"] = f32(get(hp + "ln_1.bias"))
            tensors[p2 + "ffn_norm.weight"] = f32(get(hp + "ln_2.weight"))
            tensors[p2 + "ffn_norm.bias"] = f32(get(hp + "ln_2.bias"))
            # HF Conv1D: weight is (in, out) — transpose to (out, in)
            tensors[p2 + "attn_qkv.weight"] = q(
                get(hp + "attn.c_attn.weight").T)
            tensors[p2 + "attn_qkv.bias"] = f32(get(hp + "attn.c_attn.bias"))
            tensors[p2 + "attn_output.weight"] = q(
                get(hp + "attn.c_proj.weight").T)
            tensors[p2 + "attn_output.bias"] = f32(
                get(hp + "attn.c_proj.bias"))
            tensors[p2 + "ffn_up.weight"] = q(get(hp + "mlp.c_fc.weight").T)
            tensors[p2 + "ffn_up.bias"] = f32(get(hp + "mlp.c_fc.bias"))
            tensors[p2 + "ffn_down.weight"] = q(
                get(hp + "mlp.c_proj.weight").T)
            tensors[p2 + "ffn_down.bias"] = f32(get(hp + "mlp.c_proj.bias"))
        write_gguf(out_path, md, tensors)
        return md

    if arch == "phi2":    # fused qkv + biased LayerNorms, parallel blocks
        weights = load_hf_weights(model_dir)
        target = GGMLType[fmt.upper()]

        def get(name):
            if name not in weights:
                raise KeyError(f"missing HF tensor {name}")
            return weights[name]

        f32 = lambda w: (GGMLType.F32, w.shape,
                         np.ascontiguousarray(w, np.float32))
        q = lambda w: (target, w.shape,
                       quantize_tensor(
                           np.ascontiguousarray(w, np.float32), target))
        n_heads = hf["num_attention_heads"]
        dim = hf["hidden_size"]
        hd = dim // n_heads
        md = {
            "general.architecture": "phi2",
            "general.name": os.path.basename(os.path.abspath(model_dir)),
            "phi2.vocab_size": hf["vocab_size"],
            "phi2.embedding_length": dim,
            "phi2.block_count": hf["num_hidden_layers"],
            "phi2.attention.head_count": n_heads,
            "phi2.attention.head_count_kv": hf.get("num_key_value_heads",
                                                   n_heads),
            "phi2.feed_forward_length": hf["intermediate_size"],
            "phi2.attention.layer_norm_epsilon": float(
                hf.get("layer_norm_eps", 1e-5)),
            "phi2.rope.freq_base": hf.get("rope_theta", 10000.0),
            "phi2.context_length": hf.get("max_position_embeddings", 2048),
            # phi-2 partial rotary: 0.4 * head_dim = 32 dims rotate
            "phi2.rope.dimension_count": int(
                hf.get("partial_rotary_factor", 0.4) * hd),
        }
        md.update(tokenizer_metadata(model_dir))
        tensors = {
            "token_embd.weight": q(get("model.embed_tokens.weight")),
            "output_norm.weight": f32(get("model.final_layernorm.weight")),
            "output_norm.bias": f32(get("model.final_layernorm.bias")),
            "output.weight": q(get("lm_head.weight")),
            "output.bias": f32(get("lm_head.bias")),
        }
        for i in range(int(hf["num_hidden_layers"])):
            hp = f"model.layers.{i}."
            p2 = f"blk.{i}."
            tensors[p2 + "attn_norm.weight"] = f32(
                get(hp + "input_layernorm.weight"))
            tensors[p2 + "attn_norm.bias"] = f32(
                get(hp + "input_layernorm.bias"))
            tensors[p2 + "attn_qkv.weight"] = q(np.concatenate([
                get(hp + "self_attn.q_proj.weight"),
                get(hp + "self_attn.k_proj.weight"),
                get(hp + "self_attn.v_proj.weight")], axis=0))
            tensors[p2 + "attn_qkv.bias"] = f32(np.concatenate([
                get(hp + "self_attn.q_proj.bias"),
                get(hp + "self_attn.k_proj.bias"),
                get(hp + "self_attn.v_proj.bias")]))
            tensors[p2 + "attn_output.weight"] = q(
                get(hp + "self_attn.dense.weight"))
            tensors[p2 + "attn_output.bias"] = f32(
                get(hp + "self_attn.dense.bias"))
            tensors[p2 + "ffn_up.weight"] = q(get(hp + "mlp.fc1.weight"))
            tensors[p2 + "ffn_up.bias"] = f32(get(hp + "mlp.fc1.bias"))
            tensors[p2 + "ffn_down.weight"] = q(get(hp + "mlp.fc2.weight"))
            tensors[p2 + "ffn_down.bias"] = f32(get(hp + "mlp.fc2.bias"))
        write_gguf(out_path, md, tensors)
        return md

    if arch == "t5":      # encoder-decoder: enc./dec. tensor tree
        md = {"general.architecture": "t5",
              "general.name": os.path.basename(
                  os.path.abspath(model_dir))}
        md.update(tokenizer_metadata(model_dir))
        return _convert_t5(hf, load_hf_weights(model_dir), md, out_path,
                           fmt)

    if arch == "mamba":   # no attention geometry; backbone.* tensor names
        md = {
            "general.architecture": "mamba",
            "general.name": os.path.basename(os.path.abspath(model_dir)),
            "mamba.vocab_size": hf["vocab_size"],
            "mamba.embedding_length": hf["hidden_size"],
            "mamba.block_count": hf["num_hidden_layers"],
            "mamba.context_length": hf.get("max_position_embeddings",
                                           2 ** 20),
        }
        md.update(tokenizer_metadata(model_dir))
        return _convert_mamba(hf, load_hf_weights(model_dir), md,
                              out_path, fmt)

    n_heads = hf["num_attention_heads"]
    n_kv = hf.get("num_key_value_heads", n_heads)
    dim = hf["hidden_size"]
    head_dim = hf.get("head_dim") or dim // n_heads

    md = {
        "general.architecture": arch,
        "general.name": os.path.basename(os.path.abspath(model_dir)),
        f"{arch}.vocab_size": hf["vocab_size"],
        f"{arch}.embedding_length": dim,
        f"{arch}.block_count": hf["num_hidden_layers"],
        f"{arch}.attention.head_count": n_heads,
        f"{arch}.attention.head_count_kv": n_kv,
        f"{arch}.feed_forward_length": hf["intermediate_size"],
        f"{arch}.attention.layer_norm_rms_epsilon": (
            hf.get("rms_norm_eps") or hf.get("layer_norm_eps")
            or hf.get("norm_epsilon") or 1e-5),
        f"{arch}.rope.freq_base": hf.get("rope_theta", 10000.0),
        f"{arch}.context_length": hf.get("max_position_embeddings", 2048),
    }
    if head_dim != dim // n_heads:
        md[f"{arch}.attention.key_length"] = head_dim
        md[f"{arch}.attention.value_length"] = head_dim
    n_exp = int(hf.get("num_local_experts") or hf.get("num_experts")
                or hf.get("n_routed_experts") or 0)
    if n_exp:
        md[f"{arch}.expert_count"] = n_exp
        md[f"{arch}.expert_used_count"] = int(
            hf.get("num_experts_per_tok", 2))
        if hf.get("moe_intermediate_size"):
            md[f"{arch}.expert_feed_forward_length"] = int(
                hf["moe_intermediate_size"])
    first_dense = int(hf.get("first_k_dense_replace", 0) or 0)
    if arch == "deepseek2":
        # MLA geometry: key_length carries the full nope+rope qk width,
        # rope.dimension_count the rotary sub-dim (llama.cpp
        # DeepseekV2Model conversion schema)
        qk_nope = int(hf["qk_nope_head_dim"])
        qk_rope = int(hf["qk_rope_head_dim"])
        md[f"{arch}.attention.key_length"] = qk_nope + qk_rope
        md[f"{arch}.attention.value_length"] = int(hf["v_head_dim"])
        md[f"{arch}.rope.dimension_count"] = qk_rope
        md[f"{arch}.attention.kv_lora_rank"] = int(hf["kv_lora_rank"])
        if hf.get("q_lora_rank"):
            md[f"{arch}.attention.q_lora_rank"] = int(hf["q_lora_rank"])
        md[f"{arch}.leading_dense_block_count"] = first_dense
        md[f"{arch}.expert_shared_count"] = int(
            hf.get("n_shared_experts", 0) or 0)
        md[f"{arch}.expert_weights_scale"] = float(
            hf.get("routed_scaling_factor", 1.0) or 1.0)
        md[f"{arch}.expert_weights_norm"] = bool(
            hf.get("norm_topk_prob", False))
        md[f"{arch}.expert_gating_func"] = (
            2 if hf.get("scoring_func") == "sigmoid" else 1)
    if arch == "gemma2":
        if hf.get("attn_logit_softcapping"):
            md[f"{arch}.attn_logit_softcapping"] = float(
                hf["attn_logit_softcapping"])
        if hf.get("final_logit_softcapping"):
            md[f"{arch}.final_logit_softcapping"] = float(
                hf["final_logit_softcapping"])
    if hf.get("sliding_window") and arch in ("gemma2", "gemma3"):
        md[f"{arch}.attention.sliding_window"] = int(hf["sliding_window"])
    if arch == "gemma3" and hf.get("rope_local_base_freq"):
        # sliding layers rotate at their own short-context base
        md[f"{arch}.rope.freq_base_swa"] = float(hf["rope_local_base_freq"])
    if arch == "command-r" and hf.get("logit_scale"):
        md[f"{arch}.logit_scale"] = float(hf["logit_scale"])
    if arch == "granite":   # the four granite scalar multipliers
        for hk, gk in (("embedding_multiplier", "embedding_scale"),
                       ("residual_multiplier", "residual_scale"),
                       ("attention_multiplier", "attention.scale"),
                       ("logits_scaling", "logit_scale")):
            if hf.get(hk):
                md[f"{arch}.{gk}"] = float(hf[hk])

    rope_factor_tensors = {}
    rs = hf.get("rope_scaling") or {}
    rs_type = rs.get("rope_type", rs.get("type"))
    if rs_type == "linear":
        md[f"{arch}.rope.scaling.type"] = "linear"
        md[f"{arch}.rope.scaling.factor"] = float(rs.get("factor", 1.0))
    elif rs_type == "yarn":
        md[f"{arch}.rope.scaling.type"] = "yarn"
        md[f"{arch}.rope.scaling.factor"] = float(rs.get("factor", 1.0))
        md[f"{arch}.rope.scaling.original_context_length"] = int(
            rs.get("original_max_position_embeddings", 0))
        if rs.get("mscale_all_dim"):
            # DeepSeek yarn: llama.cpp's converter stores
            # 0.1 * mscale_all_dim as the log multiplier and the runtime
            # folds mscale^2 into the attention score scale
            md[f"{arch}.rope.scaling.yarn_log_multiplier"] = float(
                0.1 * float(rs["mscale_all_dim"]))
    elif rs_type == "llama3":
        # llama-3.1 NTK-by-parts: bake the per-dimension frequency
        # divisors into a rope_freqs tensor (llama.cpp
        # LlamaModel.generate_extra_tensors) — no runtime scaling kind
        import math

        factor = float(rs.get("factor", 8.0))
        low_f = float(rs.get("low_freq_factor", 1.0))
        high_f = float(rs.get("high_freq_factor", 4.0))
        old_ctx = int(rs.get("original_max_position_embeddings", 8192))
        base = float(hf.get("rope_theta", 10000.0))
        facs = []
        for i in range(0, head_dim, 2):
            wavelen = 2 * math.pi * base ** (i / head_dim)
            if wavelen < old_ctx / high_f:
                facs.append(1.0)
            elif wavelen > old_ctx / low_f:
                facs.append(factor)
            else:
                smooth = (old_ctx / wavelen - low_f) / (high_f - low_f)
                facs.append(1.0 / ((1.0 - smooth) / factor + smooth))
        rope_factor_tensors["rope_freqs.weight"] = np.asarray(
            facs, np.float32)
    elif rs_type in ("longrope", "su") or (
            "long_factor" in rs and "short_factor" in rs):
        # phi3 LongRoPE: factor tensors + the converter-computed
        # attention-magnitude scale sqrt(1 + ln(s)/ln(orig))
        import math

        orig = int(rs.get("original_max_position_embeddings",
                          hf.get("original_max_position_embeddings", 0)))
        maxp = hf.get("max_position_embeddings", orig)
        md[f"{arch}.rope.scaling.type"] = "longrope"
        md[f"{arch}.rope.scaling.original_context_length"] = orig
        if orig and maxp > orig:
            md[f"{arch}.rope.scaling.attn_factor"] = float(
                math.sqrt(1.0 + math.log(maxp / orig) / math.log(orig)))
        rope_factor_tensors["rope_factors_long.weight"] = np.asarray(
            rs["long_factor"], np.float32)
        rope_factor_tensors["rope_factors_short.weight"] = np.asarray(
            rs["short_factor"], np.float32)
    md.update(tokenizer_metadata(model_dir))

    weights = load_hf_weights(model_dir)
    if any(k.startswith(("language_model.", "model.language_model."))
           for k in weights):
        # real multimodal checkpoints (gemma3 vision+text) prefix the LM
        # weights; strip it so the text mapping below applies
        def _strip(k):
            if k.startswith("model.language_model."):
                return "model." + k[len("model.language_model."):]
            if k.startswith("language_model."):
                return k[len("language_model."):]
            return k

        weights = {_strip(k): v for k, v in weights.items()}
    target = GGMLType[fmt.upper()]
    granule = 256 if "_k" in fmt or fmt.startswith("iq") else 32
    head_fmt = (GGMLType.Q6_K if target in (GGMLType.Q4_K, GGMLType.Q5_K)
                else target)

    def put(tensors, name, w, t):
        w = np.ascontiguousarray(w, np.float32)
        if w.ndim < 2 or w.shape[-1] % granule:
            tensors[name] = (GGMLType.F32, w.shape, w)
        else:
            tensors[name] = (t, w.shape, quantize_tensor(w, t))

    def get(name):
        if name not in weights:
            raise KeyError(f"missing HF tensor {name}")
        return weights[name]

    # rope convention: llama/mistral/granite GGUFs use interleaved pairs
    # (ROPE_TYPE_NORM) and the converter must permute q/k into that
    # order; qwen/gemma/phi/olmo2/starcoder2 GGUFs keep the HF
    # rotate-half order and are served with NEOX rope (models/config.py
    # rope_neox); cohere checkpoints are ALREADY interleaved (their HF
    # rope is interleaved) so command-r needs NORM serving without any
    # permutation — llama.cpp's converter does exactly the same split
    permute = arch in ("llama", "granite")
    gemma = arch.startswith("gemma")
    # HF gemma RMSNorm computes x * (1 + w): llama.cpp's converter bakes
    # the +1 into every stored norm weight so serving uses plain RMSNorm
    norm_w = ((lambda w: w + 1.0) if gemma else (lambda w: w))

    tensors: dict = {}
    put(tensors, "token_embd.weight", get("model.embed_tokens.weight"),
        target)
    put(tensors, "output_norm.weight", norm_w(get("model.norm.weight")),
        GGMLType.F32)
    if "model.norm.bias" in weights:     # starcoder2 final LayerNorm bias
        put(tensors, "output_norm.bias", weights["model.norm.bias"],
            GGMLType.F32)
    if "lm_head.weight" in weights:
        put(tensors, "output.weight", weights["lm_head.weight"], head_fmt)
    # tied embeddings: omit output.weight, the loader shares token_embd
    for name, arr in rope_factor_tensors.items():
        tensors[name] = (GGMLType.F32, arr.shape, arr)

    for i in range(hf["num_hidden_layers"]):
        hp = f"model.layers.{i}."
        p = f"blk.{i}."
        if arch == "olmo2":
            # post-norm-only: HF post_attention/post_feedforward norms
            # ARE the branch-output norms; no pre-norms exist
            put(tensors, p + "post_attention_norm.weight",
                get(hp + "post_attention_layernorm.weight"), GGMLType.F32)
            put(tensors, p + "post_ffw_norm.weight",
                get(hp + "post_feedforward_layernorm.weight"), GGMLType.F32)
        elif arch in ("gemma2", "gemma3"):
            put(tensors, p + "attn_norm.weight",
                norm_w(get(hp + "input_layernorm.weight")), GGMLType.F32)
            # gemma2's four norms: post_attention is the POST-branch norm;
            # pre_feedforward is the llama-style ffn_norm
            put(tensors, p + "post_attention_norm.weight",
                norm_w(get(hp + "post_attention_layernorm.weight")),
                GGMLType.F32)
            put(tensors, p + "ffn_norm.weight",
                norm_w(get(hp + "pre_feedforward_layernorm.weight")),
                GGMLType.F32)
            put(tensors, p + "post_ffw_norm.weight",
                norm_w(get(hp + "post_feedforward_layernorm.weight")),
                GGMLType.F32)
        elif arch == "command-r":
            # one shared pre-norm feeds both parallel branches
            put(tensors, p + "attn_norm.weight",
                get(hp + "input_layernorm.weight"), GGMLType.F32)
        else:
            put(tensors, p + "attn_norm.weight",
                norm_w(get(hp + "input_layernorm.weight")), GGMLType.F32)
            put(tensors, p + "ffn_norm.weight",
                norm_w(get(hp + "post_attention_layernorm.weight")),
                GGMLType.F32)
            if arch == "starcoder2":   # biased LayerNorms
                put(tensors, p + "attn_norm.bias",
                    get(hp + "input_layernorm.bias"), GGMLType.F32)
                put(tensors, p + "ffn_norm.bias",
                    get(hp + "post_attention_layernorm.bias"), GGMLType.F32)

        if arch == "deepseek2":   # MLA projections, no rope permutation
            # (HF deepseek stores q_pe/k_pe interleaved — served with
            # ROPE_TYPE_NORM directly, llama.cpp DeepseekV2Model does not
            # permute either)
            if hp + "self_attn.q_a_proj.weight" in weights:
                put(tensors, p + "attn_q_a.weight",
                    get(hp + "self_attn.q_a_proj.weight"), target)
                put(tensors, p + "attn_q_a_norm.weight",
                    get(hp + "self_attn.q_a_layernorm.weight"),
                    GGMLType.F32)
                put(tensors, p + "attn_q_b.weight",
                    get(hp + "self_attn.q_b_proj.weight"), target)
            else:             # V2-Lite: direct q projection
                put(tensors, p + "attn_q.weight",
                    get(hp + "self_attn.q_proj.weight"), target)
            put(tensors, p + "attn_kv_a_mqa.weight",
                get(hp + "self_attn.kv_a_proj_with_mqa.weight"), target)
            put(tensors, p + "attn_kv_a_norm.weight",
                get(hp + "self_attn.kv_a_layernorm.weight"), GGMLType.F32)
            put(tensors, p + "attn_kv_b.weight",
                get(hp + "self_attn.kv_b_proj.weight"), target)
            put(tensors, p + "attn_output.weight",
                get(hp + "self_attn.o_proj.weight"), target)
            if n_exp and i >= first_dense:
                put(tensors, p + "ffn_gate_inp.weight",
                    get(hp + "mlp.gate.weight"), GGMLType.F32)
                if hp + "mlp.gate.e_score_correction_bias" in weights:
                    put(tensors, p + "exp_probs_b.bias",
                        weights[hp + "mlp.gate.e_score_correction_bias"],
                        GGMLType.F32)
                for g, s in (("gate", "gate"), ("up", "up"),
                             ("down", "down")):
                    put(tensors, p + f"ffn_{g}_exps.weight",
                        np.stack([get(hp + f"mlp.experts.{e}.{s}_proj"
                                      ".weight") for e in range(n_exp)]),
                        target)
                if hp + "mlp.shared_experts.gate_proj.weight" in weights:
                    for g in ("gate", "up", "down"):
                        put(tensors, p + f"ffn_{g}_shexp.weight",
                            get(hp + f"mlp.shared_experts.{g}_proj"
                                ".weight"), target)
            else:             # leading dense layer
                put(tensors, p + "ffn_gate.weight",
                    get(hp + "mlp.gate_proj.weight"), target)
                put(tensors, p + "ffn_up.weight",
                    get(hp + "mlp.up_proj.weight"), target)
                put(tensors, p + "ffn_down.weight",
                    get(hp + "mlp.down_proj.weight"), target)
            continue

        if arch == "phi3":   # fused qkv + fused [gate; up]
            put(tensors, p + "attn_qkv.weight",
                get(hp + "self_attn.qkv_proj.weight"), target)
            put(tensors, p + "attn_output.weight",
                get(hp + "self_attn.o_proj.weight"), target)
            put(tensors, p + "ffn_up.weight",
                get(hp + "mlp.gate_up_proj.weight"), target)
            put(tensors, p + "ffn_down.weight",
                get(hp + "mlp.down_proj.weight"), target)
            continue

        wq = get(hp + "self_attn.q_proj.weight")
        wk = get(hp + "self_attn.k_proj.weight")
        if permute:
            wq = permute_rope(wq, n_heads)
            wk = permute_rope(wk, n_kv)
        put(tensors, p + "attn_q.weight", wq, target)
        put(tensors, p + "attn_k.weight", wk, target)
        put(tensors, p + "attn_v.weight",
            get(hp + "self_attn.v_proj.weight"), target)
        put(tensors, p + "attn_output.weight",
            get(hp + "self_attn.o_proj.weight"), target)
        for hname, gname, nh in (("self_attn.q_proj.bias", "attn_q.bias",
                                  n_heads),
                                 ("self_attn.k_proj.bias", "attn_k.bias",
                                  n_kv),
                                 ("self_attn.v_proj.bias", "attn_v.bias",
                                  None)):
            if hp + hname in weights:        # qwen2 QKV biases
                b = weights[hp + hname]
                if permute and nh is not None:
                    b = permute_rope(b[:, None], nh)[:, 0]
                put(tensors, p + gname, b, GGMLType.F32)
        if hp + "self_attn.o_proj.bias" in weights:   # starcoder2
            put(tensors, p + "attn_output.bias",
                weights[hp + "self_attn.o_proj.bias"], GGMLType.F32)
        for hname, gname in (("self_attn.q_norm.weight", "attn_q_norm.weight"),
                             ("self_attn.k_norm.weight", "attn_k_norm.weight")):
            if hp + hname in weights:        # qwen3/olmo2/gemma3 QK-norm
                # gemma's (1+w) convention bakes into qk-norms too
                put(tensors, p + gname, norm_w(weights[hp + hname]),
                    GGMLType.F32)
        if arch == "starcoder2":   # gateless biased GELU FFN (c_fc/c_proj)
            put(tensors, p + "ffn_up.weight",
                get(hp + "mlp.c_fc.weight"), target)
            put(tensors, p + "ffn_up.bias",
                get(hp + "mlp.c_fc.bias"), GGMLType.F32)
            put(tensors, p + "ffn_down.weight",
                get(hp + "mlp.c_proj.weight"), target)
            put(tensors, p + "ffn_down.bias",
                get(hp + "mlp.c_proj.bias"), GGMLType.F32)
            continue
        if n_exp:
            # routed experts -> 3-D stacked GGUF tensors (leading E axis)
            if mt == "mixtral":  # w1=gate, w3=up, w2=down
                router = get(hp + "block_sparse_moe.gate.weight")
                en = [(f"block_sparse_moe.experts.{e}.w1.weight",
                       f"block_sparse_moe.experts.{e}.w3.weight",
                       f"block_sparse_moe.experts.{e}.w2.weight")
                      for e in range(n_exp)]
            else:                # qwen3_moe / qwen2_moe
                router = get(hp + "mlp.gate.weight")
                en = [(f"mlp.experts.{e}.gate_proj.weight",
                       f"mlp.experts.{e}.up_proj.weight",
                       f"mlp.experts.{e}.down_proj.weight")
                      for e in range(n_exp)]
            if hp + "mlp.shared_expert.gate_proj.weight" in weights:
                # qwen2_moe: sigmoid-gated shared expert beside the sum
                for g2 in ("gate", "up", "down"):
                    put(tensors, p + f"ffn_{g2}_shexp.weight",
                        get(hp + f"mlp.shared_expert.{g2}_proj.weight"),
                        target)
                put(tensors, p + "ffn_gate_inp_shexp.weight",
                    get(hp + "mlp.shared_expert_gate.weight"),
                    GGMLType.F32)
            put(tensors, p + "ffn_gate_inp.weight", router, GGMLType.F32)
            put(tensors, p + "ffn_gate_exps.weight",
                np.stack([get(hp + g) for g, _, _ in en]), target)
            put(tensors, p + "ffn_up_exps.weight",
                np.stack([get(hp + u) for _, u, _ in en]), target)
            put(tensors, p + "ffn_down_exps.weight",
                np.stack([get(hp + dn) for _, _, dn in en]), target)
        else:
            put(tensors, p + "ffn_gate.weight",
                get(hp + "mlp.gate_proj.weight"), target)
            put(tensors, p + "ffn_up.weight",
                get(hp + "mlp.up_proj.weight"), target)
            put(tensors, p + "ffn_down.weight",
                get(hp + "mlp.down_proj.weight"), target)

    write_gguf(out_path, md, tensors)
    return md
