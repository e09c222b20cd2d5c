"""GGUF LoRA adapter merging — llama.cpp-ecosystem adapter files.

The upstream reference has no adapter support (it is a kernel library);
this covers the llama.cpp `convert_lora_to_gguf.py` artifact: a GGUF with
`general.type = "adapter"`, `adapter.type = "lora"`, a float
`adapter.lora.alpha`, and per-tensor pairs `<base>.lora_a` / `<base>.lora_b`
holding the PEFT factors. The merged weight is

    W' = W + scale * (alpha / r) * (B @ A)        r = LoRA rank

— the same math llama.cpp applies (its runtime keeps A/B resident; here the
delta is baked in ahead of serving, so the hot path stays a pure MMQ kernel
with zero per-token overhead). Tensors without an adapter pair are copied
byte-for-byte; adapted tensors are dequantized, patched, and requantized to
their original GGML type through the bit-exact codecs.
"""

from __future__ import annotations

import numpy as np

from ..gguf import GGMLType, GGUFReader
from ..gguf.writer import quantize_tensor, write_gguf


def read_lora_adapter(path: str):
    """-> (alpha, {base_tensor_name: (A (r, K) f32, B (M, r) f32)}).

    Factor orientation is reconciled here: PEFT stores lora_A as
    (r, in_features) and lora_B as (out_features, r), but converters
    disagree on transposition, so each factor is flipped if its rank dim
    is not where expected (rank = the dimension the two factors share)."""
    pairs: dict = {}
    with GGUFReader(path) as r:
        gtype = r.metadata.get("general.type")
        atype = r.metadata.get("adapter.type")
        if gtype is not None and gtype != "adapter":
            raise ValueError(f"not an adapter GGUF (general.type={gtype!r})")
        if atype is not None and atype != "lora":
            raise ValueError(f"unsupported adapter.type {atype!r}")
        alpha = float(r.metadata.get("adapter.lora.alpha", 0.0) or 0.0)
        names = set(r.tensors)
        for name in sorted(names):
            if not name.endswith(".lora_a"):
                continue
            base = name[: -len(".lora_a")]
            bname = base + ".lora_b"
            if bname not in names:
                raise ValueError(f"{name} has no matching {bname}")
            a = r.dequantize(name).astype(np.float32)
            b = r.dequantize(bname).astype(np.float32)
            if a.ndim != 2 or b.ndim != 2:
                raise ValueError(
                    f"LoRA factors must be 2-D: {name} {a.shape}, "
                    f"{bname} {b.shape}")
            # rank = shared small dim; orient to A (r, K), B (M, r)
            if a.shape[0] not in b.shape:
                a = a.T
            if b.shape[1] != a.shape[0]:
                b = b.T
            if b.shape[1] != a.shape[0]:
                raise ValueError(
                    f"cannot reconcile LoRA shapes for {base}: "
                    f"A {a.shape}, B {b.shape}")
            pairs[base] = (a, b)
    if not pairs:
        raise ValueError(f"{path} contains no .lora_a/.lora_b tensor pairs")
    return alpha, pairs


def merge_lora(base_path: str, lora_path: str, out_path: str,
               scale: float = 1.0) -> list[str]:
    """Bake a LoRA adapter into a base GGUF -> new GGUF at `out_path`.

    Adapted tensors are requantized to their ORIGINAL type (their
    quantization error budget already absorbed a full quantize pass, and
    llama.cpp's own merge does the same); everything else — including all
    metadata and the tokenizer — is copied verbatim. Returns the list of
    patched tensor names."""
    alpha, pairs = read_lora_adapter(lora_path)
    patched = []
    tensors = {}
    with GGUFReader(base_path) as r:
        md = dict(r.metadata)
        md_types = dict(r.metadata_types)
        for name, ti in r.tensors.items():
            if name in pairs:
                a, b = pairs[name]
                rank = a.shape[0]
                w = r.dequantize(name).astype(np.float32)
                if w.shape != (b.shape[0], a.shape[1]):
                    raise ValueError(
                        f"{name}: base {w.shape} vs LoRA delta "
                        f"({b.shape[0]}, {a.shape[1]})")
                eff = scale * (alpha / rank if alpha else 1.0)
                w = w + np.float32(eff) * (b @ a)
                tensors[name] = (ti.ggml_type, w.shape,
                                 quantize_tensor(w, ti.ggml_type))
                patched.append(name)
            else:
                tensors[name] = (ti.ggml_type, ti.shape,
                                 np.asarray(r.tensor_bytes(name)))
    unused = [k for k in pairs if k not in patched]
    if unused:
        raise ValueError(
            f"adapter tensors with no base counterpart: {unused}")
    write_gguf(out_path, md, tensors, metadata_types=md_types)
    return patched


def write_lora_adapter(path: str, alpha: float, pairs: dict) -> None:
    """Write a llama.cpp-convention LoRA adapter GGUF (tests / tooling).
    pairs: {base_tensor_name: (A (r, K), B (M, r))}, float32."""
    tensors = {}
    for base, (a, b) in pairs.items():
        a = np.ascontiguousarray(a, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        tensors[base + ".lora_a"] = (GGMLType.F32, a.shape, a)
        tensors[base + ".lora_b"] = (GGMLType.F32, b.shape, b)
    write_gguf(path, {
        "general.architecture": "llama",
        "general.type": "adapter",
        "adapter.type": "lora",
        "adapter.lora.alpha": float(alpha),
    }, tensors)
