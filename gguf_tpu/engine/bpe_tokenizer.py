"""GPT-2-style byte-level BPE tokenizer driven by GGUF metadata.

GGUF checkpoints with `tokenizer.ggml.model == "gpt2"` (Llama-3, Qwen2,
Falcon, GPT-2 lineages) embed the byte-level BPE vocab as
tokenizer.ggml.tokens plus ranked merge pairs in tokenizer.ggml.merges.
Encoding: text -> UTF-8 bytes -> the GPT-2 printable byte alphabet ->
lowest-rank-first pair merging; decoding inverts the byte alphabet.

The SPM tokenizer (tokenizer.py) covers llama-2 family vocabularies; the
engine picks by the tokenizer.ggml.model metadata key.
"""

from __future__ import annotations

import functools
import re

# Pre-tokenization regexes (merges apply only WITHIN a chunk — merging
# across word boundaries diverges from llama.cpp/HF token streams).
# Python re lacks \p{..}: \p{L} -> [^\W\d_], \p{N} -> \d,
# [^\s\p{L}\p{N}] -> (?:[^\s\w]|_).
_PRE_GPT2 = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+")
# llama-3 ("llama-bpe"): case-insensitive contractions, optional leading
# non-letter, digits in groups of <= 3, newlines glued to punctuation
_PRE_LLAMA3 = re.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|(?:[^\r\n\w]|_)?[^\W\d_]+|\d{1,3}"
    r"| ?(?:[^\s\w]|_)+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")
# qwen2/deepseek style: like llama-3 but single digits
_PRE_QWEN2 = re.compile(
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|(?:[^\r\n\w]|_)?[^\W\d_]+|\d"
    r"| ?(?:[^\s\w]|_)+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")

_PRE_BY_NAME = {
    "llama-bpe": _PRE_LLAMA3, "llama3": _PRE_LLAMA3,
    "smaug-bpe": _PRE_LLAMA3,
    "qwen2": _PRE_QWEN2, "deepseek-llm": _PRE_QWEN2,
    "deepseek-coder": _PRE_QWEN2,
    "gpt-2": _PRE_GPT2, "gpt2": _PRE_GPT2,
    "falcon": _PRE_GPT2, "starcoder": _PRE_GPT2, "olmo": _PRE_GPT2,
    "stablelm2": _PRE_QWEN2,
}


@functools.cache
def _byte_alphabet() -> dict[int, str]:
    """GPT-2's bijection from bytes to printable unicode characters."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    mapping = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


class BPETokenizer:
    def __init__(self, tokens: list[str], merges: list[str],
                 bos_id: int | None = None, eos_id: int = 0,
                 add_bos: bool = False, pre: str = ""):
        self.tokens = list(tokens)
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        self.ranks = {tuple(m.split(" ", 1)): r for r, m in enumerate(merges)}
        self.bos_id = bos_id
        # pre-tokenizer (tokenizer.ggml.pre): unknown names get the
        # gpt-2 default, like llama.cpp's warning-then-default behavior
        self.pre = _PRE_BY_NAME.get(pre, _PRE_GPT2)
        # special/control token strings -> ids (chat-template parsing)
        self.specials: dict[str, int] = {}
        self.eos_id = eos_id
        self.add_bos = add_bos
        self._b2u = _byte_alphabet()
        self._u2b = {u: b for b, u in self._b2u.items()}

    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "BPETokenizer":
        from .tokenizer import specials_from_metadata

        bos = md.get("tokenizer.ggml.bos_token_id")
        tok = cls(
            tokens=md["tokenizer.ggml.tokens"],
            merges=md.get("tokenizer.ggml.merges", []),
            bos_id=int(bos) if bos is not None else None,
            eos_id=int(md.get("tokenizer.ggml.eos_token_id", 0)),
            add_bos=bool(md.get("tokenizer.ggml.add_bos_token", False)),
            pre=str(md.get("tokenizer.ggml.pre", "")),
        )
        tok.specials = specials_from_metadata(md)
        return tok

    # ------------------------------------------------------------ encode ---
    def _bpe(self, word: str) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        return parts

    def encode(self, text: str, add_bos: bool | None = None) -> list[int]:
        ids = []
        for chunk in self.pre.findall(text):
            mapped = "".join(self._b2u[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(mapped):
                tid = self.vocab.get(piece)
                if tid is not None:
                    ids.append(tid)
                else:  # fall back to per-character (single-byte) tokens
                    ids.extend(self.vocab[c] for c in piece
                               if c in self.vocab)
        add = self.add_bos if add_bos is None else add_bos
        if add and self.bos_id is not None:
            ids = [self.bos_id] + ids
        return ids

    # ------------------------------------------------------------ decode ---
    def decode_token(self, tid: int) -> bytes:
        return bytes(self._u2b[c] for c in self.tokens[tid]
                     if c in self._u2b)

    def decode(self, ids) -> str:
        skip = {self.eos_id} | ({self.bos_id} if self.bos_id is not None else set())
        out = b"".join(self.decode_token(int(t)) for t in ids
                       if int(t) not in skip)
        return out.decode("utf-8", errors="replace")


def tokenizer_from_metadata(md: dict):
    """Pick SPM or byte-level BPE from tokenizer.ggml.model."""
    if "tokenizer.ggml.tokens" not in md:
        return None
    model = md.get("tokenizer.ggml.model", "llama")
    if model == "gpt2":
        return BPETokenizer.from_gguf_metadata(md)
    if model == "bert":
        from .wordpiece import WordPieceTokenizer

        return WordPieceTokenizer.from_gguf_metadata(md)
    from .tokenizer import SPMTokenizer

    return SPMTokenizer.from_gguf_metadata(md)
