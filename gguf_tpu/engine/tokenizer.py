"""SentencePiece-style BPE tokenizer driven by GGUF metadata.

GGUF embeds the tokenizer (tokenizer.ggml.tokens / scores / token_type /
bos|eos ids), so no external tokenizer files are needed. Encoding follows
the SPM algorithm llama.cpp uses for llama-family vocabularies: greedy
highest-score bigram merging over the initial UTF-8 symbol sequence, with
byte-fallback (<0xXX> tokens) for anything not in the vocabulary.
"""

from __future__ import annotations

import heapq

import numpy as np

SPACE = "▁"  # ▁


def specials_from_metadata(md: dict) -> dict:
    """Special/control token strings -> ids from GGUF token_type metadata
    (3 = CONTROL, 4 = USER_DEFINED) — the tokens chat templates emit as
    literal text (<s>, <|im_start|>, ...) that must encode to single ids."""
    tokens = md.get("tokenizer.ggml.tokens")
    types = md.get("tokenizer.ggml.token_type")
    if tokens is None or types is None:
        return {}
    return {str(t): i for i, (t, ty) in enumerate(zip(tokens, types))
            if int(ty) in (3, 4)}


# common FIM control-token spellings, per role, for vocabularies whose
# GGUFs predate the tokenizer.ggml.fim_*_token_id keys (llama.cpp
# llama_vocab special_fim_* inference by token text)
_FIM_NAMES = {
    "pre": ("<|fim_prefix|>", "<fim-prefix>", "<fim_prefix>", "<PRE>",
            "▁<PRE>", "<|fim▁begin|>"),
    "suf": ("<|fim_suffix|>", "<fim-suffix>", "<fim_suffix>", "<SUF>",
            "▁<SUF>", "<|fim▁hole|>"),
    "mid": ("<|fim_middle|>", "<fim-middle>", "<fim_middle>", "<MID>",
            "▁<MID>", "<|fim▁end|>"),
    "pad": ("<|fim_pad|>", "<fim-pad>", "<fim_pad>", "<PAD>"),
    "rep": ("<|repo_name|>", "<fim-repo>", "<repo_name>"),
    "sep": ("<|file_sep|>", "<fim-sep>", "<file_sep>", "<|file_separator|>"),
    "eot": ("<|endoftext|>", "<EOT>", "▁<EOT>", "<|eot_id|>",
            "<|end_of_text|>"),
}

# modern llama.cpp GGUF keys, with the legacy codellama-era aliases
_FIM_KEYS = {
    "pre": ("tokenizer.ggml.fim_pre_token_id",
            "tokenizer.ggml.prefix_token_id"),
    "suf": ("tokenizer.ggml.fim_suf_token_id",
            "tokenizer.ggml.suffix_token_id"),
    "mid": ("tokenizer.ggml.fim_mid_token_id",
            "tokenizer.ggml.middle_token_id"),
    "pad": ("tokenizer.ggml.fim_pad_token_id",),
    "rep": ("tokenizer.ggml.fim_rep_token_id",),
    "sep": ("tokenizer.ggml.fim_sep_token_id",),
    "eot": ("tokenizer.ggml.eot_token_id",),
}


def fim_tokens_from_metadata(md: dict) -> dict:
    """{pre|suf|mid|pad|rep|sep|eot: token id} for fill-in-middle serving
    (/infill). Explicit tokenizer.ggml.fim_* / legacy *_token_id keys win;
    otherwise ids are inferred from well-known control-token spellings —
    the same two-tier scheme llama.cpp's vocab loader uses."""
    tokens = md.get("tokenizer.ggml.tokens") or []
    index = {str(t): i for i, t in enumerate(tokens)}
    out = {}
    for role, keys in _FIM_KEYS.items():
        for k in keys:
            if md.get(k) is not None and int(md[k]) >= 0:
                out[role] = int(md[k])
                break
        else:
            for name in _FIM_NAMES[role]:
                if name in index:
                    out[role] = index[name]
                    break
    return out


class SPMTokenizer:
    def __init__(self, tokens: list[str], scores, bos_id: int = 1,
                 eos_id: int = 2, unk_id: int = 0, add_space_prefix: bool = True):
        self.tokens = list(tokens)
        self.scores = np.asarray(scores, dtype=np.float32)
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        self.bos_id, self.eos_id, self.unk_id = bos_id, eos_id, unk_id
        # special/control token strings -> ids (chat-template parsing);
        # populated from GGUF token_type metadata
        self.specials: dict[str, int] = {}
        self.add_space_prefix = add_space_prefix
        self._byte_ids = {}
        for b in range(256):
            tok = f"<0x{b:02X}>"
            if tok in self.vocab:
                self._byte_ids[b] = self.vocab[tok]

    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "SPMTokenizer":
        tok = cls(
            tokens=md["tokenizer.ggml.tokens"],
            scores=md.get("tokenizer.ggml.scores",
                          np.zeros(len(md["tokenizer.ggml.tokens"]), np.float32)),
            bos_id=int(md.get("tokenizer.ggml.bos_token_id", 1)),
            eos_id=int(md.get("tokenizer.ggml.eos_token_id", 2)),
            unk_id=int(md.get("tokenizer.ggml.unknown_token_id", 0)),
            add_space_prefix=bool(md.get("tokenizer.ggml.add_space_prefix", True)),
        )
        tok.specials = specials_from_metadata(md)
        return tok

    # ------------------------------------------------------------ encode ---
    def encode(self, text: str, add_bos: bool = True,
               add_space_prefix: bool | None = None) -> list[int]:
        """add_space_prefix overrides the tokenizer default — chat-template
        segments after a special token must not grow a spurious leading ▁
        (llama.cpp only prefixes the very first piece of a prompt)."""
        text = text.replace(" ", SPACE)
        prefix = (self.add_space_prefix if add_space_prefix is None
                  else add_space_prefix)
        if prefix and text and not text.startswith(SPACE):
            text = SPACE + text

        # initial symbols: one per unicode character
        syms = list(text)
        if not syms:
            return [self.bos_id] if add_bos else []

        # greedy best-score bigram merging (SPM): a heap of candidate merges,
        # symbols as a doubly linked list
        prev = list(range(-1, len(syms) - 1))
        nxt = list(range(1, len(syms) + 1))
        alive = [True] * len(syms)

        def push(i):
            j = nxt[i]
            if j >= len(syms):
                return
            merged = syms[i] + syms[j]
            tid = self.vocab.get(merged)
            if tid is not None:
                heapq.heappush(heap, (-float(self.scores[tid]), i, j, merged))

        heap: list = []
        for i in range(len(syms) - 1):
            push(i)

        while heap:
            _, i, j, merged = heapq.heappop(heap)
            if not (alive[i] and alive[j]) or nxt[i] != j or syms[i] + syms[j] != merged:
                continue
            syms[i] = merged
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[i] < len(syms):
                prev[nxt[i]] = i
            if prev[i] >= 0:
                push(prev[i])
            push(i)

        ids: list[int] = []
        i = 0
        while i < len(syms):
            if alive[i]:
                tid = self.vocab.get(syms[i])
                if tid is not None:
                    ids.append(tid)
                else:  # byte fallback
                    for b in syms[i].encode("utf-8"):
                        ids.append(self._byte_ids.get(b, self.unk_id))
            i = nxt[i] if alive[i] else i + 1
        return ([self.bos_id] + ids) if add_bos else ids

    # ------------------------------------------------------------ decode ---
    def decode_token(self, tid: int) -> bytes:
        piece = self.tokens[tid]
        if piece.startswith("<0x") and piece.endswith(">") and len(piece) == 6:
            return bytes([int(piece[3:5], 16)])
        return piece.replace(SPACE, " ").encode("utf-8")

    def decode(self, ids) -> str:
        out = b"".join(self.decode_token(int(t)) for t in ids
                       if int(t) not in (self.bos_id, self.eos_id))
        text = out.decode("utf-8", errors="replace")
        # drop the synthetic leading space introduced by add_space_prefix
        if self.add_space_prefix and text.startswith(" "):
            text = text[1:]
        return text
