"""WordPiece tokenizer (tokenizer.ggml.model == "bert").

llama.cpp llm_tokenizer_wpm semantics: NFD-normalize and strip combining
marks, lowercase, split into words (whitespace separates; every
punctuation/symbol char is its own word), then greedy longest-match
against the vocabulary with "##" continuation pieces; a word with no
full segmentation becomes a single [UNK]. encode() wraps with
[CLS] ... [SEP] (what add_bos/add_eos mean for bert vocabularies).
"""

from __future__ import annotations

import unicodedata


class WordPieceTokenizer:
    def __init__(self, tokens: list[str], cls_id: int, sep_id: int,
                 unk_id: int, pad_id: int | None = None):
        self.tokens = list(tokens)
        self.vocab = {t: i for i, t in enumerate(self.tokens)}
        self.cls_id, self.sep_id = cls_id, sep_id
        self.unk_id, self.pad_id = unk_id, pad_id
        # the engine's generic eos/bos hooks map to SEP/CLS for encoders
        self.bos_id, self.eos_id = cls_id, sep_id
        self.specials: dict[str, int] = {}

    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "WordPieceTokenizer":
        tokens = md["tokenizer.ggml.tokens"]
        index = {str(t): i for i, t in enumerate(tokens)}

        def tid(key, *names, default=None):
            v = md.get(f"tokenizer.ggml.{key}")
            if v is not None:
                return int(v)
            for n in names:
                if n in index:
                    return index[n]
            return default

        return cls(
            tokens,
            cls_id=tid("cls_token_id", "[CLS]", default=101),
            # llama.cpp's historical key spelling is "seperator"
            sep_id=tid("seperator_token_id", "[SEP]", default=102),
            unk_id=tid("unknown_token_id", "[UNK]", default=100),
            pad_id=tid("padding_token_id", "[PAD]"),
        )

    @staticmethod
    def _words(text: str) -> list[str]:
        out, cur = [], []
        for ch in unicodedata.normalize("NFD", text):
            cat = unicodedata.category(ch)
            if cat == "Mn":          # strip accents
                continue
            ch = ch.lower()
            if ch.isspace():
                if cur:
                    out.append("".join(cur))
                    cur = []
            elif cat[0] in ("P", "S") or (0x4E00 <= ord(ch) <= 0x9FFF):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)       # punctuation/CJK: its own word
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = [self.cls_id] if add_bos else []
        for word in self._words(text):
            pieces, start = [], 0
            ok = True
            while start < len(word):
                end = len(word)
                piece_id = None
                while end > start:
                    cand = word[start:end]
                    if start > 0:
                        cand = "##" + cand
                    if cand in self.vocab:
                        piece_id = self.vocab[cand]
                        break
                    end -= 1
                if piece_id is None:
                    ok = False
                    break
                pieces.append(piece_id)
                start = end
            ids.extend(pieces if ok else [self.unk_id])
        if add_bos:
            ids.append(self.sep_id)
        return ids

    def decode(self, ids) -> str:
        skip = {self.cls_id, self.sep_id, self.pad_id}
        parts = []
        for i in ids:
            i = int(i)
            if i in skip:
                continue
            t = self.tokens[i]
            if t.startswith("##"):
                parts.append(t[2:])
            else:
                if parts:
                    parts.append(" ")
                parts.append(t)
        return "".join(parts)

    def decode_token(self, tid: int) -> str:
        return self.tokens[int(tid)]
