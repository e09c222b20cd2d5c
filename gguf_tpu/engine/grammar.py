"""GBNF grammar-constrained decoding — llama.cpp grammar parity.

Implements llama.cpp's GBNF dialect (grammars/*.gbnf ship with llama.cpp
and work here unchanged): `rule ::= alternates`, literal strings,
character classes ([a-z0-9], negation [^...]), grouping, the ? * +
repetition operators, and rule references. The matcher is the same
incremental pushdown design as llama_grammar: a SET of stacks of
grammar positions advances byte by byte; a byte is accepted if any
stack accepts it, and generation may stop when any stack is empty.

Sampling composes with the engine's host-stepping constrained path
(engine.generate(grammar=...)): instead of materializing a vocab-sized
mask per step (expensive in Python), the sampler walks candidates in
Gumbel-perturbed probability order and takes the first token whose
bytes the grammar accepts — by the Gumbel-max argument this draws
EXACTLY from the renormalized masked distribution, while touching only
a handful of candidates per step. Greedy walks plain logit order.
"""

from __future__ import annotations

import numpy as np

# element kinds (mirrors llama.cpp llama_gretype)
END = 0          # end of a sequence
ALT = 1          # start of an alternate sequence
RULE_REF = 2     # (kind, rule_id)
CHAR = 3         # (kind, ((lo, hi), ...)) inclusive byte ranges
CHAR_NOT = 4     # negated ranges


class GrammarParseError(ValueError):
    pass


def _parse_char(src: str, i: int):
    """One (possibly escaped) character -> (codepoint, next_i)."""
    c = src[i]
    if c == "\\":
        e = src[i + 1]
        table = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\", '"': '"',
                 "[": "[", "]": "]", "'": "'"}
        if e in table:
            return ord(table[e]), i + 2
        if e in ("x", "u", "U"):
            n = {"x": 2, "u": 4, "U": 8}[e]
            return int(src[i + 2:i + 2 + n], 16), i + 2 + n
        raise GrammarParseError(f"bad escape \\{e}")
    return ord(c), i + 1


class Grammar:
    """Parsed GBNF: rules[id] = list of alternate sequences, each a list
    of elements ((CHAR, ranges) | (CHAR_NOT, ranges) | (RULE_REF, id))."""

    def __init__(self, text: str, root: str = "root"):
        self.rule_ids: dict[str, int] = {}
        self.rules: list = []
        self._parse(text)
        if root not in self.rule_ids:
            raise GrammarParseError(f"no '{root}' rule")
        self.root = self.rule_ids[root]

    # ------------------------------------------------------------ parsing ---
    def _rid(self, name: str) -> int:
        if name not in self.rule_ids:
            self.rule_ids[name] = len(self.rules)
            self.rules.append(None)
        return self.rule_ids[name]

    def _new_rule(self, alts) -> int:
        rid = len(self.rules)
        self.rules.append(alts)
        self.rule_ids[f"<anon{rid}>"] = rid
        return rid

    def _parse(self, text: str):
        src = text
        i, n = 0, len(src)

        def skip_ws(i):
            # whitespace and comments-to-end-of-line ('#' only counts as a
            # comment OUTSIDE literals/classes, which are handled by the
            # element parsers)
            while i < n:
                if src[i] in " \t\r\n":
                    i += 1
                elif src[i] == "#":
                    while i < n and src[i] != "\n":
                        i += 1
                else:
                    break
            return i

        while True:
            i = skip_ws(i)
            if i >= n:
                break
            j = i
            while j < n and (src[j].isalnum() or src[j] in "-_"):
                j += 1
            name = src[i:j]
            if not name:
                raise GrammarParseError(f"expected rule name at {i}")
            j = skip_ws(j)
            if src[j:j + 3] != "::=":
                raise GrammarParseError(f"expected ::= after {name!r}")
            alts, i = self._parse_alts(src, j + 3)
            self.rules[self._rid(name)] = alts
        missing = [nm for nm, rid in self.rule_ids.items()
                   if self.rules[rid] is None]
        if missing:
            raise GrammarParseError(f"undefined rules: {missing}")
        self._check_left_recursion()

    def _check_left_recursion(self):
        """Reject left-recursive rules at parse time (they would overflow
        the matcher's expansion; llama.cpp reports them the same way)."""
        nr = len(self.rules)
        nullable = [False] * nr
        changed = True
        while changed:
            changed = False
            for rid, alts in enumerate(self.rules):
                if nullable[rid]:
                    continue
                for alt in alts:
                    if all(e[0] == RULE_REF and nullable[e[1]]
                           for e in alt):
                        nullable[rid] = True
                        changed = True
                        break
        # left-edge graph: refs reachable before any mandatory terminal
        edges = [set() for _ in range(nr)]
        for rid, alts in enumerate(self.rules):
            for alt in alts:
                for e in alt:
                    if e[0] != RULE_REF:
                        break
                    edges[rid].add(e[1])
                    if not nullable[e[1]]:
                        break
        color = [0] * nr          # 0 unvisited, 1 in-stack, 2 done

        def dfs(rid):
            color[rid] = 1
            for t in edges[rid]:
                if color[t] == 1:
                    names = {v: k for k, v in self.rule_ids.items()}
                    raise GrammarParseError(
                        f"left-recursive rule {names.get(t, t)!r}")
                if color[t] == 0:
                    dfs(t)
            color[rid] = 2

        for rid in range(nr):
            if color[rid] == 0:
                dfs(rid)

    def _parse_alts(self, src: str, i: int):
        """Alternates up to an unbalanced ')' or the rule's end."""
        n = len(src)
        alts = [[]]

        def skip_sp(i):
            while i < n and src[i] in " \t":
                i += 1
            return i

        while True:
            i = skip_sp(i)
            if i >= n:
                break
            c = src[i]
            if c == "#":                      # comment to end of line
                while i < n and src[i] != "\n":
                    i += 1
                continue
            if c == "\n":
                # a newline ends the rule only when the next line begins a
                # new `name ::=` definition (official llama.cpp grammars
                # span rules over multiple indented lines)
                j = i
                while j < n and src[j] in " \t\r\n":
                    j += 1
                if j >= n:
                    break
                k = j
                while k < n and (src[k].isalnum() or src[k] in "-_"):
                    k += 1
                k2 = k
                while k2 < n and src[k2] in " \t":
                    k2 += 1
                if k > j and src[k2:k2 + 3] == "::=":
                    break                     # next rule starts
                i = j
                continue
            if c == ")":
                break
            if c == "|":
                alts.append([])
                i += 1
                continue
            if c == '"':
                sym_start = len(alts[-1])
                j = i + 1
                while j < n and src[j] != '"':
                    cp, j = _parse_char(src, j)
                    alts[-1].append((CHAR, ((cp, cp),)))
                if j >= n:
                    raise GrammarParseError("unterminated string literal")
                i = j + 1
            elif c == "[":
                sym_start = len(alts[-1])
                neg = src[i + 1] == "^"
                j = i + 2 if neg else i + 1
                ranges = []
                while j < n and src[j] != "]":
                    lo, j = _parse_char(src, j)
                    if src[j] == "-" and src[j + 1] != "]":
                        hi, j = _parse_char(src, j + 1)
                        ranges.append((lo, hi))
                    else:
                        ranges.append((lo, lo))
                # ranges are unicode codepoints (llama_grammar matches
                # decoded code points, not raw bytes)
                alts[-1].append((CHAR_NOT if neg else CHAR, tuple(ranges)))
                i = j + 1
            elif c == "(":
                sym_start = len(alts[-1])
                inner, i = self._parse_alts(src, i + 1)
                if src[i] != ")":
                    raise GrammarParseError(f"unbalanced ( at {i}")
                i += 1
                rid = self._new_rule(inner)
                alts[-1].append((RULE_REF, rid))
            elif c.isalnum() or c in "-_":
                sym_start = len(alts[-1])
                j = i
                while j < n and (src[j].isalnum() or src[j] in "-_"):
                    j += 1
                alts[-1].append((RULE_REF, self._rid(src[i:j])))
                i = j
            else:
                raise GrammarParseError(f"unexpected {c!r} at {i}")
            # repetition operators bind to the whole preceding SYMBOL —
            # a quoted literal repeats as a unit ("ab"+ matches "abab",
            # not "abbb"), matching llama.cpp's last_sym_start handling
            i = skip_sp(i)
            if i < n and src[i] in "?*+":
                op = src[i]
                sym = alts[-1][sym_start:]
                del alts[-1][sym_start:]
                if op == "?":
                    rid = self._new_rule([list(sym), []])
                elif op == "*":
                    rid = self._new_rule([])
                    self.rules[rid] = [list(sym) + [(RULE_REF, rid)], []]
                else:  # +
                    rid = self._new_rule([])
                    self.rules[rid] = [list(sym) + [(RULE_REF, rid)],
                                       list(sym)]
                alts[-1].append((RULE_REF, rid))
                i += 1
        return alts, i


class GrammarState:
    """Incremental matcher: a set of stacks of (rule_id, alt_idx, pos)
    positions, advanced codepoint by codepoint (llama_grammar_accept)."""

    def __init__(self, grammar: Grammar):
        self.g = grammar
        self.stacks = self._expand(((grammar.root, None, None),))

    def _tops(self, stack):
        """Expand a stack until its top is a terminal (CHAR/CHAR_NOT) or
        it is empty -> list of concrete stacks."""
        g = self.g
        out = []
        seen = set()

        def rec(st):
            if st in seen:
                return
            seen.add(st)
            if not st:
                out.append(st)
                return
            rid, alt, pos = st[-1]
            if alt is None:      # fresh rule ref: fork over its alternates
                for ai in range(len(g.rules[rid])):
                    rec(st[:-1] + ((rid, ai, 0),))
                if not g.rules[rid]:   # empty rule (pure epsilon)
                    rec(st[:-1])
                return
            seq = g.rules[rid][alt]
            if pos >= len(seq):  # sequence done: pop
                rec(st[:-1])
                return
            kind = seq[pos][0]
            if kind == RULE_REF:
                rec(st[:-1] + ((rid, alt, pos + 1), (seq[pos][1], None, None)))
                return
            out.append(st)       # terminal on top
        rec(stack)
        return out

    def _expand(self, stack):
        return self._tops(stack)

    @staticmethod
    def _match(elem, cp: int) -> bool:
        kind, ranges = elem
        hit = any(lo <= cp <= hi for lo, hi in ranges)
        return hit if kind == CHAR else not hit

    def accepts_text(self, text: str) -> bool:
        """Would the grammar accept this continuation? (non-destructive)"""
        stacks = self.stacks
        for ch in text:
            stacks = self._step(stacks, ord(ch))
            if not stacks:
                return False
        return True

    def _step(self, stacks, cp: int):
        g = self.g
        nxt = []
        seen = set()
        for st in stacks:
            if not st:
                continue
            rid, alt, pos = st[-1]
            elem = g.rules[rid][alt][pos]
            if self._match(elem, cp):
                for ex in self._tops(st[:-1] + ((rid, alt, pos + 1),)):
                    if ex not in seen:
                        seen.add(ex)
                        nxt.append(ex)
        return nxt

    def advance_text(self, text: str) -> bool:
        """Consume `text`; False (state unchanged) if it cannot match."""
        stacks = self.stacks
        for ch in text:
            stacks = self._step(stacks, ord(ch))
            if not stacks:
                return False
        self.stacks = stacks
        return True

    @property
    def can_stop(self) -> bool:
        """True when the root rule can be complete here (an empty stack)."""
        return any(not st for st in self.stacks)

    @property
    def dead(self) -> bool:
        return not self.stacks

    def accepts_any_in(self, lo: int, hi: int) -> bool:
        """Could any single codepoint in [lo, hi] be accepted here?"""
        for st in self.stacks:
            if not st:
                continue
            rid, alt, pos = st[-1]
            kind, ranges = self.g.rules[rid][alt][pos]
            if kind == CHAR:
                if any(max(lo, a) <= min(hi, b) for a, b in ranges):
                    return True
            else:                     # CHAR_NOT: a gap in [lo, hi]?
                cur = lo
                for a, b in sorted(ranges):
                    if a > cur:
                        return True
                    cur = max(cur, b + 1)
                    if cur > hi:
                        break
                if cur <= hi:
                    return True
        return False


# JSON-mode grammar (llama.cpp grammars/json.gbnf, with the {n,m}
# repetition extension expanded to the core dialect)
JSON_GBNF = r'''
root   ::= object
value  ::= object | array | string | number | ("true" | "false" | "null") ws
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
array  ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\"" ( [^"\\] | "\\" (["\\/bfnrt] | "u" hex hex hex hex) )* "\"" ws
hex    ::= [0-9a-fA-F]
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? ws
ws     ::= [ \t\n]*
'''


def _truncate(lg: np.ndarray, cfg) -> np.ndarray:
    """Numpy mirror of the device sampler's distribution truncations
    (temperature already applied): top_k -> typical_p -> min_p -> top_p,
    masked entries at -inf."""
    if cfg.top_k > 0:
        kth = np.sort(lg)[-cfg.top_k]
        lg = np.where(lg < kth, -np.inf, lg)
    if cfg.typical_p < 1.0:
        lp = lg - _logsumexp(lg)
        p = np.exp(lp)
        ent = -np.sum(np.where(p > 0, p * lp, 0.0))
        score = np.abs(-lp - ent)
        order = np.argsort(score)
        cum = np.cumsum(p[order])
        n_keep = int(np.sum(cum < cfg.typical_p)) + 1
        mask = np.full_like(lg, -np.inf)
        mask[order[:n_keep]] = lg[order[:n_keep]]
        lg = mask
    if cfg.min_p > 0.0:
        p = np.exp(lg - _logsumexp(lg))
        lg = np.where(p < cfg.min_p * p.max(), -np.inf, lg)
    if cfg.top_p < 1.0:
        order = np.argsort(-lg)
        p = np.exp(lg[order] - _logsumexp(lg))
        cum = np.cumsum(p)
        cutoff_idx = int(np.argmax(cum >= cfg.top_p))
        lg = np.where(lg < lg[order[cutoff_idx]], -np.inf, lg)
    return lg


def _logsumexp(lg: np.ndarray) -> float:
    m = np.max(lg[np.isfinite(lg)]) if np.isfinite(lg).any() else 0.0
    return m + np.log(np.sum(np.exp(np.where(np.isfinite(lg), lg - m,
                                             -np.inf))))


class GrammarSampler:
    """Per-sequence constrained sampling over a tokenizer vocabulary.

    pick(logits) walks candidates in Gumbel-perturbed log-prob order
    (plain logit order for greedy) and returns the first token whose
    decoded text the grammar accepts — an exact draw from the masked,
    renormalized distribution. advance(token) consumes the choice.

    Matching runs on each token's RAW piece bytes (decode_token) — NOT
    decode([tid]), whose per-call SPM space stripping would validate a
    different string than the emitted text. Incomplete UTF-8 tails
    (byte-fallback tokens) are buffered until the next token completes
    them; the sequence-initial synthetic SPM space is stripped exactly
    like GenerationResult.text strips it."""

    def __init__(self, grammar_text: str, tokenizer, eos_id: int,
                 root: str = "root"):
        self.grammar = Grammar(grammar_text, root)
        self.state = GrammarState(self.grammar)
        self.tok = tokenizer
        self.eos_id = eos_id
        self._piece_cache: dict[int, bytes] = {}
        self._pending = b""          # undecodable UTF-8 tail
        self._first = True           # strip one leading synthetic space

    def _piece_bytes(self, tid: int) -> bytes:
        p = self._piece_cache.get(tid)
        if p is None:
            p = self.tok.decode_token(int(tid))
            self._piece_cache[tid] = p
        return p

    @staticmethod
    def _complete_prefix(bts: bytes):
        """Longest decodable prefix -> (text, undecoded tail) — tails of
        up to 3 bytes are legal mid-codepoint states; anything longer is
        genuinely invalid and decoded with replacement."""
        for cut in range(len(bts), max(len(bts) - 4, -1), -1):
            try:
                return bts[:cut].decode("utf-8"), bts[cut:]
            except UnicodeDecodeError:
                continue
        return bts.decode("utf-8", errors="replace"), b""

    @staticmethod
    def _partial_range(tail: bytes):
        """A valid UTF-8 prefix tail -> the inclusive codepoint range its
        completion could produce, or None if the tail can never complete
        (bad lead / stray continuation / overlong)."""
        if not tail:
            return None
        lead = tail[0]
        if lead < 0xC2 or lead >= 0xF5:
            return None               # ascii/continuation/invalid lead
        need = 2 if lead < 0xE0 else 3 if lead < 0xF0 else 4
        if len(tail) >= need or any(not 0x80 <= c < 0xC0 for c in tail[1:]):
            return None
        return {2: (0x80, 0x7FF), 3: (0x800, 0xFFFF),
                4: (0x10000, 0x10FFFF)}[need]

    def _candidate_text(self, tid: int):
        b = self._pending + self._piece_bytes(tid)
        if (self._first and b.startswith(b" ")
                and getattr(self.tok, "add_space_prefix", False)):
            b = b[1:]
        text, rest = self._complete_prefix(b)
        if rest and self._partial_range(rest) is None:
            return None, rest        # invalid byte sequence: reject
        return text, rest

    def pick(self, logits: np.ndarray, temperature: float = 0.0,
             rng: np.random.Generator | None = None,
             max_probe: int = 512, sampler=None) -> int:
        """logits (V,) -> chosen token id honoring the grammar. `sampler`
        (a SamplerConfig) applies its top_k/top_p/min_p/typical_p
        truncations BEFORE the grammar walk — same chain order as the
        unconstrained device sampler."""
        lg = np.asarray(logits, np.float64)
        if sampler is not None and temperature > 0.0:
            lg = _truncate(lg / temperature, sampler)
        elif temperature > 0.0:
            lg = lg / temperature
        if temperature > 0.0:
            rng = rng or np.random.default_rng()
            keys = np.where(np.isfinite(lg),
                            lg + rng.gumbel(size=lg.shape), -np.inf)
        else:
            keys = lg
        order = np.argsort(-keys)

        def ok(tid: int) -> bool:
            if tid == self.eos_id:
                return not self._pending and self.state.can_stop
            text, rest = self._candidate_text(tid)
            if text is None or not (text or rest):
                return False         # invalid bytes / empty piece
            if not self.state.accepts_text(text):
                return False
            if rest:
                # mid-codepoint tail: only allow it if the grammar could
                # accept SOME codepoint the completion might produce —
                # otherwise partial bytes accumulate toward a dead end
                lo, hi = self._partial_range(rest)
                probe = self.state
                if text:
                    probe = GrammarState.__new__(GrammarState)
                    probe.g = self.state.g
                    probe.stacks = self.state.stacks
                    for ch in text:
                        probe.stacks = probe._step(probe.stacks, ord(ch))
                return probe.accepts_any_in(lo, hi)
            return True

        for tid in order[:max_probe]:
            if ok(int(tid)):
                return int(tid)
        # rare: every high-probability token violates the grammar (e.g. a
        # mandatory low-probability delimiter) — full scan before giving up
        for tid in order[max_probe:]:
            if ok(int(tid)):
                return int(tid)
        return self.eos_id

    def advance(self, tid: int) -> None:
        if tid == self.eos_id:
            return
        text, rest = self._candidate_text(tid)
        assert text is not None, f"advance() on invalid bytes: {tid}"
        ok = self.state.advance_text(text)
        assert ok, f"advance() on a token pick() did not approve: {tid}"
        self._pending = rest
        self._first = False
