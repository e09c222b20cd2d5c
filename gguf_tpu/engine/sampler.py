"""Token samplers: greedy, temperature, top-k, top-p, min-p, repetition /
presence / frequency penalties — batched, jit-safe."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.0   # 0 => greedy
    top_k: int = 0             # 0 => disabled
    top_p: float = 1.0         # 1 => disabled
    min_p: float = 0.0         # 0 => disabled (keep tokens with
                               # prob >= min_p * max_prob)
    typical_p: float = 1.0     # 1 => disabled (locally typical sampling:
                               # keep the smallest set of tokens whose
                               # |-log p - H| is lowest with cum prob >= tp)
    # context-repetition penalties; counts cover the WHOLE context
    # (prompt + generated), the OpenAI semantics — set penalty_last_n
    # for llama.cpp's windowed behavior (--repeat-last-n, default 64
    # there): only the most recent n context tokens are counted. The
    # window advances at decode-chunk granularity (tokens age out when
    # the host rebuilds counts between chunks, <= chunk-1 steps late).
    penalty_last_n: int = -1       # -1 = whole context
    repeat_penalty: float = 1.0    # llama.cpp: >1 shrinks seen tokens'
                                   # logits (divide if >0, multiply if <0)
    presence_penalty: float = 0.0  # OpenAI: flat subtraction once seen
    frequency_penalty: float = 0.0  # OpenAI: subtraction per occurrence
    # OpenAI logit_bias: ((token_id, bias), ...) added to logits before
    # everything else; -100 effectively bans a token, +100 forces it.
    # A tuple (not dict) keeps the config hashable for jit-static use.
    logit_bias: tuple = ()
    # mirostat v2 (llama.cpp --mirostat 2): adaptively truncate to tokens
    # whose surprise (-log2 p) stays near tau, updating the per-sequence
    # threshold mu by eta * (observed - tau) each step. Overrides the
    # top_k/top_p/min_p/typical_p truncations (llama.cpp does the same).
    mirostat: int = 0          # 0 = off, 2 = mirostat v2
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    # XTC (llama.cpp --xtc-probability/--xtc-threshold): with probability
    # xtc_probability per step, remove every token whose probability is
    # >= xtc_threshold EXCEPT the least probable of them — cuts the
    # predictable top choices while keeping the tail intact.
    xtc_probability: float = 0.0   # 0 => disabled
    xtc_threshold: float = 0.1     # > 0.5 disables (two tokens can't both
                                   # exceed it, matching llama.cpp)
    # top-n-sigma (llama.cpp --top-nsigma): keep only tokens whose logit is
    # within n standard deviations of the max logit.
    top_n_sigma: float = 0.0       # 0 => disabled
    # DRY "don't repeat yourself" (llama.cpp --dry-multiplier etc.):
    # penalize tokens that would extend a verbatim repetition of the
    # context's current suffix. A token whose emission would continue an
    # earlier occurrence of the last m context tokens (m >=
    # dry_allowed_length) loses multiplier * base^(m - allowed_length)
    # logits. Matching never crosses a sequence-breaker token and is
    # capped at DRY_MATCH_CAP tokens of suffix depth.
    dry_multiplier: float = 0.0    # 0 => disabled
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_penalty_last_n: int = -1   # -1/0 => whole context window
    dry_sequence_breakers: tuple = ()   # token IDS (hashable/static); the
                                   # server maps breaker strings to ids

    @property
    def uses_dry(self) -> bool:
        return self.dry_multiplier > 0.0

    @property
    def uses_penalties(self) -> bool:
        # llama.cpp: repeat_last_n == 0 disables the penalties entirely
        return (self.penalty_last_n != 0
                and (self.repeat_penalty != 1.0
                     or self.presence_penalty != 0.0
                     or self.frequency_penalty != 0.0))


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    cfg: SamplerConfig) -> jax.Array:
    """logits (B, V) f32, counts (B, V) int token occurrences over each
    sequence's context -> penalized logits. llama.cpp's repeat_penalty
    divides positive / multiplies negative logits of seen tokens; the
    OpenAI penalties subtract presence*(seen) + frequency*count."""
    c = counts.astype(jnp.float32)
    seen = c > 0
    if cfg.repeat_penalty != 1.0:
        rp = jnp.float32(cfg.repeat_penalty)
        pen = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, pen, logits)
    if cfg.presence_penalty != 0.0 or cfg.frequency_penalty != 0.0:
        logits = (logits - jnp.float32(cfg.frequency_penalty) * c
                  - jnp.float32(cfg.presence_penalty) * seen.astype(jnp.float32))
    return logits


# deepest repetition suffix DRY models; base^(CAP - allowed) already
# reaches ~1e7 logits of penalty at the default base, an effective ban
DRY_MATCH_CAP = 32


def apply_dry(logits: jax.Array, hist: jax.Array, hist_len: jax.Array,
              cfg: SamplerConfig) -> jax.Array:
    """DRY repetition penalty (llama.cpp llama_sampler_dry).

    hist (B, S) int32: each sequence's context tokens (prompt + generated)
    in order; hist_len (B,): live token count per row. For every earlier
    position j < len, m(j) = length of the longest common suffix of
    hist[:j] and hist[:len] (how deep a repetition the token hist[j]
    would extend). Every vocab token takes the MAX m over its positions;
    tokens with m >= allowed_length lose multiplier * base^(m - allowed).
    Matching stops at sequence-breaker tokens and (optionally) outside
    the last dry_penalty_last_n tokens."""
    B, S = hist.shape
    V = logits.shape[-1]
    cap = min(DRY_MATCH_CAP, S)
    i = jnp.arange(cap)                                    # suffix depth
    j = jnp.arange(S)                                      # candidate pos
    cur_pos = hist_len[:, None] - 1 - i[None, :]           # (B, CAP)
    cur_tok = jnp.take_along_axis(hist, jnp.clip(cur_pos, 0, S - 1), axis=1)
    prev_pos = j[:, None] - 1 - i[None, :]                 # (S, CAP)
    prev_tok = hist[:, jnp.clip(prev_pos, 0, S - 1)]       # (B, S, CAP)
    eq = (prev_tok == cur_tok[:, None, :]) \
        & (cur_pos[:, None, :] >= 0) & (prev_pos[None, :, :] >= 0)
    if cfg.dry_sequence_breakers:
        brk = jnp.asarray(cfg.dry_sequence_breakers, jnp.int32)
        is_brk = jnp.any(cur_tok[:, :, None] == brk[None, None, :], axis=-1)
        eq &= ~is_brk[:, None, :]                          # stop at breaker
    if cfg.dry_penalty_last_n > 0:
        eq &= (j[None, :, None]
               >= hist_len[:, None, None] - cfg.dry_penalty_last_n)
    # consecutive-match run length from depth 0
    m = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=-1), axis=-1)
    m = jnp.where(j[None, :] < hist_len[:, None], m, 0)    # j < len only
    rows = jnp.arange(B)[:, None]
    pen_len = jnp.zeros((B, V), jnp.int32).at[rows, hist].max(
        m, mode="drop")
    fire = pen_len >= max(cfg.dry_allowed_length, 1)
    pen = jnp.float32(cfg.dry_multiplier) * jnp.power(
        jnp.float32(cfg.dry_base),
        (pen_len - cfg.dry_allowed_length).astype(jnp.float32))
    return jnp.where(fire, logits - pen, logits)


def sample_mirostat(logits: jax.Array, key: jax.Array, cfg: SamplerConfig,
                    mu: jax.Array, counts: jax.Array | None = None,
                    hist: jax.Array | None = None,
                    hist_len: jax.Array | None = None):
    """Mirostat v2 step: (logits (B, V), mu (B,)) -> (token ids (B,),
    updated mu). Tokens with surprise -log2(p) > mu are dropped (the
    current argmax always survives), the pick is drawn from the
    renormalized remainder, and mu relaxes toward tau by eta times the
    observed-surprise error — llama.cpp llama_sampler_mirostat_v2."""
    logits = logits.astype(jnp.float32)
    if cfg.logit_bias:
        ids = jnp.asarray([i for i, _ in cfg.logit_bias], jnp.int32)
        vals = jnp.asarray([v for _, v in cfg.logit_bias], jnp.float32)
        logits = logits.at[:, ids].add(vals)
    if cfg.uses_penalties:
        assert counts is not None, "penalties need context token counts"
        logits = apply_penalties(logits, counts, cfg)
    if cfg.uses_dry:
        assert hist is not None and hist_len is not None, \
            "DRY needs the ordered context token history"
        logits = apply_dry(logits, hist, hist_len, cfg)
    temp = max(cfg.temperature, 1e-6)
    lp = jax.nn.log_softmax(logits / temp, axis=-1)
    surprise = -lp / jnp.log(2.0)                          # bits
    keep = surprise <= mu[:, None]
    keep |= lp == jnp.max(lp, axis=-1, keepdims=True)      # argmax survives
    masked = jnp.where(keep, lp, -jnp.inf)
    tok = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    lp_trunc = jax.nn.log_softmax(masked, axis=-1)
    observed = -jnp.take_along_axis(lp_trunc, tok[:, None],
                                    1)[:, 0] / jnp.log(2.0)
    mu = mu - jnp.float32(cfg.mirostat_eta) * (observed
                                               - jnp.float32(cfg.mirostat_tau))
    return tok, mu


def sample(logits: jax.Array, key: jax.Array, cfg: SamplerConfig,
           counts: jax.Array | None = None,
           hist: jax.Array | None = None,
           hist_len: jax.Array | None = None) -> jax.Array:
    """logits (B, V) -> token ids (B,). Static sampler config. `counts`
    (B, V): per-sequence context token counts, required when
    cfg.uses_penalties (penalties apply before temperature, so greedy
    decoding honors them too — same order as llama.cpp). `hist`/`hist_len`
    (B, S)/(B,): ordered context tokens, required when cfg.uses_dry."""
    if cfg.logit_bias:
        ids = jnp.asarray([i for i, _ in cfg.logit_bias], jnp.int32)
        vals = jnp.asarray([v for _, v in cfg.logit_bias], jnp.float32)
        logits = logits.astype(jnp.float32).at[:, ids].add(vals)
    if cfg.uses_penalties:
        assert counts is not None, "penalties need context token counts"
        logits = apply_penalties(logits.astype(jnp.float32), counts, cfg)
    if cfg.uses_dry:
        assert hist is not None and hist_len is not None, \
            "DRY needs the ordered context token history"
        logits = apply_dry(logits.astype(jnp.float32), hist, hist_len, cfg)
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / cfg.temperature
    if cfg.top_n_sigma > 0.0:
        # llama.cpp top-n-sigma: stats over the finite logits only
        mx = jnp.max(logits, axis=-1, keepdims=True)
        mean = jnp.mean(logits, axis=-1, keepdims=True)
        std = jnp.sqrt(jnp.mean((logits - mean) ** 2, axis=-1,
                                keepdims=True))
        logits = jnp.where(logits < mx - cfg.top_n_sigma * std,
                           -jnp.inf, logits)
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.typical_p < 1.0:
        # locally typical sampling (Meister et al., llama.cpp --typical):
        # rank tokens by |surprisal - entropy|, keep the most typical set
        # whose cumulative probability reaches typical_p
        lp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(lp)
        ent = -jnp.sum(jnp.where(p > 0, p * lp, 0.0), axis=-1, keepdims=True)
        score = jnp.abs(-lp - ent)
        order = jnp.argsort(score, axis=-1)                  # ascending
        p_sorted = jnp.take_along_axis(p, order, axis=-1)
        cum = jnp.cumsum(p_sorted, axis=-1)
        n_keep = jnp.sum(cum < cfg.typical_p, axis=-1, keepdims=True) + 1
        keep_sorted = jnp.arange(p.shape[-1])[None, :] < n_keep
        rows = jnp.arange(p.shape[0])[:, None]
        keep = jnp.zeros_like(keep_sorted).at[rows, order].set(keep_sorted)
        logits = jnp.where(keep, logits, -jnp.inf)
    if cfg.min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        cutoff = cfg.min_p * jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < cutoff, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob >= top_p
        cutoff_idx = jnp.argmax(cum >= cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if cfg.xtc_probability > 0.0 and cfg.xtc_threshold <= 0.5:
        key, coin_key = jax.random.split(key)
        probs = jax.nn.softmax(logits, axis=-1)
        over = probs >= cfg.xtc_threshold
        n_over = jnp.sum(over, axis=-1, keepdims=True)
        # the LEAST probable qualifying token always survives (llama.cpp
        # keeps the last one in sorted order); ties all survive
        min_over = jnp.min(jnp.where(over, probs, jnp.inf), axis=-1,
                           keepdims=True)
        coin = (jax.random.uniform(coin_key, (logits.shape[0], 1))
                < cfg.xtc_probability)
        drop = over & (probs > min_over) & coin & (n_over >= 2)
        logits = jnp.where(drop, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
