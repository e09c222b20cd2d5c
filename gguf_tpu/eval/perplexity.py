"""Perplexity harness — the accuracy gate for quantized serving.

BASELINE.md's accuracy target is "perplexity within 0.01 of llama.cpp at the
same bit-width". The quantized weights this framework consumes are
byte-identical to llama.cpp's GGUF blocks (quant/ codecs are validated
against GGML's C reference), so the comparison reduces to: run the same
token stream through the decoder and accumulate next-token negative
log-likelihood the same way llama.cpp's `perplexity` tool does —
non-overlapping windows of `window` tokens, NLL of each token given the
window prefix, ppl = exp(mean NLL).

Runs entirely through the standard forward() prefill path (one window = one
chunked-prefill call), so what is scored is exactly what serves.

Usage:
    from gguf_tpu.eval import perplexity_of_gguf
    ppl = perplexity_of_gguf("model.gguf", token_ids, window=512)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import MMOpts, forward, init_kv_cache
from ..models.config import LlamaConfig


def _window_nll(params, cfg: LlamaConfig, tokens: jax.Array,
                n_valid: jax.Array, opts: MMOpts, first: int):
    """NLL sum + count over one (B, W) window batch; positions
    first..n_valid-1 are scored (each token conditioned on the window
    prefix). llama.cpp's perplexity tool sets first = max(1, W/2): only
    the second half of each window counts, so every scored token has at
    least W/2 tokens of context — matching that accounting is required
    for the "within 0.01 of llama.cpp" comparison."""
    b, w = tokens.shape
    cache = init_kv_cache(cfg, batch=b, max_seq=w)
    logits, _ = forward(params, cfg, tokens, jnp.zeros(b, jnp.int32),
                        cache, opts)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    idx = jnp.arange(1, w)[None, :]
    valid = (idx >= first) & (idx < n_valid[:, None])
    return jnp.sum(nll * valid), jnp.sum(valid)


def sequence_nll(params, cfg: LlamaConfig, token_ids, *, window: int = 512,
                 batch: int = 8, opts: MMOpts = MMOpts(),
                 full_window: bool = False):
    """(total_nll, token_count) over a token stream, llama.cpp-style
    non-overlapping windows scoring each window's SECOND half (every
    scored token gets >= window/2 context, llama.cpp's accounting).
    full_window=True scores positions 1.. instead (more tokens, higher
    ppl, NOT comparable to llama.cpp). Windows shorter than 2 tokens are
    skipped."""
    ids = np.asarray(token_ids, dtype=np.int32).reshape(-1)
    window = min(window, cfg.max_seq_len)
    n_win = len(ids) // window + (1 if len(ids) % window > 1 else 0)
    if n_win == 0:
        raise ValueError(f"need at least 2 tokens, got {len(ids)}")

    first = 1 if full_window else max(1, window // 2)
    fn = jax.jit(lambda p, t, n: _window_nll(p, cfg, t, n, opts, first))
    total, count = 0.0, 0
    for start in range(0, n_win, batch):
        rows = min(batch, n_win - start)
        toks = np.zeros((rows, window), np.int32)
        nval = np.zeros(rows, np.int32)
        for r in range(rows):
            lo = (start + r) * window
            chunk = ids[lo:lo + window]
            toks[r, :len(chunk)] = chunk
            nval[r] = len(chunk)
        # pad the batch dim to `batch` so every call hits one jit cache entry
        if rows < batch:
            toks = np.pad(toks, ((0, batch - rows), (0, 0)))
            nval = np.pad(nval, (0, batch - rows))
        s, c = fn(params, jnp.asarray(toks), jnp.asarray(nval))
        total += float(s)
        count += int(c)
    return total, count


def perplexity(params, cfg: LlamaConfig, token_ids, **kw) -> float:
    """exp(mean next-token NLL) over the stream."""
    total, count = sequence_nll(params, cfg, token_ids, **kw)
    return float(np.exp(total / max(count, 1)))


def perplexity_of_gguf(path: str, token_ids, *, act_quant: bool = False,
                       **kw) -> float:
    """Load a GGUF checkpoint and score a token stream.

    act_quant=True scores with Q8_1-quantized activations — llama.cpp's MMQ
    numerics, the numerics BASELINE.md's "ppl within 0.01" target is defined
    against. The default (False) scores the bf16-activation fast path that
    `LLM` serves by default; state which one a published number used.
    """
    from ..models import fuse_llama_params, load_llama

    cfg, params = load_llama(path)
    params = fuse_llama_params(params)
    kw.setdefault("opts", MMOpts(act_quant=act_quant))
    return perplexity(params, cfg, token_ids, **kw)
