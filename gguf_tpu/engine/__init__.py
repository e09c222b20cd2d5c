"""Serving engine: continuous batching, samplers, tokenizers, HTTP frontend."""

from .bpe_tokenizer import BPETokenizer, tokenizer_from_metadata
from .engine import (ChatSession, LLM, GenerationResult,
                     encode_with_specials)
from .sampler import SamplerConfig, sample
from .tokenizer import SPMTokenizer

__all__ = [
    "LLM", "ChatSession", "GenerationResult", "encode_with_specials", "SamplerConfig", "sample",
    "SPMTokenizer", "BPETokenizer", "tokenizer_from_metadata",
]
