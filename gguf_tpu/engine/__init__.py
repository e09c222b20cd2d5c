"""Serving engine: continuous batching, samplers, tokenizers, HTTP frontend."""

from .bpe_tokenizer import BPETokenizer, tokenizer_from_metadata
from .engine import LLM, GenerationResult
from .sampler import SamplerConfig, sample
from .tokenizer import SPMTokenizer

__all__ = [
    "LLM", "GenerationResult", "SamplerConfig", "sample",
    "SPMTokenizer", "BPETokenizer", "tokenizer_from_metadata",
]
