"""Serving engine: continuous batching, samplers, tokenizer."""

from .engine import LLM, GenerationResult
from .sampler import SamplerConfig, sample
from .tokenizer import SPMTokenizer

__all__ = ["LLM", "GenerationResult", "SamplerConfig", "sample", "SPMTokenizer"]
