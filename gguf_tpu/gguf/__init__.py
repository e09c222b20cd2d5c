"""GGUF file I/O: mmap reader, writer, format constants."""

from .constants import GGMLType, GGUFValueType, GGML_TO_FMT, FMT_TO_GGML
from .reader import GGUFReader
from .writer import write_gguf, quantize_tensor

__all__ = [
    "GGUFReader", "write_gguf", "quantize_tensor",
    "GGMLType", "GGUFValueType", "GGML_TO_FMT", "FMT_TO_GGML",
]
