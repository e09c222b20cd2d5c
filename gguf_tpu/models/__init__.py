"""Model families built on the MMQ kernels."""

from .config import LlamaConfig
from .llama import MMOpts, forward, fuse_llama_params, init_kv_cache
from .loader import load_llama, write_random_llama_gguf

__all__ = [
    "LlamaConfig", "MMOpts", "forward", "fuse_llama_params", "init_kv_cache",
    "load_llama", "write_random_llama_gguf",
]
