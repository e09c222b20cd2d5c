"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; all sharding logic is validated on
host-platform virtual devices (the standard JAX pattern for testing N-device
code without a cluster).

Note: this environment's sitecustomize force-registers the remote 'axon' TPU
plugin and overrides the JAX_PLATFORMS env var, so we must override via
jax.config *after* import — env vars alone are ignored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU (every
# test jits its own forward); warm re-runs skip straight to execution.
# Keyed by program hash + compiler version, so stale entries cannot match.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # config name drift between jax versions

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def toy_spm_metadata(vocab_size: int) -> dict:
    """Minimal SPM tokenizer metadata (3 specials + byte fallback +
    padding) shared by server/stress tests."""
    import numpy as _np

    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    tokens = (tokens + [f"<p{i}>" for i in range(vocab_size)])[:vocab_size]
    return {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": _np.zeros(vocab_size, _np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
