"""Device meshes and tensor-parallel sharding."""

from .distributed import init_distributed
from .tp import (
    cache_specs, init_sharded_cache, local_cfg, make_mesh, make_tp_forward,
    pad_ffn_for_tp, param_specs, shard_llama, tp_forward_fn,
)

__all__ = [
    "init_distributed", "make_mesh", "shard_llama", "make_tp_forward", "param_specs",
    "cache_specs", "init_sharded_cache", "local_cfg", "pad_ffn_for_tp",
    "tp_forward_fn",
]
