"""Device meshes and model parallelism: tensor (tp), data (dp), sequence/
context (sp), expert (ep) and pipeline (pp) sharding."""

from .distributed import init_distributed
from .pp import (
    init_pp_cache, make_pp_decode, make_pp_mesh, pp_generate, shard_pp,
    stack_stages,
)
from .tp import (
    cache_specs, init_sharded_cache, local_cfg, make_mesh, make_tp_forward,
    pad_ffn_for_tp, param_specs, shard_llama, tp_forward_fn,
)

__all__ = [
    "init_distributed", "make_mesh", "shard_llama", "make_tp_forward", "param_specs",
    "cache_specs", "init_sharded_cache", "local_cfg", "pad_ffn_for_tp",
    "tp_forward_fn",
    "make_pp_mesh", "shard_pp", "stack_stages", "init_pp_cache",
    "make_pp_decode", "pp_generate",
]
