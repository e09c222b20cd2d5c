"""Real multi-process distributed bring-up on localhost CPU.

Everything else in tests/ runs single-process on a virtual 8-device mesh,
which never executes the jax.distributed.initialize wiring or the
process-local-data branch of the psum health check
(parallel/distributed.py). These tests spawn two ACTUAL processes joined
through a Gloo coordinator and drive:

  1. init_distributed() -> _psum_health_check()'s
     jax.make_array_from_process_local_data branch (process_count() == 2),
  2. a tp=2 shard_map forward where each process owns one device of the
     mesh, asserting both ranks compute identical finite logits.

The reference has no distributed story (SURVEY.md §5); this is the
north-star 2-host serving path scaled down to 2 localhost processes.
Marked slow: each worker pays a full fresh-interpreter JAX import.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    port, pid, model_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from gguf_tpu.parallel.distributed import init_distributed

    info = init_distributed(coordinator_address=f"localhost:{{port}}",
                            num_processes=2, process_id=pid)
    assert info["num_processes"] == 2, info
    assert info["global_devices"] == 2, info
    assert info.get("psum_ok") is True, info
    print(f"PSUM_OK rank={{pid}}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    from gguf_tpu.models import LlamaConfig
    from gguf_tpu.models.loader import write_random_llama_gguf, load_llama
    from gguf_tpu.parallel.tp import (make_mesh, shard_llama, make_tp_forward,
                                      init_sharded_cache)

    cfg0 = LlamaConfig(vocab_size=256, dim=512, n_layers=1, n_heads=4,
                       n_kv_heads=2, ffn_dim=512, max_seq_len=32)
    if pid == 0:   # one writer; rank 1 waits for the atomic rename
        write_random_llama_gguf(model_path + ".tmp", cfg0, seed=3)
        import os as _os; _os.replace(model_path + ".tmp", model_path)
    else:
        import os as _os, time as _time
        deadline = _time.time() + 60
        while not _os.path.exists(model_path):
            assert _time.time() < deadline, "rank 0 never wrote the model"
            _time.sleep(0.2)
    cfg, params = load_llama(model_path)

    mesh = make_mesh(tp=2)           # 2 global devices, 1 per process
    params_s, cfg_s = shard_llama(params, cfg, mesh)
    fwd = make_tp_forward(cfg_s, mesh)
    cache = init_sharded_cache(cfg_s, mesh, batch=2, max_seq=32)
    toks = jnp.asarray(np.full((2, 2), 7, np.int32))
    logits, cache = fwd(params_s, toks, jnp.zeros(2, jnp.int32), cache)
    lg = np.asarray(jax.device_get(logits[:, -1, :8]))
    assert np.isfinite(lg).all(), lg
    print(f"TP_FWD_OK rank={{pid}} " + " ".join(f"{{v:.6f}}" for v in lg[0]),
          flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_tp2_forward(tmp_path):
    """Spawn 2 ranks; assert health check + identical cross-rank logits."""
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    model_path = str(tmp_path / "model.gguf")
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # one real device per process, not 8 virtual
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(rank), model_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path))
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank failed:\n{out}"

    logits = {}
    for rank, out in enumerate(outs):
        assert f"PSUM_OK rank={rank}" in out, out
        for line in out.splitlines():
            if line.startswith(f"TP_FWD_OK rank={rank}"):
                logits[rank] = line.split(None, 2)[2]
    assert set(logits) == {0, 1}, outs
    # the logits all-gather must leave every rank with the same values
    assert logits[0] == logits[1], logits
