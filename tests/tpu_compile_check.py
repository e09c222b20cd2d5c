"""On-chip Pallas compile coverage — run MANUALLY on a TPU host:

    python tests/tpu_compile_check.py

NOT a pytest module: tests/conftest.py forces the CPU mesh, and
interpret-mode cannot catch Mosaic lowering failures (a kernel that passes
the whole suite can still SIGABRT the TPU compiler — see
ops/attention.py's t>1 docstring). This drives every kernel shape class
the serving engine uses on the real chip.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", "run this on a TPU host"
    _ = np.asarray(jnp.zeros((1, 1)))  # warm the transfer path
    rng = np.random.default_rng(0)

    # 1. every MMQ kernel at decode and prefill N, odd M
    from gguf_tpu.ops import MMQ
    from gguf_tpu.quant import (quantize_q2_k, quantize_q3_k, quantize_q4_k,
                                quantize_q5_k, quantize_q6_k, quantize_q8_0,
                                quantize_q4_0, quantize_q4_1, quantize_q5_0,
                                quantize_q5_1, quantize_iq4_nl,
                                quantize_iq4_xs)
    from gguf_tpu.quant.layouts import to_soa

    quants = {"q8_0": quantize_q8_0, "q2_k": quantize_q2_k,
              "q3_k": quantize_q3_k, "q4_k": quantize_q4_k,
              "q5_k": quantize_q5_k, "q6_k": quantize_q6_k,
              "q4_0": quantize_q4_0, "q4_1": quantize_q4_1,
              "q5_0": quantize_q5_0, "q5_1": quantize_q5_1,
              "iq4_nl": quantize_iq4_nl, "iq4_xs": quantize_iq4_xs}
    a = rng.standard_normal((300, 512)).astype(np.float16)
    for fmt, q in quants.items():
        w = jax.device_put(to_soa(fmt, q(a), 300, 512))
        for n in (1, 16, 300):
            x = jnp.asarray(rng.standard_normal((n, 512)).astype(np.float32))
            out = np.asarray(MMQ[fmt](w, x, precision="fast"))
            assert np.isfinite(out).all(), (fmt, n)
        # the contract mode (act_quant + high) is its own Mosaic class —
        # for q4_k it lowers the int8-MXU block-partial kernel (r5)
        x = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
        out = np.asarray(MMQ[fmt](w, x, precision="high", act_quant=True))
        assert np.isfinite(out).all(), (fmt, "contract")
        print(f"mmq_{fmt}: ok (n=1/16/300 + contract)")

    # 2. fused attention at every engine shape class
    from gguf_tpu.ops.attention import decode_attention, decode_attention_update

    for (b, h, kvh, s, hd, t) in [(1, 8, 2, 128, 64, 8),   # prefill bucket
                                  (1, 8, 2, 128, 64, 1),   # decode b=1
                                  (16, 32, 4, 256, 64, 1),  # decode GQA
                                  (16, 32, 32, 256, 128, 1),  # decode MHA
                                  # fused insert+attend envelope BOUNDARY
                                  # (KVH*span*hd == 2^17; r5): the
                                  # mistral-7B GQA class — compiled the
                                  # r5 fused kernel on-chip
                                  (16, 32, 8, 256, 128, 1),
                                  (4, 8, 2, 64, 64, 4),     # short chunk
                                  (4, 8, 2, 64, 64, 1)]:    # decode, S%128!=0
        q = jnp.asarray(rng.standard_normal((b, h, t, hd)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((b, kvh, t, hd)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, kvh, t, hd)), jnp.float32)
        z8 = jnp.zeros((b, kvh, s, hd), jnp.int8)
        zf = jnp.zeros((b, kvh, s), jnp.float32)
        out = decode_attention_update(q, kn, vn, z8, zf, z8, zf,
                                      jnp.zeros(b, jnp.int32), t=t)
        assert np.isfinite(np.asarray(out[0])).all()
        if s >= 256:  # span-bucketed read (the engine's steady state)
            out = decode_attention_update(q, kn, vn, z8, zf, z8, zf,
                                          jnp.zeros(b, jnp.int32), t=t,
                                          span=128)
            assert np.isfinite(np.asarray(out[0])).all()
        print(f"attention b={b} kvh={kvh} s={s} hd={hd} t={t}: ok")

    # 2a'. gemma2-family sliding window + softcap in the fused kernels
    for (b, h, kvh, s, hd, t) in [(1, 8, 2, 128, 64, 8),
                                  (4, 8, 2, 128, 64, 1)]:
        q = jnp.asarray(rng.standard_normal((b, h, t, hd)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((b, kvh, t, hd)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, kvh, t, hd)), jnp.float32)
        z8 = jnp.zeros((b, kvh, s, hd), jnp.int8)
        zf = jnp.zeros((b, kvh, s), jnp.float32)
        out = decode_attention_update(q, kn, vn, z8, zf, z8, zf,
                                      jnp.zeros(b, jnp.int32), t=t,
                                      window=32, softcap=20.0)
        assert np.isfinite(np.asarray(out[0])).all()
        print(f"attention window/softcap b={b} t={t}: ok")

    # 2b. flash-decoding tiled kernel (long spans past the VMEM budget)
    from gguf_tpu.ops.attention import decode_attention_tiled

    b, h, kvh, s, hd = 8, 32, 32, 1024, 128
    q = jnp.asarray(rng.standard_normal((b, h, 1, hd)), jnp.float32)
    z8 = jnp.zeros((b, kvh, s, hd), jnp.int8)
    zf = jnp.zeros((b, kvh, s), jnp.float32)
    out = decode_attention_tiled(q, z8, zf, z8, zf,
                                 jnp.zeros(b, jnp.int32), span=1024)
    assert np.isfinite(np.asarray(out)).all()
    print("tiled attention span=1024 MHA: ok")
    out = decode_attention_tiled(q, z8, zf, z8, zf,
                                 jnp.zeros(b, jnp.int32), span=1024,
                                 window=256, softcap=20.0)
    assert np.isfinite(np.asarray(out)).all()
    print("tiled attention window/softcap: ok")

    # 2b'. long-span boundary classes (VERDICT r3 #7: span=1024 once hit an
    # unpinned Mosaic failure, RESULTS line 65 — pin every serving-range
    # span bucket on-chip so the tiled dispatch can't regress silently)
    for span in (2048, 4096):
        b2 = 4
        z8 = jnp.zeros((b2, kvh, span, hd), jnp.int8)
        zf = jnp.zeros((b2, kvh, span), jnp.float32)
        q2 = jnp.asarray(rng.standard_normal((b2, h, 1, hd)), jnp.float32)
        out = decode_attention_tiled(q2, z8, zf, z8, zf,
                                     jnp.zeros(b2, jnp.int32), span=span)
        assert np.isfinite(np.asarray(out)).all()
        print(f"tiled attention span={span} MHA: ok")

    # 3. the engine end to end (prefill + chunked decode + sampler)
    import os
    import tempfile

    from gguf_tpu.engine import LLM, SamplerConfig
    from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

    path = os.path.join(tempfile.gettempdir(), "tpu_compile_check.gguf")
    if not os.path.exists(path):
        write_random_llama_gguf(path, LlamaConfig(
            vocab_size=256, dim=512, n_layers=2, n_heads=8, n_kv_heads=2,
            ffn_dim=1024, max_seq_len=128), seed=3)
    llm = LLM(path, max_batch=4, max_seq=64)
    res = llm.generate([[1, 5, 9], [2, 7]], max_new_tokens=8,
                       sampler=SamplerConfig(temperature=0.0),
                       stop_at_eos=False)
    assert all(len(r.token_ids) == 8 for r in res)
    print("engine generate: ok", [r.token_ids[:3] for r in res])

    # 3b. gemma-arch forward (GELU FFN, scaled embeddings, decoupled head_dim)
    gpath = os.path.join(tempfile.gettempdir(), "tpu_compile_check_gemma.gguf")
    if not os.path.exists(gpath):
        write_random_llama_gguf(gpath, LlamaConfig(
            vocab_size=256, dim=512, n_layers=1, n_heads=4, n_kv_heads=2,
            ffn_dim=512, max_seq_len=64, head_dim_override=64),
            seed=5, arch="gemma")
    gllm = LLM(gpath, max_batch=2, max_seq=32)
    gres = gllm.generate([[1, 2, 3]], max_new_tokens=4,
                         sampler=SamplerConfig(temperature=0.0),
                         stop_at_eos=False)
    assert len(gres[0].token_ids) == 4
    print("gemma generate: ok", gres[0].token_ids)

    # 3c. deepseek2 MLA forward: drives the fused attention kernels at the
    # absorbed-MLA shape class (kv heads = 1, cache row = latent+rope = 256)
    dpath = os.path.join(tempfile.gettempdir(), "tpu_compile_check_ds2.gguf")
    if not os.path.exists(dpath):
        write_random_llama_gguf(dpath, LlamaConfig(
            vocab_size=256, dim=512, n_layers=2, n_heads=8, n_kv_heads=8,
            ffn_dim=512, max_seq_len=64, head_dim_override=96,
            q_lora_rank=64, kv_lora_rank=128, qk_rope_dim=32, v_head_dim=64,
            rope_dim=32, n_experts=4, n_experts_used=2,
            leading_dense_layers=1, n_shared_experts=1, routed_scale=2.0,
            moe_renorm=False), seed=7, arch="deepseek2")
    dllm = LLM(dpath, max_batch=2, max_seq=64)
    dres = dllm.generate([[1, 2, 3], [4, 5]], max_new_tokens=6,
                         sampler=SamplerConfig(temperature=0.0),
                         stop_at_eos=False)
    assert all(len(r.token_ids) == 6 for r in dres)
    print("deepseek2 MLA generate: ok", [r.token_ids[:3] for r in dres])

    # 3d. mamba: recurrent-state cache (lax.scan SSM recurrence + shifted
    # conv slices) through prefill + chunked decode
    mpath = os.path.join(tempfile.gettempdir(), "tpu_compile_check_mamba.gguf")
    if not os.path.exists(mpath):
        write_random_llama_gguf(mpath, LlamaConfig(
            vocab_size=256, dim=256, n_layers=2, n_heads=0, n_kv_heads=0,
            ffn_dim=0, max_seq_len=64, ssm_inner=512, ssm_state=16,
            ssm_conv=4, ssm_dt_rank=16), seed=9, arch="mamba")
    mllm = LLM(mpath, max_batch=2, max_seq=64)
    mres = mllm.generate([[1, 2, 3], [4, 5]], max_new_tokens=6,
                         sampler=SamplerConfig(temperature=0.0),
                         stop_at_eos=False)
    assert all(len(r.token_ids) == 6 for r in mres)
    print("mamba generate: ok", [r.token_ids[:3] for r in mres])

    # 3e. multimodal: CLIP tower + embeds-prefill path
    from gguf_tpu.models.clip import ClipVisionConfig, write_random_mmproj

    vpath = os.path.join(tempfile.gettempdir(), "tpu_compile_check_mm.gguf")
    vcfg = ClipVisionConfig(
        image_size=32, patch_size=8, dim=64, n_layers=2, n_heads=4,
        ffn_dim=128, norm_eps=1e-5, proj_dim=512,
        image_mean=(0.48, 0.46, 0.41), image_std=(0.27, 0.26, 0.28),
        projector="mlp")
    if not os.path.exists(vpath):
        write_random_mmproj(vpath, vcfg, seed=11)
    vllm = LLM(path, max_batch=2, max_seq=64, mmproj=vpath)
    img = rng.random((32, 32, 3)).astype(np.float32)
    vres = vllm.generate([[1, 2, img, 3]], max_new_tokens=4,
                         sampler=SamplerConfig(temperature=0.0),
                         stop_at_eos=False)
    assert len(vres[0].token_ids) == 4
    print("multimodal generate: ok", vres[0].token_ids)
    print("ALL TPU COMPILE CHECKS PASSED")


if __name__ == "__main__":
    main()
