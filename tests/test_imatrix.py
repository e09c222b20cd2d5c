"""Importance-matrix calibration + activation-weighted quantization."""

import numpy as np
import pytest

import gguf_tpu.quant as Q
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf
from gguf_tpu.quant import weighted as W

CFG = LlamaConfig(vocab_size=64, dim=256, n_layers=2, n_heads=4,
                  n_kv_heads=2, ffn_dim=512, max_seq_len=64)

DEQ = {"q4_0": Q.dequantize_q4_0, "q5_0": Q.dequantize_q5_0,
       "q4_1": Q.dequantize_q4_1, "q5_1": Q.dequantize_q5_1,
       "q2_k": Q.dequantize_q2_k, "q3_k": Q.dequantize_q3_k,
       "q4_k": Q.dequantize_q4_k,
       "q5_k": Q.dequantize_q5_k, "q6_k": Q.dequantize_q6_k,
       "iq4_nl": Q.dequantize_iq4_nl}
QZ = {"q4_0": Q.quantize_q4_0, "q5_0": Q.quantize_q5_0,
      "q4_1": Q.quantize_q4_1, "q5_1": Q.quantize_q5_1,
      "q2_k": Q.quantize_q2_k, "q3_k": Q.quantize_q3_k,
      "q4_k": Q.quantize_q4_k,
      "q5_k": Q.quantize_q5_k, "q6_k": Q.quantize_q6_k,
      "iq4_nl": Q.quantize_iq4_nl}


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("fmt", sorted(W.WEIGHTED_QUANTIZERS))
def test_weighted_quantize_improves_weighted_error(rng, fmt):
    """Under realistic per-column importance (log-normal, varying WITHIN
    quantization blocks — the shape real imatrix data has), the weighted
    quantizer must beat the plain one decisively under the weighted error
    measure. (Block-uniform weights are the degenerate case where the
    weighted fit reduces to the plain one and gains vanish.)"""
    K = 1024
    x = rng.standard_normal((16, K)).astype(np.float32)
    qw = np.exp(rng.standard_normal(K) * 2).astype(np.float32)
    bw = W.WEIGHTED_QUANTIZERS[fmt](x, qw)
    bu = QZ[fmt](x)
    yw = DEQ[fmt](bw, x.shape)
    yu = DEQ[fmt](bu, x.shape)
    werr_w = float((qw * (x - yw) ** 2).sum())
    werr_u = float((qw * (x - yu) ** 2).sum())
    assert werr_w < 0.9 * werr_u, (fmt, werr_w, werr_u)


@pytest.mark.parametrize("fmt", sorted(W.WEIGHTED_QUANTIZERS))
def test_weighted_quantize_valid_bytes(rng, fmt):
    """Weighted output must parse through the standard byte parsers with
    sane reconstruction (same on-disk contract as the plain codecs)."""
    from gguf_tpu.utils.testing import snr_db

    x = rng.standard_normal((4, 512)).astype(np.float32)
    b = W.WEIGHTED_QUANTIZERS[fmt](x, np.ones(512, np.float32))
    y = DEQ[fmt](b, x.shape)
    assert np.isfinite(y).all()
    assert snr_db(x, x - y) > (4.0 if fmt == "q2_k" else
                                8.0 if fmt == "q3_k" else 10.0)


def test_weighted_flat_and_zero_blocks():
    for fmt, wq in W.WEIGHTED_QUANTIZERS.items():
        n = 512
        b = wq(np.zeros((1, n), np.float32), np.ones(n, np.float32))
        y = DEQ[fmt](b, (1, n))
        np.testing.assert_allclose(y, 0.0, atol=1e-6), fmt


def test_imatrix_file_roundtrip(tmp_path):
    """write_imatrix/read_imatrix speak the same (llama.cpp) binary."""
    from gguf_tpu.eval.imatrix import read_imatrix, write_imatrix

    entries = {
        "blk.0.attn_q.weight": (3, np.arange(8, dtype=np.float32)),
        "output.weight": (7, np.ones(4, np.float32) * 2.5),
    }
    p = str(tmp_path / "im.dat")
    write_imatrix(p, entries, input_name="calib.txt")
    back = read_imatrix(p)
    assert set(back) == set(entries)
    for k in entries:
        assert back[k][0] == entries[k][0]
        np.testing.assert_allclose(back[k][1], entries[k][1])


def test_collect_imatrix_and_weighted_requantize(tmp_path, capsys):
    """End to end: calibrate a tiny model, write the imatrix, requantize
    with --imatrix, and serve the result. The calibrated entries must
    cover every projection class including attn_output (pre-wo stats)."""
    from gguf_tpu.eval.imatrix import collect_imatrix, imatrix_weights, \
        write_imatrix
    from gguf_tpu.models import load_llama
    from gguf_tpu.tools.cli import main

    path = str(tmp_path / "cal.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=3)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, 96)
    entries = collect_imatrix(path, ids, window=32)
    for name in ("blk.0.attn_q.weight", "blk.0.attn_output.weight",
                 "blk.1.ffn_gate.weight", "blk.1.ffn_down.weight",
                 "output.weight"):
        assert name in entries, sorted(entries)[:8]
        ncall, v = entries[name]
        assert ncall >= 2 and (np.asarray(v) >= 0).all()
    # q/k/v share their input stats
    np.testing.assert_allclose(entries["blk.0.attn_q.weight"][1],
                               entries["blk.0.attn_k.weight"][1])
    qw = imatrix_weights(entries, "blk.0.ffn_down.weight", CFG.ffn_dim)
    assert qw is not None and qw.shape == (CFG.ffn_dim,) and (qw > 0).all()

    im_path = str(tmp_path / "im.dat")
    write_imatrix(im_path, entries)
    out_path = str(tmp_path / "wq.gguf")
    main(["requantize", path, out_path, "--fmt", "q4_1",
          "--imatrix", im_path])
    assert "imatrix-weighted" in capsys.readouterr().out
    cfg2, params2 = load_llama(out_path)
    assert params2["layers"][0]["wq"].fmt == "q4_1"

    from gguf_tpu.engine import LLM, SamplerConfig
    out = LLM(out_path, max_batch=1, max_seq=32).generate(
        [[1, 5, 9]], max_new_tokens=4,
        sampler=SamplerConfig(temperature=0.0), stop_at_eos=False)
    assert len(out[0].token_ids) == 4


def test_imatrix_cli(tmp_path, capsys):
    from gguf_tpu.eval.imatrix import read_imatrix
    from gguf_tpu.tools.cli import main

    path = str(tmp_path / "c.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=4)
    toks = tmp_path / "ids.tok"
    toks.write_text(" ".join(str(i % CFG.vocab_size) for i in range(80)))
    im = str(tmp_path / "out.imatrix")
    main(["imatrix", path, str(toks), "-o", im, "--window", "32"])
    assert "tensors" in capsys.readouterr().out
    entries = read_imatrix(im)
    assert "blk.0.ffn_down.weight" in entries
