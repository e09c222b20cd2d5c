"""GGUF reader/writer: round-trips, typed metadata, quantized tensors,
sharded loads."""

import numpy as np
import pytest

from gguf_tpu.gguf import GGMLType, GGUFReader, write_gguf, quantize_tensor
from gguf_tpu.quant import dequantize_q4_k
from gguf_tpu.quant.layouts import from_soa


@pytest.fixture
def gguf_file(tmp_path, rng):
    x_f32 = rng.standard_normal((8, 64)).astype(np.float32)
    x_f16 = rng.standard_normal((4, 32)).astype(np.float16)
    w4 = rng.standard_normal((16, 512)).astype(np.float32)
    w8 = rng.standard_normal((8, 256)).astype(np.float32)
    w6 = rng.standard_normal((8, 512)).astype(np.float32)
    meta = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.rope.freq_base": 10000.0,
        "tokenizer.ggml.tokens": ["<s>", "</s>", "hello"],
        "tokenizer.ggml.scores": np.array([0.0, -1.0, -2.0], dtype=np.float32),
        "some.flag": True,
        "some.signed": -7,
    }
    tensors = {
        "dense.weight": (GGMLType.F32, x_f32.shape, x_f32),
        "half.weight": (GGMLType.F16, x_f16.shape, x_f16),
        "q4.weight": (GGMLType.Q4_K, w4.shape, quantize_tensor(w4, GGMLType.Q4_K)),
        "q8.weight": (GGMLType.Q8_0, w8.shape, quantize_tensor(w8, GGMLType.Q8_0)),
        "q6.weight": (GGMLType.Q6_K, w6.shape, quantize_tensor(w6, GGMLType.Q6_K)),
    }
    path = str(tmp_path / "model.gguf")
    write_gguf(path, meta, tensors)
    return path, meta, tensors, (x_f32, x_f16, w4)


def test_metadata_roundtrip(gguf_file):
    path, meta, _, _ = gguf_file
    with GGUFReader(path) as r:
        assert r.version == 3
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["llama.rope.freq_base"] == pytest.approx(10000.0)
        assert r.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
        np.testing.assert_array_equal(
            r.metadata["tokenizer.ggml.scores"], np.array([0.0, -1.0, -2.0], np.float32))
        assert r.metadata["some.flag"] is True
        assert r.metadata["some.signed"] == -7


def test_float_tensor_roundtrip(gguf_file):
    path, _, _, (x_f32, x_f16, _) = gguf_file
    with GGUFReader(path) as r:
        np.testing.assert_array_equal(r.load_array("dense.weight"), x_f32)
        np.testing.assert_array_equal(r.load_array("half.weight"), x_f16)
        assert r.tensors["dense.weight"].shape == (8, 64)


def test_quant_tensor_bytes_roundtrip(gguf_file, rng):
    path, _, tensors, _ = gguf_file
    with GGUFReader(path) as r:
        for name in ("q4.weight", "q8.weight", "q6.weight"):
            want = np.asarray(tensors[name][2]).view(np.uint8)
            np.testing.assert_array_equal(r.tensor_bytes(name), want)


def test_load_quant_to_soa(gguf_file):
    path, _, tensors, _ = gguf_file
    with GGUFReader(path) as r:
        t = r.load_quant("q4.weight")
        assert t.fmt == "q4_k" and t.shape == (16, 512)
        np.testing.assert_array_equal(
            from_soa(t), np.asarray(tensors["q4.weight"][2]).view(np.uint8))


def test_load_quant_row_shard(gguf_file):
    """Sharded load must equal the matching rows of the full dequant."""
    path, _, _, (_, _, w4) = gguf_file
    with GGUFReader(path) as r:
        full = r.dequantize("q4.weight")
        shard = r.load_quant("q4.weight", rows=slice(8, 16))
        assert shard.shape == (8, 512)
        np.testing.assert_array_equal(np.asarray(shard.dequantize()), full[8:16])


def test_dequantize_matches_codec(gguf_file, rng):
    path, _, tensors, _ = gguf_file
    with GGUFReader(path) as r:
        got = r.dequantize("q4.weight")
        want = dequantize_q4_k(tensors["q4.weight"][2], (16, 512))
        np.testing.assert_array_equal(got, want)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\0" * 100)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFReader(str(p))


def test_reader_tolerates_unsupported_tensor_types(tmp_path):
    """Files containing tensor types without a codec (Q8_K, IQ-series)
    still parse: metadata and supported tensors stay readable; only
    loading the unsupported tensor raises an informative error."""
    import struct

    from gguf_tpu.gguf import GGMLType, GGUFReader
    from gguf_tpu.gguf.writer import write_gguf

    path = str(tmp_path / "mixed.gguf")
    ok = np.arange(8, dtype=np.float32)
    write_gguf(path, {"general.name": "mixed"},
               {"good": (GGMLType.F32, (8,), ok)})
    # append-edit: rewrite the file with a second tensor of type Q8_K
    # (size known, no codec) by crafting it through the writer's raw path
    q8k_bytes = np.zeros(292, np.uint8)  # one 256-elem Q8_K block
    write_gguf(path, {"general.name": "mixed"},
               {"good": (GGMLType.F32, (8,), ok),
                "q8k": (GGMLType.Q8_K, (256,), q8k_bytes)})
    with GGUFReader(path) as r:
        assert r.metadata["general.name"] == "mixed"
        np.testing.assert_array_equal(r.load_array("good"), ok)
        assert r.tensors["q8k"].nbytes == 292
        with pytest.raises(ValueError, match="no MMQ kernel"):
            r.load_quant("q8k")


def test_metadata_types_round_trip(tmp_path):
    """Rewriting a file with the reader's metadata_types keeps each key's
    exact GGUF value type (FLOAT64 precision, INT64 signedness, typed
    arrays) instead of re-inferring FLOAT32/UINT32."""
    from gguf_tpu.gguf.constants import GGUFValueType

    path = str(tmp_path / "typed.gguf")
    pi = 3.141592653589793
    write_gguf(path, {"f64key": pi, "i64key": 7, "arr16": np.arange(4, dtype=np.int16)},
               {"t": (GGMLType.F32, (4,), np.zeros(4, np.float32))},
               metadata_types={"f64key": GGUFValueType.FLOAT64,
                               "i64key": GGUFValueType.INT64})
    with GGUFReader(path) as r:
        assert r.metadata_types["f64key"] == GGUFValueType.FLOAT64
        assert r.metadata["f64key"] == pi          # no f32 truncation
        assert r.metadata_types["i64key"] == GGUFValueType.INT64
        assert r.metadata["arr16"].dtype == np.int16
        md, mdt = dict(r.metadata), dict(r.metadata_types)
    # full read-modify-write keeps the types
    path2 = str(tmp_path / "typed2.gguf")
    write_gguf(path2, md, {"t": (GGMLType.F32, (4,), np.zeros(4, np.float32))},
               metadata_types=mdt)
    with GGUFReader(path2) as r2:
        assert r2.metadata["f64key"] == pi
        assert r2.metadata_types["f64key"] == GGUFValueType.FLOAT64


def test_reader_survives_malformed_files(tmp_path):
    """Corrupt/truncated GGUF files must fail with clean exceptions
    (ValueError/EOFError/UnicodeDecodeError) — never hang, divide by
    zero, or read out of bounds. Deterministic structured fuzz: header
    truncations, byte flips through the metadata section, a poisoned
    alignment, and an out-of-range tensor offset."""
    import struct

    from gguf_tpu.gguf import GGMLType, GGUFReader
    from gguf_tpu.gguf.writer import write_gguf

    base = tmp_path / "ok.gguf"
    write_gguf(str(base), {"general.architecture": "llama",
                           "general.alignment": 32,
                           "llama.block_count": 1},
               {"t.weight": (GGMLType.F32, (4, 8),
                             np.arange(32, dtype=np.float32))})
    blob = base.read_bytes()
    ok_types = (ValueError, EOFError, UnicodeDecodeError, KeyError,
                struct.error, OverflowError)

    # truncations at every prefix length up to the data section
    for cut in list(range(0, 64)) + [len(blob) - 16, len(blob) - 1]:
        p = tmp_path / "cut.gguf"
        p.write_bytes(blob[:cut])
        try:
            r = GGUFReader(str(p))
            r.tensor_bytes("t.weight")   # truncated data must be caught
            r.close()
        except ok_types:
            pass

    # single-byte corruption sweep across the header/metadata region
    for off in range(4, min(len(blob), 200), 7):
        p = tmp_path / "flip.gguf"
        mutated = bytearray(blob)
        mutated[off] ^= 0xFF
        p.write_bytes(bytes(mutated))
        try:
            r = GGUFReader(str(p))
            for name in list(r.tensors):
                try:
                    r.tensor_bytes(name)
                except ok_types:
                    pass
            r.close()
        except ok_types:
            pass

    # alignment = 0 must raise cleanly, not ZeroDivisionError (the
    # writer always emits its own alignment, so poison the bytes: the
    # UINT32 value sits right after the key string)
    key = b"general.alignment"
    at = blob.index(key) + len(key) + 4          # key + value-type tag
    poisoned = blob[:at] + b"\x00\x00\x00\x00" + blob[at + 4:]
    p = tmp_path / "align0.gguf"
    p.write_bytes(poisoned)
    with pytest.raises(ValueError, match="alignment"):
        GGUFReader(str(p))
