"""TILE_TABLE / pick_tiles invariants.

The per-shape decode tile table (ops/common.py, SURVEY.md:296 "per-shape
tile tables — Pallas has no autotuner") is measured data, so nothing else
in the stack validates it: a typo'd entry would surface as a Mosaic
compile error or a silent zero-pad inside a jitted call. Pin the
structural invariants every entry must satisfy and the dispatch rules of
pick_tiles (decode-only, swept-regime gating, prefill fallback).
"""

from gguf_tpu.ops.common import (DECODE_TILES, TILE_TABLE, choose_bm,
                                 pick_tiles, round_up)


def test_table_entries_are_valid_tilings():
    for (m_arr, k), (bm, bk) in TILE_TABLE.items():
        # K-tiles must land on 256-element superblock boundaries and
        # divide the stored K exactly (the kernels' grid maths assume it).
        assert bk % 256 == 0, (m_arr, k, bk)
        assert k % bk == 0, (m_arr, k, bk)
        # choose_bm must land a 128-multiple divisor of the padded M (or
        # the preferred size itself) so no zero-padding happens in-jit.
        eb = choose_bm(m_arr, bm)
        mr = round_up(m_arr, 128)
        assert eb % 128 == 0, (m_arr, bm, eb)
        assert mr % eb == 0 or eb == bm, (m_arr, bm, eb)


def test_pick_tiles_dispatch():
    # Table hit at decode width.
    (m, k), (bm, bk) = next(iter(TILE_TABLE.items()))
    assert pick_tiles(m, k, 2048, 1024, n=16) == (bm, bk)
    # Prefill width (> 64 rows) never consults the table.
    assert pick_tiles(m, k, 2048, 1024, n=512) == (2048, 1024)
    # Unswept small-k shape at decode width keeps the caller's tiles.
    assert pick_tiles(4096, 2560, 2048, 1024, n=16) == (2048, 1024)
    # Swept-regime (k >= 4096) unlisted shape gets the decode default.
    assert pick_tiles(8192, 8192, 2048, 1024, n=16) == DECODE_TILES


def test_known_model_classes_present():
    # The two BASELINE decode geometries must stay covered: losing an
    # entry silently costs 10-30% e2e (RESULTS r4-s1/r4-s3 sweeps).
    llama7b = [(12288, 4096), (4096, 4096), (22528, 4096), (4096, 11264)]
    tinyllama = [(2560, 2048), (2048, 2048), (11264, 2048), (2048, 5632),
                 (32000, 2048)]
    for key in llama7b + tinyllama:
        assert key in TILE_TABLE, key
