"""Fused dequantize+matmul for Q4_K weights — the flagship MMQ kernel.

Capability match of /root/reference/kernels/mmq_q4_k.py (mul_mat_q4_k_triton
:118, mmq_q4_k :240): C = (A @ B.T).T with A = Q4_K-quantized (M, K) weights
and B = (N, K) float activations, output (N, M).

TPU-first design — not a translation of the CUDA/Triton kernel:

* The Triton kernel walks 144-byte interleaved blocks with per-lane pointer
  arithmetic and decodes the 6-bit scale packing with masked byte loads
  (reference :31-80). Here the GGUF loader has already split the superblocks
  into K-major SoA arrays (quant/layouts.py) so every input is a whole VMEM
  tile with M on the 128-aligned lane dimension.
* qs is stored in PLANE order (byte row rb of a superblock packs the two
  elements (block rb%8, pos rb//8) and (_, pos+16), layouts.py
  _repack_nibbles_plane), so the per-32-block scale multiply is a tiled
  pattern — `pltpu.repeat(scales, 16)`, a cheap copy-tile — applied to each
  128-row unpack plane before the sublane concat. The previous element-order
  layout needed a 3D reshape-broadcast multiply whose Mosaic lowering cost
  ~14% of the kernel (on-chip A/B: benchmarks/probe_q4k_ab.py, 428 vs 487
  GB/s at 4096x4096 n=16). The matching activation-column permutation is one
  XLA transpose on the (N, K) side — 128x smaller than the weight side.
* The Triton kernel does per-32-block int8 `tl.dot`s with 2x2 output tiles.
  The MXU wants large contractions: for the float serving path the scaled
  tile is dequantized in VMEM and one (TN, TK) x (TK, TM) dot runs per
  grid step with f32 accumulation. The int8-MXU formulation the reference
  contract implies was MEASURED in round 5 (benchmarks/probe_i8bd.py,
  r5-s1): a block-partial restructuring (Bd = repeat+mask of the Q8_1
  codes, per-superblock (8n, 256) x (256, TM) int8 dots -> int32 partials,
  f32 scale combine) keeps full-depth contractions and one MXU row-tile at
  n <= 16, and runs AT the bf16 path's speed (427 vs 435 GB/s same-stage)
  — the partial-tensor VMEM traffic spends what the halved MXU ingest
  saves, so it does NOT beat bf16 for serving (the same probe's bf16
  block-partial variant measured 354, slower than flat). It therefore
  ships as the act_quant+high CONTRACT path (_kernel_i8), where it
  replaces an f32-HIGHEST emulation 2.5x slower; see docs/DESIGN.md §2b.
* The per-32-block affine min FOLDS INTO the dequant multiply as an fma
  (w = q*scale - min_expanded, _unpack_scaled) — zero extra per-element
  ops, mathematically identical to the reference's Q8_1 `s`-field
  correction (sum_k min*b = min * blocksum; reference q8_1.py:1-13) up to
  the fp16 rounding of the stored s, far inside the 1% contract. Rounds
  2-3 carried the correction as a separate bsum stream + min-term matmul;
  the r4 overlap probes showed that machinery was pure glue overhead at
  decode widths (benchmarks/probe_overlap.py part2/part4), so it is gone.
* Activation quantization is hoisted out of the kernel (ops/activation.py)
  instead of being redone per M-tile as the CUDA grid must (reference
  :202-207): `act_quant=True` reproduces the reference numeric contract;
  False skips the fake-quant for pure bf16/f32 serving.
* At decode widths (n <= 64) the remaining per-call XLA glue — the (N, K)
  plane permute and the bf16 cast — moves INSIDE the kernel: the permute
  is a per-superblock (N, 256) x (256, 256) permutation-matrix matmul
  (exact on the MXU; 0/1 entries are exact in bf16 and every output
  selects one addend). A fused block-diagonal single-dot variant measured
  31% slower (its zeros cost real MXU tile loads; q4k_glue ink_bigg vs
  ink_pmat, r4 session). Prefill keeps the XLA-side glue: at large N the
  MXU is FLOP-bound and the +K/8 permute FLOPs would cost more than the
  amortized glue.

Grid: (N/TN, M/TM, K/TK), K innermost; f32 accumulator in VMEM scratch,
output tile written once on the last K step. N-tiling keeps prefill-sized
batches inside the VMEM budget; decode fits one N tile. The per-superblock
d/dmin arrays (K/256 rows — below the 8-sublane tile minimum for small
K-tiles) are regrouped to 8-row-padded per-step groups by the wrapper
(common.py:regroup_rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.layouts import QuantTensor
from .activation import fake_quantize_q8_1
from .common import (
    choose_bm, fp16_bits_to_f32, pad_cols, pad_rows,
    pick_block, regroup_rows, round_up, running_interpreted,
)

QK_K = 256

# decode-width ceiling for the in-kernel glue path (see module docstring)
INK_GLUE_MAX_N = 64


def permute_acts_q4k(b: jax.Array) -> jax.Array:
    """Reorder activation columns to match the Q4_K plane qs layout: within
    each superblock, element (g*32 + h*16 + p') moves to column
    (h*128 + p'*8 + g). One XLA transpose on the small (N, K) side."""
    n, k = b.shape
    return b.reshape(n, k // QK_K, 8, 2, 16).transpose(0, 1, 3, 4, 2) \
            .reshape(n, k)


def _plane_perm_np():
    """(256, 256) 0/1 numpy matrix P with b_plane = b_natural @ P per
    superblock (the permute_acts_q4k column map as an MXU op)."""
    import numpy as np

    p = np.zeros((QK_K, QK_K), np.float32)
    g, h, pp = np.meshgrid(np.arange(8), np.arange(2), np.arange(16),
                           indexing="ij")
    p[(g * 32 + h * 16 + pp).ravel(), (h * 128 + pp * 8 + g).ravel()] = 1.0
    return p


def _glue_matrix(bk: int, perm256, log2_blk: int | None) -> jax.Array:
    """(bk, bk [+128]) 0/1 matrix G fusing the WHOLE in-kernel activation
    glue into ONE MXU dot: b_nat @ G = [b_plane | blocksums]. Columns
    0..bk hold the per-superblock permutation as a block diagonal; when
    log2_blk is given, 128 extra columns (lane-padded) hold the
    per-2^log2_blk-column sum indicators. Replaces sbt permute dots + one
    HIGHEST bsum dot per K-step with a single issue — at decode widths the
    glue cost is dot-ISSUE-dominated, not FLOP-dominated (r4 measurement:
    shipped ink kernel 21.6us vs its no-glue equivalent 19.0us at 4096^2
    n=16, benchmarks/probe_overlap.py part2). 0/1 entries are exact in
    bf16; every output column selects (or sums) exact addends."""
    import numpy as np

    sbt = bk // QK_K
    ncol = bk + (128 if log2_blk is not None else 0)
    g = np.zeros((bk, ncol), np.float32)
    p = np.asarray(perm256, np.float32)
    for s in range(sbt):
        g[s * QK_K:(s + 1) * QK_K, s * QK_K:(s + 1) * QK_K] = p
    if log2_blk is not None:
        g[np.arange(bk), bk + (np.arange(bk) >> log2_blk)] = 1.0
    return jnp.asarray(g, jnp.bfloat16)


def _scale_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref):
    """Per-32-block affine params for this K-step, f32: scale = d*sc,
    min = dmin*mn — broadcast multiplies, never row-expanded copies. The
    d/dmin refs are this step's 8-row-padded superblock rows (Mosaic
    rejects non-8-aligned dynamic sublane slices)."""
    d = fp16_bits_to_f32(d_ref[:sbt, :])                     # (SBt, TM)
    dmin = fp16_bits_to_f32(dmin_ref[:sbt, :])
    sc = sc_ref[:].astype(jnp.int32).astype(jnp.float32)     # (SBt*8, TM)
    mn = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
    tm = sc.shape[-1]
    scale32 = (d[:, None, :] * sc.reshape(sbt, 8, tm)).reshape(sbt * 8, tm)
    min32 = (dmin[:, None, :] * mn.reshape(sbt, 8, tm)).reshape(sbt * 8, tm)
    return scale32, min32


def _unpack_scaled(sbt, qs_ref, scale32, min32):
    """Plane unpack + affine dequant: rows of each 128-row plane carry
    block (row % 8), so the per-32-block scale AND min are 16x copy-tiles
    of the superblock's 8 scale rows — pltpu.repeat, not a
    reshape-broadcast. The min rides the scale multiply as an fma
    (q*se - me), so the affine correction costs ZERO extra per-element ops
    — round 4 removed the separate bsum/min-term matmul machinery this
    fold obsoletes (r4 ablation: the min term was pure overhead in the ink
    glue and ~free only when fully overlapped; folding deletes the bsum
    stream, its XLA prefill computation, and the min-term dot)."""
    vi = qs_ref[:].astype(jnp.int32)
    parts = []
    for s in range(sbt):
        sl = vi[s * 128:(s + 1) * 128, :]
        se = pltpu.repeat(scale32[s * 8:(s + 1) * 8, :], 16, axis=0)
        me = pltpu.repeat(min32[s * 8:(s + 1) * 8, :], 16, axis=0)
        parts.append((sl & 0xF).astype(jnp.float32) * se - me)
        parts.append((sl >> 4).astype(jnp.float32) * se - me)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _kernel(fast, sbt, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, b_ref,
            out_ref, acc_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale32, min32 = _scale_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    w = _unpack_scaled(sbt, qs_ref, scale32, min32)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        b_ref[:], wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _ink_b_prep(fast, sbt, b_ref, p_ref):
    return _ink_b_prep_val(fast, sbt, b_ref[:], p_ref)


def _ink_b_prep_val(fast, sbt, bt, p_ref):
    """In-kernel activation glue for the decode path: from a NATURAL-order
    f32 b tile, produce the plane-permuted dot operand via per-superblock
    (BN, 256) x (256, 256) 0/1-matrix matmuls — exact selection in either
    precision (0/1 entries are exact in bf16 and every output selects one
    addend). With the affine min folded into the weight dequant
    (_unpack_scaled), the permute is the ONLY remaining glue: no block
    sums, no min-term dot. A fused block-diagonal one-dot variant was
    measured 31% SLOWER (q4k_glue ink_bigg 15.95us vs ink_pmat 12.15us,
    r4 session) — but that number is for the bsum-AUGMENTED (bk, bk+128)
    matrix the pre-min-fold kernel needed, whose 128 always-dense extra
    columns make every weight-tile load unavoidable. The PURE (bk, bk)
    block diagonal was never the losing variant and WON for
    q3_k/q6_k/q8_0 (messier per-plane permutes); q4_k/q2_k keep
    per-superblock (256, 256) dots, which the same session measured
    fastest for this kernel's 2-plane reorder (ADVICE r4 note)."""
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    bc = bt.astype(jnp.bfloat16) if fast else bt
    pm = p_ref[:].astype(bc.dtype)
    return jnp.concatenate(
        [jax.lax.dot_general(
            bc[:, s * QK_K:(s + 1) * QK_K], pm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
         for s in range(sbt)], axis=1)


def _kernel_ink(fast, sbt, glu, d_ref, dmin_ref, sc_ref, mn_ref, qs_ref,
                *rest):
    """Decode-width variant: b arrives in NATURAL column order (f32); the
    plane permute, per-32-block sums, and bf16 cast run in-kernel (see
    module docstring — saves ~7 us/call of XLA glue at 4096^2).

    `glu` ("silu"/"gelu") fuses the gated-MLP activation into the b prep
    (r5, VERDICT #1c "attack the other term"): the caller passes the raw
    fused gate_up projection output and TWO b BlockSpecs window its gate
    and up halves per K-step, so h = act(gate) * up is computed on the
    (BN, BK) tile in-kernel — the XLA split/act/mul fusions and the h
    round-trip through HBM disappear from the layer. f32 math, identical
    to the XLA path's (jax.nn.silu on f32)."""
    if glu:
        g_ref, u_ref, p_ref, out_ref, acc_ref = rest
    else:
        b_ref, p_ref, out_ref, acc_ref = rest
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scale32, min32 = _scale_prep(sbt, d_ref, dmin_ref, sc_ref, mn_ref)
    w = _unpack_scaled(sbt, qs_ref, scale32, min32)
    if glu:
        g = g_ref[:]
        bt = (jax.nn.silu(g) if glu == "silu"
              else jax.nn.gelu(g, approximate=True)) * u_ref[:]
        bp = _ink_b_prep_val(fast, sbt, bt, p_ref)
    else:
        bp = _ink_b_prep(fast, sbt, b_ref, p_ref)

    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    wd = w.astype(jnp.bfloat16) if fast else w
    acc_ref[:] += jax.lax.dot_general(
        bp.astype(wd.dtype), wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _kernel_i8(n16, sbt, sb_total, has_qh, *args):
    """Int8-MXU contract path (r5): the reference's integer-dot semantics
    (/root/reference/kernels/mmq_q4_k.py:202-221) done TPU-natively.

    Per superblock, a BLOCK-PARTIAL dot — Bd[(c*16 + i), k] =
    qb[i, k] * (k's 32-block == c), built by pltpu.repeat + a static iota
    mask — contracts the FULL 256 columns at once: int8 x int8 -> int32
    partials p[(c,i), m] with one MXU row-tile at n<=16 (8*16 = 128 rows),
    refuting both legs of the old rejection (32-deep dots / VPU combine
    cost; see benchmarks/probe_i8bd.py, r5-s1). The int32 partials are
    exact; f32 combine applies the per-32-block weight scale s32 = d*sc
    and activation scale db, and the Q8_1 s-field x min32 dot on the last
    K-step supplies the affine min term — bit-faithful to the golden's
    math (quant/golden.py:mmq_q4_k_q8_1_golden) up to f32 mult ordering.

    Kernel-only throughput matches the bf16 serving path (427 vs 435 GB/s
    same-stage) instead of paying the f32-HIGHEST MXU emulation the old
    contract path used (173.5 GB/s, r4-s3 aT_high).

    `has_qh` adds the Q5_K fifth-bit plane ((sl>>4|f<<4) codes, same
    per-32 affine structure) — Q5_K rides the identical partial-dot
    machinery, codes 0..31 still exact in int8."""
    if has_qh:
        (d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, qh_ref, qb_ref, db_ref,
         sf_ref, out_ref, acc_ref, s32_ref, mn32_ref) = args
    else:
        (d_ref, dmin_ref, sc_ref, mn_ref, qs_ref, qb_ref, db_ref,
         sf_ref, out_ref, acc_ref, s32_ref, mn32_ref) = args
        qh_ref = None
    j = pl.program_id(1)
    nblk = sbt * 8

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        scf = sc_ref[:].astype(jnp.int32).astype(jnp.float32)
        mnf = mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        d = fp16_bits_to_f32(d_ref[:])
        dm = fp16_bits_to_f32(dmin_ref[:])
        for sb in range(sb_total):
            s32_ref[sb * 8:(sb + 1) * 8, :] = \
                scf[sb * 8:(sb + 1) * 8, :] * d[sb:sb + 1, :]
            mn32_ref[sb * 8:(sb + 1) * 8, :] = \
                mnf[sb * 8:(sb + 1) * 8, :] * dm[sb:sb + 1, :]

    vi = qs_ref[:].astype(jnp.int32)
    qb = qb_ref[:]                                   # (n16, bk) i8, plane
    dbs = db_ref[:]                                  # (n16, 128) f32

    # plane order puts element k of a superblock in 32-block (k % 8)
    rr = jax.lax.broadcasted_iota(jnp.int32, (8 * n16, QK_K), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (8 * n16, QK_K), 1)
    keep = (cc & 7) == (rr // n16)

    s32_step = s32_ref[pl.ds(j * nblk, nblk), :]     # (nblk, bm) f32
    hi_i = qh_ref[:].astype(jnp.int32) if has_qh else None

    for s in range(sbt):
        sl = vi[s * 128:(s + 1) * 128, :]
        if has_qh:
            hs = hi_i[s * 32:(s + 1) * 32, :]
            f_lo = jnp.concatenate([(hs >> b) & 1 for b in range(4)], axis=0)
            f_hi = jnp.concatenate(
                [(hs >> b) & 1 for b in range(4, 7)] + [hs >> 7], axis=0)
            w8 = jnp.concatenate(
                [((sl & 0xF) | (f_lo << 4)).astype(jnp.int8),
                 ((sl >> 4) | (f_hi << 4)).astype(jnp.int8)], axis=0)
        else:
            w8 = jnp.concatenate(
                [(sl & 0xF).astype(jnp.int8),
                 (sl >> 4).astype(jnp.int8)], axis=0)    # (256, bm) i8
        brep = pltpu.repeat(qb[:, s * QK_K:(s + 1) * QK_K], 8, axis=0)
        bd = jnp.where(keep, brep, jnp.int8(0))
        p = jax.lax.dot_general(
            bd, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # (8*n16, bm) exact
        tot = None
        for c in range(8):
            g = s * 8 + c
            pc = p[c * n16:(c + 1) * n16, :].astype(jnp.float32) * \
                dbs[:, g:g + 1]
            term = pc * s32_step[g:g + 1, :]
            tot = term if tot is None else tot + term
        acc_ref[:] += tot

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:] - jax.lax.dot_general(
            sf_ref[:], mn32_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mmq_q4_k_i8(w: QuantTensor, b: jax.Array, block_m: int, block_k: int,
                 out_dtype) -> jax.Array:
    """Wrapper for the int8-MXU contract path (n <= 16 decode widths).
    Serves q4_k AND q5_k (w.qh present -> fifth-bit plane in-kernel)."""
    from .activation import quantize_q8_1_codes

    m, k = w.shape
    n = b.shape[0]
    n16 = 16
    qb, d_act, sf = quantize_q8_1_codes(b)
    qb = pad_rows(permute_acts_q4k(qb), n16)         # (16, k) i8, plane
    sf = pad_rows(sf, n16)                           # (16, k/32) f32

    sb = k // QK_K
    ell = sb * 8                                     # total 32-blocks
    # mn32/s32 live whole-K in f32 scratch; cap bm so both fit in ~4.5MB
    # alongside the resident scale planes and double-buffered qs —
    # measured envelope on this Mosaic: (4096, k=4096) = 4MB compiles,
    # (2048, k=11264) = 5.8MB aborts the remote compiler (r5-s1 bisect)
    bm_cap = max(128, (9 * 2**19 // (8 * ell)) // 128 * 128)
    bm = choose_bm(w.qs.shape[-1], min(block_m, bm_cap))
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K
    steps = k // bk
    nblk = sbt * 8

    db = d_act.reshape(n, steps, nblk).transpose(1, 0, 2)
    db = jnp.pad(db, ((0, 0), (0, n16 - n), (0, 128 - nblk)))
    db = db.reshape(steps * n16, 128)

    sb8 = max(8, round_up(sb, 8))
    d_bits = pad_rows(pad_cols(w.d_bits, m_pad), sb8)
    dmin_bits = pad_rows(pad_cols(w.dmin_bits, m_pad), sb8)
    sc = pad_cols(w.sc, m_pad)
    mn = pad_cols(w.mn, m_pad)
    qs = pad_cols(w.qs, m_pad)
    has_qh = w.qh is not None
    qh_ops = (pad_cols(w.qh, m_pad),) if has_qh else ()

    grid = (m_pad // bm, steps)
    specs = [
        pl.BlockSpec((sb8, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sb8, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ell, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ell, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bm), lambda i, j: (j, i), memory_space=pltpu.VMEM),
    ]
    if has_qh:
        specs.append(pl.BlockSpec((bk // 8, bm), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM))
    specs += [
        pl.BlockSpec((n16, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((n16, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n16, ell), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]

    out = pl.pallas_call(
        functools.partial(_kernel_i8, n16, sbt, sb, has_qh),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((n16, bm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n16, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((n16, bm), jnp.float32),
                        pltpu.VMEM((ell, bm), jnp.float32),
                        pltpu.VMEM((ell, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n16 * 8,
            bytes_accessed=m_pad * sb * (176 if has_qh else 144)
            + n16 * k + n16 * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, dmin_bits, sc, mn, qs, *qh_ops, qb, db, sf)

    return out[:n, :m]


@functools.partial(
    jax.jit,
    static_argnames=("act_quant", "block_m", "block_k", "out_dtype",
                     "precision", "glu"),
)
def mmq_q4_k(
    w: QuantTensor,
    b: jax.Array,
    *,
    act_quant: bool = True,
    block_m: int = 2048,
    block_k: int = 1024,
    out_dtype=jnp.float32,
    precision: str = "high",
    glu: str | None = None,
) -> jax.Array:
    """C = (A @ B.T).T for Q4_K weights A (M, K SoA layout) and float B (N, K).

    Returns (N, M). K must be a multiple of 256 (the superblock size, same
    contract as the reference, mmq_q4_k.py:263). precision='high' keeps f32
    MXU passes (accurate to ~2^-24); 'fast' uses single-pass bf16.

    glu="silu"/"gelu": b is the RAW fused gate_up projection (N, 2K) and
    h = act(b[:, :K]) * b[:, K:] is computed in-kernel at decode widths
    (two BlockSpec windows over the same operand) — the gated-MLP
    activation chain and its HBM round-trip fold into the down GEMM.
    Falls back to the identical XLA math at prefill widths / act_quant.
    """
    assert w.fmt == "q4_k"
    m, k = w.shape
    n = b.shape[0]
    if glu is not None:
        assert b.shape[1] == 2 * k, (b.shape, w.shape)
        if act_quant or max(8, round_up(n, 8)) > INK_GLUE_MAX_N:
            g, u = jnp.split(b, 2, axis=-1)
            gf = g.astype(jnp.float32)
            b = ((jax.nn.silu(gf) if glu == "silu"
                  else jax.nn.gelu(gf, approximate=True))
                 * u.astype(jnp.float32))
            glu = None
    else:
        assert b.shape[1] == k, (b.shape, w.shape)
    assert k % QK_K == 0, f"K must be a multiple of {QK_K}, got {k}"
    assert block_m % 128 == 0

    if act_quant and precision == "high" and n <= 16:
        # the int8-MXU block-partial path: exact integer-dot contract at
        # bf16-path speed (427 GB/s kernel-only vs the 173.5 the f32
        # HIGHEST emulation managed, probe_i8bd r5-s1)
        return _mmq_q4_k_i8(w, b, block_m, block_k, out_dtype)

    if act_quant:
        b = fake_quantize_q8_1(b)
    b = b.astype(jnp.float32)
    fast = precision == "fast"
    # N-tiling: decode fits one tile; prefill (large B*T) must be tiled or
    # the dequant intermediates + accumulator overflow the ~16MB VMEM budget
    n_pad = max(8, round_up(n, 8))
    bn = min(n_pad, 256)
    n_pad = round_up(n_pad, bn)
    ink = n_pad <= INK_GLUE_MAX_N
    if ink:
        # decode path: b stays natural-order f32; permute + bf16 cast
        # happen in-kernel (module docstring)
        b = pad_rows(b, n_pad)
    else:
        b = permute_acts_q4k(b)
        if fast:
            b = b.astype(jnp.bfloat16)
        b = pad_rows(b, n_pad)

    bm = choose_bm(w.qs.shape[-1], block_m)
    m_pad = round_up(max(m, w.qs.shape[-1]), bm)
    bk = pick_block(k, block_k, QK_K)
    sbt = bk // QK_K
    sb = k // QK_K

    g8 = max(8, round_up(sbt, 8))
    steps = k // bk
    d_bits = regroup_rows(pad_cols(w.d_bits, m_pad), sbt, steps, g8)
    dmin_bits = regroup_rows(pad_cols(w.dmin_bits, m_pad), sbt, steps, g8)
    sc = pad_cols(w.sc, m_pad)
    mn = pad_cols(w.mn, m_pad)
    qs = pad_cols(w.qs, m_pad)

    grid = (n_pad // bn, m_pad // bm, k // bk)

    specs = [
        # d/dmin: this K-step's (8-row padded) superblock scales
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((g8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((sbt * 8, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 2, bm), lambda ni, i, j: (j, i), memory_space=pltpu.VMEM),
    ]
    if glu is not None:
        # gate and up halves of the SAME (n_pad, 2k) operand, windowed
        # per K-step (up's block index offset by `steps`)
        specs.append(pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec(
            (bn, bk), lambda ni, i, j, st=steps: (ni, st + j),
            memory_space=pltpu.VMEM))
        b_ops = (b, b)
    else:
        specs.append(pl.BlockSpec((bn, bk), lambda ni, i, j: (ni, j),
                                  memory_space=pltpu.VMEM))
        b_ops = (b,)
    if ink:
        kern = functools.partial(_kernel_ink, fast, sbt, glu)
        specs.append(pl.BlockSpec((QK_K, QK_K), lambda ni, i, j: (0, 0),
                                  memory_space=pltpu.VMEM))
        tail = (jnp.asarray(_plane_perm_np(), jnp.bfloat16),)
    else:
        kern = functools.partial(_kernel, fast, sbt)
        tail = ()

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bn, bm), lambda ni, i, j: (ni, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, bm), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=m_pad * sb * 144 + n_pad * k * 2 + n_pad * m_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=running_interpreted(),
    )(d_bits, dmin_bits, sc, mn, qs, *b_ops, *tail)

    return out[:n, :m]
