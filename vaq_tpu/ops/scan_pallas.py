"""Pallas codes-resident scan kernels — the TPU counterpart of the
reference's FAST scan family (``searchFast``/``Fast2``/``Fast3``,
VAQ.cpp:1778-2046): search directly over the packed codes so HBM holds
M bytes/row instead of the decoded tiers' d·{1,2} bytes/row.

Two generations, both kept:

**decode_scan_topk (r2, the default codes tier).** Decode-then-dot: each
grid cell's rows are reconstructed from their codes *in VMEM* (sublane
``tpu.dynamic_gather`` over 8-row sub-tables of a packed bf16-pair decode
table, one pass per cell reused across all query tiles), then scored with
one (rows × d)·(d × q_tile) MXU matmul per window using
``Σ_s ‖q_s − c_{s,code}‖² = ‖q‖² − 2 q·x̂ + ‖x̂‖²``. MXU cost is d
MACs/row/query — independent of C — vs the one-hot form's M·C, a 64×
FLOP cut at the headline config (d=128, M=32, C=256). Winners get exact
f32 distances from a second tiny Pallas pass (``decode_rescore``; XLA's
scattered centroid gather costs more than the whole scan). Measured on
v5e, 1M×128d, 1024-query batches: **6.6 ms ⇒ 156k QPS at C=256** (was
153 ms one-hot / 698 ms XLA gather) and **5.0 ms ⇒ 207k QPS at C=16**,
recall identical to the decoded bf16 tier at 1/8th the resident bytes.

**fast4_* (r1, kept for reference-FAST parity).** One-hot × LUT matmul:
the AVX2-shuffle analog where a 16-entry u8 LUT lives in an AVX2 register
and ``_mm256_shuffle_epi8`` looks up 32 codes per instruction; here the
LUT lives in VMEM and the lookup is ``onehot(codes) @ lutᵀ`` on the MXU —
with the reference's ≤4-bit constraint (VAQ.cpp:1263-1266) and its
u8-quantized winner-selection semantics (``backend="fast4"``).

Two kernels, selected by LUT dtype:

* **bf16** (`_fast4_kernel`): f32 LUT slab, one-hot in bf16, f32
  accumulation — the unquantized path.
* **int8** (`_fast4_kernel_int8`): u8-quantized LUT (the reference's
  learned smallQuantize tables, V16), one-hot in int8, int32 accumulation —
  the s8×s8→s32 MXU form runs at 2× the bf16 rate on v5e and halves the
  VMEM slab. Winner ordering under the quantized sums is exactly the
  reference's FAST semantics; final distances are rescored from the f32
  LUTs (better than the reference, which keeps the quantized sums).

Shared structure (measured on v5e, 1M×64 subspaces — see BASELINE.md):

* grid = (query tiles, row superblocks); the LUT tile stays in VMEM across
  the whole row loop; code blocks stream HBM→VMEM;
* the one-hot is built one GS-subspace group (128 lanes) at a time and
  immediately folded into the accumulator by an accumulating K=128 MXU
  matmul — no giant one-hot scratch (round 1's 8 MB/cell version spilled
  and ran 10-40× slower end to end);
* per (query, window) the kernel emits ONE packed int32: the window's min
  score with the window-local argmin row in the low bits (bitcast packing —
  order-preserving for non-negative scores; min+argmin in a single
  ``jnp.min``, computed one 512-row slab at a time to keep int32
  temporaries ~256 KB). The caller takes top-k windows and exactly rescores
  the k winners, so the low mantissa bits the index packing claims never
  affect returned distances;
* measured: 7.8 ms / 128-query batch, 19.7 ms (int8) / 21.4 ms (bf16) per
  1024-query batch at 1M rows × 64 subspaces — vs a ~10.6 ms/1024q bf16
  MXU roofline for the one-hot form. The value of this tier is capacity:
  32 B/row resident vs 128 B/row (decoded8) / 256 B/row (decoded bf16).

Accumulation never saturates (the reference saturates i16, VAQ.cpp:1817 — a
documented accuracy hazard we don't inherit: u8 sums over ≤128 subspaces
fit int32 trivially, f32 path accumulates in f32).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C4 = 16          # 4-bit subspaces
W_PER_CELL = 8   # windows per grid cell (output tile sublane count)
GS = 8           # subspaces fused per matmul: K = GS·16 = 128 lanes


def _group_geometry(codes_ref, lut_ref):
    """Derive (C, GS, lanes, ngroups) from the ref shapes: C entries per
    subspace LUT, GS = max(1, 128 // C) subspaces fused per matmul group.
    C=16 (FAST) → GS=8, K=128; C=256 (8-bit codes) → GS=1, K=256."""
    m = codes_ref.shape[1]
    c = lut_ref.shape[1] // m
    gs = max(1, 128 // c)
    return c, gs, gs * c, m // gs


def _onehot_group(codes_ref, g, gs, lanes, code_of_lane, sel, out_dtype):
    """One group's one-hot block (NB, lanes).

    Lane j (code-major within the group) ↔ (code = j // GS, subspace =
    g·GS + j % GS). The selection matrix ``sel[s, j] = (j % GS == s)``
    replicates each subspace's code across its lanes via a tiny matmul
    (Mosaic rejects minor-dim reshapes on vectors); codes < 256 are exact
    in bf16.
    """
    # two-step cast: Mosaic lacks a direct uint8 → bf16 lowering
    codes_g = codes_ref[:, g * gs:(g + 1) * gs].astype(jnp.int32) \
        .astype(jnp.bfloat16)
    # precision DEFAULT, explicitly, here and on every non-f32 kernel dot:
    # the session-wide jax_default_matmul_precision=highest otherwise
    # traces fp32 contract precision onto bf16/int8 operands, which
    # Mosaic rejects at compile ("Bad lhs type"). bf16/int8 MXU
    # multiplies are exact regardless.
    code_lane = jax.lax.dot_general(
        codes_g, sel, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                # (NB, lanes)
    return (code_lane == code_of_lane).astype(out_dtype)


def _lane_constants(nb, lanes, gs):
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1)
    code_of_lane = (iota_lane // gs).astype(jnp.float32)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (gs, lanes), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (gs, lanes), 1)
    sel = (s_col % gs == s_row).astype(jnp.bfloat16)
    return code_of_lane, sel


def _fast4_kernel(lut_ref, codes_ref, packed_ref, acc_ref):
    """bf16/f32 kernel: see module docstring."""
    nb, m = codes_ref.shape
    qt = lut_ref.shape[0]
    c, gs, lanes, ngroups = _group_geometry(codes_ref, lut_ref)
    wr = nb // W_PER_CELL
    idx_bits = max(1, (wr - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    code_of_lane, sel = _lane_constants(nb, lanes, gs)

    for g in range(ngroups):
        onehot = _onehot_group(codes_ref, g, gs, lanes, code_of_lane, sel,
                               jnp.bfloat16)
        part = jax.lax.dot_general(
            onehot, lut_ref[:, g * lanes:(g + 1) * lanes].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,  # see _onehot_group
            preferred_element_type=jnp.float32)            # (NB, QT)
        if g == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    # packed (score, window-local idx) min, one window slab at a time
    local = jax.lax.broadcasted_iota(jnp.int32, (wr, qt), 0)
    for w in range(W_PER_CELL):
        a = jnp.maximum(acc_ref[w * wr:(w + 1) * wr, :], 0.0)
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        packed = (ai & ~idx_mask) | local
        packed_ref[w, :] = jnp.min(packed, axis=0)


def _fast4_kernel_int8(lut_ref, codes_ref, packed_ref, acc_ref):
    """int8 kernel: u8 LUT in signed offset form (value − 128, see
    fast4_scan_topk — the constant shift preserves order), int32
    accumulation, shift-packed min."""
    nb, m = codes_ref.shape
    qt = lut_ref.shape[0]
    c, gs, lanes, ngroups = _group_geometry(codes_ref, lut_ref)
    wr = nb // W_PER_CELL
    idx_bits = max(1, (wr - 1).bit_length())
    code_of_lane, sel = _lane_constants(nb, lanes, gs)

    for g in range(ngroups):
        onehot = _onehot_group(codes_ref, g, gs, lanes, code_of_lane, sel,
                               jnp.int8)
        part = jax.lax.dot_general(
            onehot, lut_ref[:, g * lanes:(g + 1) * lanes],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,  # see _onehot_group
            preferred_element_type=jnp.int32)              # (NB, QT)
        if g == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    # |sums| ≤ 128·M < 2^21, so (sum << idx_bits) | idx fits int32 without
    # overflow; the shift is a power-of-2 multiply in two's complement, so
    # ordering survives for negative sums too, and the idx low bits break
    # ties toward the smaller row
    local = jax.lax.broadcasted_iota(jnp.int32, (wr, qt), 0)
    for w in range(W_PER_CELL):
        ai = acc_ref[w * wr:(w + 1) * wr, :]
        packed = (ai << idx_bits) | local
        packed_ref[w, :] = jnp.min(packed, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "q_tile", "interpret"))
def fast4_window_scan(
    codes: jnp.ndarray,      # (n, M) ints < C, n % (8·block_rows) == 0
    luts: jnp.ndarray,       # (nq, M, C) f32 — or int8 for the u8-LUT path
    block_rows: int = 512,
    q_tile: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(query, window) best candidate via the fused Pallas kernel.

    Generalized over the per-subspace LUT width C = luts.shape[2] (a power
    of two ≤ 256): C=16 is the FAST tier; C=256 serves 8-bit-code configs —
    the same one-hot-matmul structure with K = 256 per subspace (the MXU
    cost scales with C, so this stays the *capacity* tier; decoded8 is the
    throughput tier — see ops/scan_decoded.py).

    Returns (scores (nq, n/block_rows), row_ids (nq, n/block_rows) i32
    global ids). Scores are f32 window minima for f32 LUTs, int32 quantized
    sums for int8 LUTs — only their ORDER is meaningful either way (the
    packed index bits are already stripped).
    """
    n, m = codes.shape
    nq, _, c = luts.shape
    assert c & (c - 1) == 0 and c <= 256, "LUT width must be pow2 <= 256"
    gs = max(1, 128 // c)
    int8_path = luts.dtype == jnp.int8
    lut_bytes = 1 if int8_path else 4
    if q_tile is None:
        # measured optima at nq=1024/1M rows/C=16: 256 (int8), 512 (bf16);
        # cap so the resident LUT slab stays ≤ ~4 MB; don't pad small
        # batches up
        qt_budget = max(128, (4 << 20) // max(m * c * lut_bytes, 1) // 128 * 128)
        q_tile = min(256 if int8_path else 512, qt_budget, max(128, nq))
    cell_rows = W_PER_CELL * block_rows
    assert n % cell_rows == 0, "pad codes to a multiple of 8*block_rows"
    nblocks = n // block_rows
    ncells = n // cell_rows
    wr = block_rows
    idx_bits = max(1, (wr - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    pad_q = (-nq) % q_tile
    luts_p = jnp.pad(luts, ((0, pad_q), (0, 0), (0, 0)))
    nq_p = luts_p.shape[0]
    if c <= 16 and codes.dtype != jnp.int8:
        codes = codes.astype(jnp.int8)  # values < 16 fit; 4x less VMEM/HBM
    elif codes.dtype not in (jnp.int8, jnp.uint8):
        codes = codes.astype(jnp.uint8)
    pad_m = (-m) % gs
    if pad_m:
        # pad subspaces: code 0 against an all-zero LUT contributes nothing
        codes = jnp.pad(codes, ((0, 0), (0, pad_m)))
        luts_p = jnp.pad(luts_p, ((0, 0), (0, pad_m), (0, 0)))
        m += pad_m
    ngroups = m // gs
    # Rearrange LUT code-major within each group so the kernel's lane j
    # (within group g) ↔ (code = j // GS, subspace = g·GS + j % GS), then
    # flatten groups into one (nq, M·C) slab.
    luts_cm = luts_p.reshape(nq_p, ngroups, gs, c).transpose(0, 1, 3, 2) \
        .reshape(nq_p, m * c)

    grid = (nq_p // q_tile, ncells)
    kernel = _fast4_kernel_int8 if int8_path else _fast4_kernel
    acc_dtype = jnp.int32 if int8_path else jnp.float32
    packed_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, m * c), lambda q, j: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cell_rows, m), lambda q, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W_PER_CELL, q_tile), lambda q, j: (j, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, nq_p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cell_rows, q_tile), acc_dtype),
        ],
        interpret=interpret,
    )(luts_cm, codes)

    packed = packed_t.T[:nq]                               # (nq, nblocks)
    ids_local = (packed & idx_mask).astype(jnp.int32)
    if int8_path:
        scores = (packed >> idx_bits).astype(jnp.int32)
    else:
        scores = jax.lax.bitcast_convert_type(packed & ~idx_mask,
                                              jnp.float32)
    block_base = jnp.arange(nblocks, dtype=jnp.int32) * block_rows
    return scores, ids_local + block_base[None, :]


def _decode_score_kernel(table_ref, rep_ref, codes_ref, q_ref,
                         qn_ref, packed_ref, cl_ref, dec_ref):
    """Decode-then-dot kernel: reconstruct this cell's rows from their codes
    in VMEM (one ``tpu.dynamic_gather`` per H-row chunk), then score every
    query against the reconstruction with ONE MXU matmul per window.

    Grid is (cells, q_tiles) with q innermost; the decoded block is computed
    once per cell (at q == 0) into persistent scratch and reused across all
    query tiles. Identity used: the ADC LUT sum equals the exact distance to
    the reconstruction, Σ_s ‖q_s − c_{s,code}‖² = ‖q − x̂‖² =
    ‖q‖² − 2·q·x̂ + ‖x̂‖², so scoring is a (rows × d) · (d × qt) matmul —
    d MACs per (row, query) instead of the one-hot form's M·C.
    """
    m, nb = codes_ref.shape    # codes arrive TRANSPOSED (m, rows): the u8
    # tile is (32, 128), so (m, n) storage is exact 1 B/code while (n, m)
    # with m < 128 lanes pads 4× (11.9 GB for 3.2 GB of codes at 100M rows)
    h, d = table_ref.shape
    nsub = h // 8          # hierarchical 8-row sub-tables (see below)
    qt = q_ref.shape[0]
    wr = nb // W_PER_CELL
    idx_bits = max(1, (wr - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1

    @pl.when(pl.program_id(1) == 0)
    def decode():
        # Lane replication codesT[s, r] → cl[r, s·L+j] via the selection
        # matmul with the contraction on the SUBLANE dim of codesT (Mosaic
        # has no minor-dim reshape on vectors, and the lhs-transposed
        # dot_general is native); codes < 256 are exact in bf16, one
        # (M, NB)ᵀ·(M, d) matmul for the whole cell.
        cl_ref[:] = jax.lax.dot_general(
            codes_ref[:].astype(jnp.int32).astype(jnp.bfloat16), rep_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,  # see _onehot_group
            preferred_element_type=jnp.float32).astype(jnp.int32)

        # Mosaic's sublane dynamic_gather spans ONE vreg: 8 32-bit rows with
        # i32 indices (bf16/int8 forms crash this libtpu's compiler). The
        # table therefore packs centroid rows 2c/2c+1 as a bf16 pair in one
        # i32 word (build_decode_table), so a C-row table is C/16 8-row
        # sub-tables: gather each with the in-sub-table packed row
        # ((code >> 1) & 7), select by sub-table id (code >> 4), then pick
        # the 16-bit half by code parity — a bf16's f32 promotion is just
        # its bit pattern shifted left 16.
        def chunk_body(i, _):
            sl = pl.dslice(i * 8, 8)
            v = cl_ref[sl, :]
            lo = (v >> 1) & 7
            acc = jnp.take_along_axis(table_ref[0:8, :], lo, axis=0)
            for t in range(1, nsub):
                g = jnp.take_along_axis(table_ref[t * 8:(t + 1) * 8, :], lo,
                                        axis=0)
                acc = jnp.where((v >> 4) == t, g, acc)
            bits = jnp.where(v & 1 == 0, acc << 16,
                             acc & jnp.int32(-65536))
            dec_ref[sl, :] = jax.lax.bitcast_convert_type(bits, jnp.float32)
            return 0

        jax.lax.fori_loop(0, nb // 8, chunk_body, 0)

    local = jax.lax.broadcasted_iota(jnp.int32, (wr, qt), 0)
    for w in range(W_PER_CELL):
        sl = pl.dslice(w * wr, wr)
        dec_w = dec_ref[sl, :]
        dot = jax.lax.dot_general(
            dec_w.astype(jnp.bfloat16), q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,  # see _onehot_group
            preferred_element_type=jnp.float32)            # (wr, qt)
        # ‖x̂‖² recomputed from the f32 decoded scratch — exact, and avoids
        # a (cell_rows, 1) input block that lane-pads to 128 (2 MB of VMEM)
        norms_w = jnp.sum(dec_w * dec_w, axis=1, keepdims=True)
        dist = norms_w - 2.0 * dot + qn_ref[0:1, :]
        a = jnp.maximum(dist, 0.0)                         # ≥ 0 ⇒ bitcast
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)    # order-preserving
        packed_ref[w, :] = jnp.min((ai & ~idx_mask) | local, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "q_tile", "interpret"))
def decode_window_scan(
    codes_t: jnp.ndarray,    # (M, n) ints < C, n % (8·block_rows) == 0
    dec_table: jnp.ndarray,  # (Hpad, d) f32 decode table (see build below)
    qp: jnp.ndarray,         # (nq, d) f32 projected queries
    block_rows: int = 512,
    q_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(query, window) best candidate via the decode-then-dot kernel.

    The codes-resident capacity tier at near-decoded throughput: HBM holds
    only the codes (M B/row — stored transposed (M, n) so the u8 (32, 128)
    tile packs exactly; row-major (n, M) storage lane-pads 4×);
    reconstruction happens in VMEM. The MXU cost is nq·n·d MACs —
    C-independent, unlike the one-hot kernel (``fast4_window_scan``) whose
    cost is nq·n·M·C; at the headline config (d=128, M=32, C=256) that is a
    64× FLOP reduction, turning the 8-bit capacity scan from compute-bound
    to bandwidth/VPU-bound.

    Returns (scores (nq, nblocks) f32, row_ids (nq, nblocks) i32 global).
    """
    m, n = codes_t.shape
    nq, d = qp.shape
    h = dec_table.shape[0]
    assert h % 8 == 0, "decode table rows must be padded to a multiple of 8"
    cell_rows = W_PER_CELL * block_rows
    assert n % cell_rows == 0, "pad codes to a multiple of 8*block_rows"
    # Mosaic requires the codes block's last dim (cell_rows) divisible by
    # 128 → block_rows ≥ 16 when compiled (the interpreter doesn't check).
    assert interpret or block_rows % 16 == 0, block_rows
    nblocks = n // block_rows
    ncells = n // cell_rows
    wr = block_rows
    idx_bits = max(1, (wr - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    pad_q = (-nq) % q_tile
    qp_p = jnp.pad(qp, ((0, pad_q), (0, 0)))
    nq_p = qp_p.shape[0]
    qn = jnp.sum(qp_p * qp_p, axis=1, keepdims=True).T    # (1, nq_p) f32
    q_bf = qp_p.astype(jnp.bfloat16)
    if codes_t.dtype not in (jnp.int8, jnp.uint8):
        codes_t = codes_t.astype(jnp.uint8)
    # rep[s, s·L+j] = 1 replicates subspace s's code across its L lanes
    l = d // m
    rep = (jax.lax.broadcasted_iota(jnp.int32, (m, d), 1) // l
           == jax.lax.broadcasted_iota(jnp.int32, (m, d), 0)
           ).astype(jnp.bfloat16)

    grid = (ncells, nq_p // q_tile)
    packed_t = pl.pallas_call(
        _decode_score_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, d), lambda c, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda c, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, cell_rows), lambda c, q: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, d), lambda c, q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile), lambda c, q: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W_PER_CELL, q_tile), lambda c, q: (c, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, nq_p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cell_rows, d), jnp.int32),    # lane-replicated codes
            pltpu.VMEM((cell_rows, d), jnp.float32),  # decoded rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(dec_table, rep, codes_t, q_bf, qn)

    packed = packed_t.T[:nq]                               # (nq, nblocks)
    ids_local = (packed & idx_mask).astype(jnp.int32)
    scores = jax.lax.bitcast_convert_type(packed & ~idx_mask, jnp.float32)
    block_base = jnp.arange(nblocks, dtype=jnp.int32) * block_rows
    return scores, ids_local + block_base[None, :]


def build_decode_table(centroids):
    """(M, C, L) f32 padded centroids → ((Hpad, M·L) i32 packed table,
    (M, C) f32 per-centroid squared norms with sentinels zeroed).

    Layout: logical row c holds ``centroids[s, c, j]`` at lane s·L+j so one
    sublane gather with lane-replicated codes reconstructs a whole row; rows
    2c′ and 2c′+1 are packed as a bf16 pair into one i32 word (row 2c′+1 in
    the high half) because Mosaic's gather only compiles in the 32-bit form
    and only spans 8 sublanes — packing halves the sub-table count. Packed
    rows are padded to a multiple of 8. Sentinel (+huge) padding centroids
    are zeroed — codes never address them.
    """
    import numpy as np
    cents = np.asarray(centroids, dtype=np.float32)
    m, c, l = cents.shape
    cents = np.where(np.abs(cents) < 1e30, cents, 0.0)
    cnorms = np.sum(cents * cents, axis=2)                 # (M, C)
    rows = cents.transpose(1, 0, 2).reshape(c, m * l)      # (C, d) f32
    if c % 2:
        rows = np.pad(rows, ((0, 1), (0, 0)))
    import ml_dtypes
    b16 = rows.astype(ml_dtypes.bfloat16)                  # RTNE cast
    u16 = b16.view(np.uint16).astype(np.uint32)
    packed = (u16[1::2] << 16) | u16[0::2]                 # (⌈C/2⌉, d)
    hp = (-packed.shape[0]) % 8
    if hp:
        packed = np.pad(packed, ((0, hp), (0, 0)))
    return (jnp.asarray(packed.view(np.int32)),
            jnp.asarray(cnorms))


def _decode_dist_kernel(rows_ref, rep_ref, codes_ref, q_ref, out_ref,
                        cl_ref):
    """Candidate rescore kernel: reconstruct each candidate row from its
    codes with f32 sublane gathers (8-row sub-tables — exact, no bf16
    packing) and emit ‖q_i − x̂_i‖² per row (row i is paired with its own
    query row in ``q_ref``). Used on the ~nq·k winners only, where XLA's
    scattered centroid gather costs more than the whole window scan
    (measured 4.5 ms vs 0.1 ms at nq=1024, k=20)."""
    nb, m = codes_ref.shape
    h, d = rows_ref.shape
    nsub = h // 8
    cl_ref[:] = jax.lax.dot_general(
        codes_ref[:].astype(jnp.int32).astype(jnp.bfloat16), rep_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,  # see _onehot_group
        preferred_element_type=jnp.float32).astype(jnp.int32)

    def chunk_body(i, _):
        sl = pl.dslice(i * 8, 8)
        v = cl_ref[sl, :]
        lo = v & 7
        acc = jnp.take_along_axis(rows_ref[0:8, :], lo, axis=0)
        for t in range(1, nsub):
            g = jnp.take_along_axis(rows_ref[t * 8:(t + 1) * 8, :], lo,
                                    axis=0)
            acc = jnp.where((v >> 3) == t, g, acc)
        diff = acc - q_ref[sl, :]
        d2 = jnp.sum(diff * diff, axis=1, keepdims=True)   # (8, 1)
        out_ref[sl, :] = jnp.broadcast_to(d2, (8, 128))
        return 0

    jax.lax.fori_loop(0, nb // 8, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_rescore(cand_codes: jnp.ndarray,  # (R, M) ints < C
                   rows_f32: jnp.ndarray,    # (Cpad8, d) f32 decode rows
                   q_rep: jnp.ndarray,       # (R, d) f32, row i's query
                   interpret: bool = False) -> jnp.ndarray:
    """Exact per-row ADC distances for candidate (row, query) pairs."""
    r, m = cand_codes.shape
    d = q_rep.shape[1]
    l = d // m
    cr = 1024
    pad = (-r) % cr
    cand_p = jnp.pad(cand_codes.astype(jnp.uint8), ((0, pad), (0, 0)))
    q_p = jnp.pad(q_rep, ((0, pad), (0, 0)))
    rep = (jax.lax.broadcasted_iota(jnp.int32, (m, d), 1) // l
           == jax.lax.broadcasted_iota(jnp.int32, (m, d), 0)
           ).astype(jnp.bfloat16)
    out = pl.pallas_call(
        _decode_dist_kernel,
        grid=((r + pad) // cr,),
        in_specs=[
            pl.BlockSpec((rows_f32.shape[0], d), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cr, m), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cr, d), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cr, 128), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cr, d), jnp.int32)],
        interpret=interpret,
    )(rows_f32, rep, cand_p, q_p)
    return out[:r, 0]


def build_decode_rows(centroids):
    """(M, C, L) f32 padded centroids → (Cpad8, M·L) f32 decode-row table
    for ``decode_rescore`` (sentinels zeroed, rows padded to 8)."""
    import numpy as np
    cents = np.asarray(centroids, dtype=np.float32)
    m, c, l = cents.shape
    cents = np.where(np.abs(cents) < 1e30, cents, 0.0)
    rows = cents.transpose(1, 0, 2).reshape(c, m * l)
    hp = (-c) % 8
    if hp:
        rows = np.pad(rows, ((0, hp), (0, 0)))
    return jnp.asarray(rows)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_tile", "interpret"))
def decode_scan_topk(
    codes_t: jnp.ndarray,    # (M, n) — transposed storage, see window scan
    dec_table: jnp.ndarray,  # (Hpad, d) i32 from build_decode_table
    rows_f32: jnp.ndarray,   # (Cpad8, d) f32 from build_decode_rows
    qp: jnp.ndarray,         # (nq, d) f32 projected queries
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    block_rows: int = 512,
    q_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codes-resident search via the decode-then-dot kernel: window scan →
    top-k windows → exact f32 rescore of the k winners from the centroids.
    Drop-in result contract of ``fast4_scan_topk`` (distances are exact ADC
    f32 sums for the returned ids)."""
    m, n = codes_t.shape
    nq, d = qp.shape
    l = d // m
    pad = (-n) % (W_PER_CELL * block_rows)
    codes_p = jnp.pad(codes_t, ((0, 0), (0, pad)))
    scores, ids = decode_window_scan(codes_p, dec_table, qp,
                                     block_rows=block_rows, q_tile=q_tile,
                                     interpret=interpret)
    if n_valid is None:
        n_valid = jnp.int32(n)
    invalid = ids >= n_valid
    scores = jnp.where(invalid, jnp.inf, scores)

    # 2k-window over-fetch + approx window selection: exact top_k over ~2000
    # windows costs more than the whole Pallas scan (measured ~3.5 ms at
    # nq=1024); approx_max_k's rare per-window misses are absorbed by the
    # over-fetch and the exact rescore below.
    kk = min(max(2 * k, k), scores.shape[1])
    if interpret:
        _, pos = jax.lax.top_k(-scores, kk)
    else:
        _, pos = jax.lax.approx_max_k(-scores, kk, recall_target=0.95)
        pos = pos.astype(jnp.int32)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)        # (nq, kk)
    top_ids = jnp.where(jnp.take_along_axis(invalid, pos, axis=1), -1,
                        top_ids)
    if n > 16_000_000:
        # Column-gathering winner codes from the (M, n) u8 array makes XLA
        # relayout the whole array (4× lane-padded — 12.8 GB at 100M). At
        # capacity scale the window scores are already per-row distances
        # computed in f32 from the bf16 decode (low idx_mask bits zeroed),
        # so return those; the refine stage supplies exact distances.
        d2 = jnp.take_along_axis(scores, pos, axis=1)
        d2 = jnp.where(top_ids >= 0, d2, jnp.inf)
        neg2, pos2 = jax.lax.top_k(-d2, k)
        out_ids = jnp.take_along_axis(top_ids, pos2, axis=1)
        return -neg2, jnp.where(jnp.isfinite(-neg2), out_ids, -1)
    # exact rescore: reconstruct the kk winners in f32 and measure ‖q − x̂‖²
    # (in a tiny Pallas pass — XLA's scattered centroid gather costs ~4.5 ms
    # here, more than the whole window scan)
    cand = jnp.transpose(codes_p[:, jnp.maximum(top_ids, 0)],
                         (1, 2, 0))                        # (nq, kk, M)
    q_rep = jnp.broadcast_to(qp[:, None, :], (nq, kk, d)).reshape(-1, d)
    d2 = decode_rescore(cand.reshape(-1, m), rows_f32, q_rep,
                        interpret=interpret).reshape(nq, kk)
    d2 = jnp.where((top_ids >= 0) & (top_ids < n_valid), d2, jnp.inf)
    if kk < k:
        d2 = jnp.pad(d2, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)),
                          constant_values=-1)
    neg2, pos2 = jax.lax.top_k(-d2, k)
    out_ids = jnp.take_along_axis(top_ids, pos2, axis=1)
    out_ids = jnp.where(jnp.isfinite(-neg2), out_ids, -1)
    return -neg2, out_ids


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_tile", "interpret"))
def fast4_scan_topk(
    codes: jnp.ndarray,
    luts: jnp.ndarray,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    block_rows: int = 512,
    q_tile: Optional[int] = None,
    interpret: bool = False,
    luts8: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FAST-path search: Pallas window scan → top-k windows → exact ADC
    rescore of the k window winners (distances always from the f32 ``luts``).

    When ``luts8`` (int8-viewed u8-quantized tables, values ≤ 127) is given,
    the window scan runs the 2×-rate int8 kernel and winner selection uses
    the quantized sums — the reference's FAST semantics (VAQ.cpp:1778-1836)
    with exact final distances.

    Note: with one candidate per (query, window), k must be ≪ n/block_rows
    for good recall; the caller picks block_rows ≈ n/(40·k) or smaller.
    """
    n, m = codes.shape
    nq = luts.shape[0]
    pad = (-n) % (W_PER_CELL * block_rows)
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    if luts8 is not None:
        # u8 [0,255] → signed int8 by a −128 offset: the per-row sum shifts
        # by the constant 128·M, preserving order, and s8×s8 hits the MXU.
        scan_luts = (luts8.astype(jnp.int16) - 128).astype(jnp.int8)
    else:
        scan_luts = luts
    scores, ids = fast4_window_scan(codes_p, scan_luts,
                                    block_rows=block_rows,
                                    q_tile=q_tile, interpret=interpret)
    if n_valid is None:
        n_valid = jnp.int32(n)
    big = jnp.iinfo(jnp.int32).max if scores.dtype == jnp.int32 else jnp.inf
    invalid = ids >= n_valid
    scores = jnp.where(invalid, big, scores)

    kk = min(k, scores.shape[1])
    neg, pos = jax.lax.top_k(-scores.astype(jnp.float32), kk)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)     # (nq, kk)
    # Windows whose best row fell on padding carry no candidate.
    top_ids = jnp.where(jnp.take_along_axis(invalid, pos, axis=1), -1,
                        top_ids)
    # Exact ADC rescore of the winners from the f32 LUTs (gather of kk·M
    # entries per query — tiny).
    cand_codes = codes_p[jnp.maximum(top_ids, 0)].astype(jnp.int32)
    d2 = jnp.sum(
        jnp.take_along_axis(
            luts, cand_codes.transpose(0, 2, 1), axis=2
        ).transpose(0, 2, 1),
        axis=2,
    )
    d2 = jnp.where((top_ids >= 0) & (top_ids < n_valid), d2, jnp.inf)
    if kk < k:
        d2 = jnp.pad(d2, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)),
                          constant_values=-1)
    neg2, pos2 = jax.lax.top_k(-d2, k)
    out_ids = jnp.take_along_axis(top_ids, pos2, axis=1)
    out_ids = jnp.where(jnp.isfinite(-neg2), out_ids, -1)
    return -neg2, out_ids
