"""Pallas fast-scan kernel: fused one-hot × LUT matmul over 4-bit codes.

The TPU counterpart of the reference's FAST shuffle scan
(``searchFast``, VAQ.cpp:1778-1836): there, a 16-entry u8 LUT lives in an
AVX2 register and ``_mm256_shuffle_epi8`` looks up 32 codes per instruction;
here the 16-entry-per-subspace LUT lives in VMEM and the lookup is expressed
as ``onehot(codes) @ lutᵀ`` so the MXU does it — the same ≤4-bit-per-subspace
constraint applies (VAQ.cpp:1263-1266), because the one-hot matmul costs
``C`` MACs per (row, subspace, query) and only C=16 keeps that at the
memory-bandwidth floor.

Shape strategy (per SURVEY §7 hard-part 3):
  * grid = (query tiles, row blocks); the LUT tile (QT, M, 16) stays in VMEM
    across the whole row loop; code blocks stream HBM→VMEM;
  * the one-hot is generated in VMEM registers per subspace — it never
    touches HBM (XLA would materialize it);
  * instead of a full per-row distance output (nq, n) the kernel emits one
    (min-distance, argmin-row) candidate per (query, row-block) window —
    the PartialReduce shape — and the caller finishes with a cheap exact
    top-k over the (nq, n/NB) windows + exact rescore. Window collisions
    bound recall exactly like ``approx_max_k`` windows do.

Accumulation is f32 (the reference saturates i16 there, VAQ.cpp:1817 — a
documented accuracy hazard we don't inherit).
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


GS = 8  # subspaces fused per matmul: K = GS·16 = 128 fills the MXU's depth


def _fast4_kernel(lut_ref, codes_ref, score_ref, id_ref, acc_ref,
                  onehot_ref):
    """One (query-tile, superblock) cell covering W_PER_CELL windows.

    lut_ref:   (QT, M·16) f32 VMEM — this query tile's tables, code-major
               within each GS-subspace group.
    codes_ref: (W·WR, M) i8 VMEM   — this superblock's codes.
    score_ref: (W, QT) f32         — per-window min distance.
    id_ref:    (W, QT) i32         — per-window argmin (window-local row).
    acc_ref:   (W·WR, QT) f32 scratch.
    onehot_ref: (W·WR, M·16) bf16 scratch.

    Subspaces are one-hot-encoded GS at a time into side-by-side 128-lane
    slabs of the onehot scratch (each row ends with M ones), then ONE
    (NB, M·16) × (M·16, QT) MXU matmul produces all ADC sums — maximum
    systolic depth instead of per-subspace K=16 slivers.
    """
    nb, m = codes_ref.shape
    qt = lut_ref.shape[0]
    ngroups = m // GS
    wr = nb // W_PER_CELL
    assert m % GS == 0, "pad subspace count to a multiple of 8"

    lanes = GS * C4
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1)
    code_of_lane = (iota_lane // GS).astype(jnp.float32)  # lane j → j // GS
    # Selection matrix S[s, j] = (j % GS == s): codes_g @ S replicates each
    # subspace's code across its lanes without any reshape (Mosaic rejects
    # minor-dim merges). Codes < 16 are exact in bf16.
    s_row = jax.lax.broadcasted_iota(jnp.int32, (GS, lanes), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (GS, lanes), 1)
    sel = (s_col % GS == s_row).astype(jnp.bfloat16)
    for g in range(ngroups):
        codes_g = codes_ref[:, g * GS:(g + 1) * GS].astype(jnp.bfloat16)
        code_lane = jax.lax.dot_general(
            codes_g, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (NB, 128)
        onehot_ref[:, g * lanes:(g + 1) * lanes] = (
            code_lane == code_of_lane).astype(jnp.bfloat16)
    # One K = ngroups·128 MXU matmul per cell against the stacked LUT slab.
    acc_ref[:] = jax.lax.dot_general(
        onehot_ref[:], lut_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    acc = acc_ref[:].reshape(W_PER_CELL, wr, qt)
    score_ref[:] = jnp.min(acc, axis=1)
    id_ref[:] = jnp.argmin(acc, axis=1).astype(jnp.int32)


def _fast4_kernel_v2(lut_ref, codes_ref, packed_ref, acc_ref):
    """Round-2 kernel: group-wise matmul accumulation + bitcast-packed
    min/argmin.

    Differences vs ``_fast4_kernel`` (measured on v5e, see BASELINE.md):
    * the one-hot is built and consumed one GS-subspace group (128 lanes) at
      a time, each immediately folded into ``acc`` by an accumulating K=128
      MXU matmul — the (NB, M·16) bf16 scratch (8 MB/cell of VMEM traffic)
      disappears;
    * min+argmin over the window axis collapse into ONE ``jnp.min``: scores
      are clamped ≥ 0, bitcast to int32 (order-preserving for non-negative
      floats), the low ``idx_bits`` mantissa bits are replaced by the
      window-local row index, and the packed int is minimized — ties break
      toward the smaller row index, and the distance nibble lost to the
      packing is recovered by the caller's exact rescore.
    """
    nb, m = codes_ref.shape
    qt = lut_ref.shape[0]
    ngroups = m // GS
    wr = nb // W_PER_CELL
    idx_bits = max(1, (wr - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1

    lanes = GS * C4
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1)
    code_of_lane = (iota_lane // GS).astype(jnp.float32)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (GS, lanes), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (GS, lanes), 1)
    sel = (s_col % GS == s_row).astype(jnp.bfloat16)

    for g in range(ngroups):
        codes_g = codes_ref[:, g * GS:(g + 1) * GS].astype(jnp.bfloat16)
        code_lane = jax.lax.dot_general(
            codes_g, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (NB, 128)
        onehot = (code_lane == code_of_lane).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            onehot, lut_ref[:, g * lanes:(g + 1) * lanes].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (NB, QT)
        if g == 0:
            acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    # pack (score, window-local idx) into one int32 and min-reduce
    acc = jnp.maximum(acc_ref[:], 0.0)
    acc_i = jax.lax.bitcast_convert_type(acc, jnp.int32)
    local = jax.lax.broadcasted_iota(jnp.int32, (nb, qt), 0) % wr
    packed = (acc_i & ~idx_mask) | local
    packed_ref[:] = jnp.min(packed.reshape(W_PER_CELL, wr, qt), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "q_tile", "interpret"))
def fast4_window_scan_v2(
    codes: jnp.ndarray,
    luts: jnp.ndarray,
    block_rows: int = 512,
    q_tile: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(query, window) best candidate via the v2 kernel (see above).
    Same contract as :func:`fast4_window_scan`."""
    n, m = codes.shape
    nq = luts.shape[0]
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
    if codes.dtype != jnp.int8:
        codes = codes.astype(jnp.int8)
    pad_m = (-m) % GS
    if pad_m:
        codes = jnp.pad(codes, ((0, 0), (0, pad_m)))
        luts_p = jnp.pad(luts_p, ((0, 0), (0, pad_m), (0, 0)))
        m += pad_m
    ngroups = m // GS
    luts_cm = luts_p.reshape(nq_p, ngroups, GS, C4).transpose(0, 1, 3, 2) \
        .reshape(nq_p, m * C4)

    grid = (nq_p // q_tile, ncells)
    packed_t = pl.pallas_call(
        _fast4_kernel_v2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, m * C4), lambda q, j: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cell_rows, m), lambda q, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W_PER_CELL, q_tile), lambda q, j: (j, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, nq_p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cell_rows, q_tile), jnp.float32),
        ],
        interpret=interpret,
    )(luts_cm, codes)

    packed = packed_t.T[:nq]                              # (nq, nblocks)
    ids_local = (packed & idx_mask).astype(jnp.int32)
    scores = jax.lax.bitcast_convert_type(packed & ~idx_mask, jnp.float32)
    block_base = jnp.arange(nblocks, dtype=jnp.int32) * block_rows
    return scores, ids_local + block_base[None, :]


@functools.partial(jax.jit,
                   static_argnames=("block_rows", "q_tile", "interpret"))
def fast4_window_scan(
    codes: jnp.ndarray,      # (n, M) ints < 16, n % (8*block_rows) == 0
    luts: jnp.ndarray,       # (nq, M, 16) f32
    block_rows: int = 512,
    q_tile: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(query, window) best candidate via the fused Pallas kernel.

    Returns (scores (nq, n/block_rows) f32, row_ids (nq, n/block_rows) i32
    global ids). n must be a multiple of 8·block_rows (one grid cell covers
    8 windows to satisfy the (8, 128) output tiling).
    """
    n, m = codes.shape
    nq = luts.shape[0]
    cell_rows = W_PER_CELL * block_rows
    assert n % cell_rows == 0, "pad codes to a multiple of 8*block_rows"
    nblocks = n // block_rows
    ncells = n // cell_rows
    pad_q = (-nq) % q_tile
    luts_p = jnp.pad(luts, ((0, pad_q), (0, 0), (0, 0)))
    nq_p = luts_p.shape[0]
    if codes.dtype != jnp.int8:
        codes = codes.astype(jnp.int8)  # values < 16 fit; 4x less VMEM/HBM
    pad_m = (-m) % GS
    if pad_m:
        # pad subspaces: code 0 against an all-zero LUT contributes nothing
        codes = jnp.pad(codes, ((0, 0), (0, pad_m)))
        luts_p = jnp.pad(luts_p, ((0, 0), (0, pad_m), (0, 0)))
        m += pad_m
    ngroups = m // GS
    # Rearrange LUT code-major within each GS-subspace group so the kernel's
    # lane j (within group g) ↔ (code = j // GS, subspace = g·GS + j % GS),
    # then flatten groups into one (nq, M·16) slab.
    luts_cm = luts_p.reshape(nq_p, ngroups, GS, C4).transpose(0, 1, 3, 2) \
        .reshape(nq_p, m * C4)

    grid = (nq_p // q_tile, ncells)
    scores_t, ids_t = pl.pallas_call(
        _fast4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, m * C4), lambda q, j: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cell_rows, m), lambda q, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W_PER_CELL, q_tile), lambda q, j: (j, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W_PER_CELL, q_tile), lambda q, j: (j, q),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, nq_p), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, nq_p), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cell_rows, q_tile), jnp.float32),
            pltpu.VMEM((cell_rows, m * C4), jnp.bfloat16),
        ],
        interpret=interpret,
    )(luts_cm, codes)

    scores = scores_t.T[:nq]                       # (nq, nblocks)
    ids_local = ids_t.T[:nq]
    block_base = jnp.arange(nblocks, dtype=jnp.int32) * block_rows
    return scores, ids_local + block_base[None, :]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "q_tile", "interpret", "kernel"))
def fast4_scan_topk(
    codes: jnp.ndarray,
    luts: jnp.ndarray,
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    block_rows: int = 512,
    q_tile: int = 128,
    interpret: bool = False,
    kernel: str = "v2",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FAST-path search: Pallas window scan → top-k windows → exact ADC
    rescore of the k window winners (distances from the f32 LUTs).

    Note: with one candidate per (query, window), k must be ≪ n/block_rows
    for good recall; the caller picks block_rows ≈ n/(40·k) or smaller.
    """
    n, m = codes.shape
    nq = luts.shape[0]
    pad = (-n) % (W_PER_CELL * block_rows)
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    window_scan = (fast4_window_scan_v2 if kernel == "v2"
                   else fast4_window_scan)
    scores, ids = window_scan(codes_p, luts, block_rows=block_rows,
                              q_tile=q_tile, interpret=interpret)
    if n_valid is None:
        n_valid = jnp.int32(n)
    scores = jnp.where(ids < n_valid, scores, jnp.inf)

    kk = min(k, scores.shape[1])
    neg, pos = jax.lax.top_k(-scores, kk)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)     # (nq, kk)
    # Windows whose best row fell on padding carry no candidate.
    top_ids = jnp.where(jnp.isfinite(-neg), top_ids, -1)
    # Exact ADC rescore of the winners from the same LUTs (f32 gather of
    # kk·M entries per query — tiny).
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
