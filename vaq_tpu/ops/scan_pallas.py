"""Pallas fast-scan kernels: fused one-hot × LUT matmul over 4-bit codes.

The TPU counterpart of the reference's FAST shuffle scan
(``searchFast``, VAQ.cpp:1778-1836): there, a 16-entry u8 LUT lives in an
AVX2 register and ``_mm256_shuffle_epi8`` looks up 32 codes per instruction;
here the 16-entry-per-subspace LUT lives in VMEM and the lookup is expressed
as ``onehot(codes) @ lutᵀ`` so the MXU does it — the same ≤4-bit-per-subspace
constraint applies (VAQ.cpp:1263-1266), because the one-hot matmul costs
``C`` MACs per (row, subspace, query) and only C=16 keeps that near the
compute floor.

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
    code_lane = jax.lax.dot_general(
        codes_g, sel, dimension_numbers=(((1,), (0,)), ((), ())),
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
