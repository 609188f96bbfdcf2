"""Scalar-prefetch gather-rescore kernel for the IVF probe path.

Replaces the XLA block rescore in ``ivf.probe_scan`` (VERDICT r4 #5 /
ROADMAP #6): the winner windows' gs-row slabs were gathered with an XLA
gather running at ~46 GB/s effective (~3.6 ms of the 12.8 ms 10M probe
budget), then read twice more for the score einsums. Here the window ids
are scalar-prefetched into SMEM, each grid step issues its query tile's
slab DMAs itself (manual double buffering ACROSS grid steps — the slabs for
step t+1 stream while step t computes), and the scores come out of one
batched MXU dot per tile:

  scores[q, j·gs + r] = 2·q_eff[q]·x̂[w] − ‖x̂[w]‖²   (w = wblk[q, j], row r)

computed as one (1, d)×(d, m̃·gs) MXU pass per query (all of a query's
windows in a single dot) plus ``xn = w_dim · (slabs²)ᵀ`` — the in-kernel
norms trick of probe_pallas (no norms array exists; int8 squares are exact
in f32).

Masking stays in the caller (``bucket_ids == -1`` → −inf), identical to the
XLA formulation's contract. The kernel is value-equivalent to the XLA path
(pinned by tests/test_rescore_pallas.py in interpret mode and by the
on-chip parity gate).

Reference provenance: this is the candidate-rescore half of the TI scan
(``searchTriangleInequality`` VAQ.cpp:1540-1692) — the reference touches
candidate rows pointer-chasing per row; the TPU form streams whole windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_t(wblk_ref, qt_ref, w_ref, rows_hbm, out_ref, slabs, sems, *,
              tq, m_pad, gs, d, ng, nsteps):
    """Transposed-layout variant: rows_hbm is (ncl·d, cap) (the d % 128
    storage, see probe_pallas._groupmin_kernel_t), so window w = c·ng + g
    is the (d, gs) slice at rows [c·d, (c+1)·d), cols [g·gs, (g+1)·gs).
    Slabs stage as (d, tq·m̃·gs) and each query's scores come from one
    (1, d)×(d, m̃·gs) matmul — the transposed form needs no operand
    transposes at all."""
    step = pl.program_id(0)

    def start_tile(buf_step):
        slot = jax.lax.rem(buf_step, 2)
        for i in range(tq):
            for j in range(m_pad):
                blk = wblk_ref[buf_step * tq + i, j]
                c = blk // ng
                g = blk - c * ng
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(c * d, d), pl.ds(g * gs, gs)],
                    slabs.at[slot, :, pl.ds((i * m_pad + j) * gs, gs)],
                    sems.at[slot, i],
                ).start()

    @pl.when(step == 0)
    def _():
        start_tile(step)

    @pl.when(step + 1 < nsteps)
    def _():
        start_tile(step + 1)

    slot = jax.lax.rem(step, 2)
    for i in range(tq):
        for j in range(m_pad):
            blk = wblk_ref[step * tq + i, j]
            c = blk // ng
            g = blk - c * ng
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(c * d, d), pl.ds(g * gs, gs)],
                slabs.at[slot, :, pl.ds((i * m_pad + j) * gs, gs)],
                sems.at[slot, i],
            ).wait()

    span = m_pad * gs
    for i in range(tq):
        fl = slabs[slot, :, pl.ds(i * span, span)].astype(jnp.bfloat16)
        # DEFAULT, explicitly: the global highest default would set fp32
        # contract precision on this bf16 dot, which Mosaic rejects
        dots = jax.lax.dot_general(
            qt_ref[i:i + 1, :], fl,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)       # (1, span)
        rf = fl.astype(jnp.float32)
        # HIGHEST: Mosaic otherwise lowers this f32 matmul at bf16
        # precision (measured on-chip r5: 1.3e-3 rel on the norms —
        # ~0.16 absolute error leaking into near-zero scores); with
        # HIGHEST it is bitwise equal to the XLA einsum
        xn = jax.lax.dot_general(
            w_ref[...], rf * rf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)       # (1, span)
        out_ref[i, :] = 2.0 * dots[0, :] - xn[0, :]


def _kernel(wblk_ref, qt_ref, w_ref, rows_hbm, out_ref, slabs, sems, *,
            tq, m_pad, gs, d, nsteps):
    """One grid step = one tq-query tile.

    wblk_ref  (nq_pad, m_pad) i32 SMEM (scalar-prefetch window ids)
    qt_ref    (tq, d)  bf16 VMEM — folded query tile
    w_ref     (1, d)   f32  VMEM — per-dim norm weights
    rows_hbm  (nblk, gs, d) int8|bf16, stays in HBM/ANY
    out_ref   (tq, m_pad·gs) f32
    slabs     (2, tq·m_pad·gs, d) scratch — double-buffered slab stage
    sems      DMA semaphores (2, tq) — SHARED per (slot, query): all m̃
              window DMAs of a query signal one semaphore and m̃ waits
              drain it (every DMA moves the same gs·d bytes, so any
              completion satisfies any wait). A per-window (2, tq, m̃)
              array blew the 2 KB sflag space at m̃=32 (r5 on-chip).
    """
    step = pl.program_id(0)

    def start_tile(buf_step):
        slot = jax.lax.rem(buf_step, 2)
        for i in range(tq):
            for j in range(m_pad):
                blk = wblk_ref[buf_step * tq + i, j]
                pltpu.make_async_copy(
                    rows_hbm.at[blk],
                    slabs.at[slot, pl.ds((i * m_pad + j) * gs, gs)],
                    sems.at[slot, i],
                ).start()

    @pl.when(step == 0)
    def _():
        start_tile(step)

    @pl.when(step + 1 < nsteps)
    def _():
        start_tile(step + 1)

    slot = jax.lax.rem(step, 2)
    for i in range(tq):
        for j in range(m_pad):
            blk = wblk_ref[step * tq + i, j]
            pltpu.make_async_copy(
                rows_hbm.at[blk],
                slabs.at[slot, pl.ds((i * m_pad + j) * gs, gs)],
                sems.at[slot, i],
            ).wait()

    # per-query score row: one (1, d)×(d, span) MXU pass each — no cross-
    # query flop waste, and the f32 temporaries stay O(span·d)
    span = m_pad * gs
    for i in range(tq):
        fl = slabs[slot, pl.ds(i * span, span)].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            qt_ref[i:i + 1, :], fl,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,      # see _kernel_t
            preferred_element_type=jnp.float32)       # (1, span) = 2qx̂/2
        rf = fl.astype(jnp.float32)
        # HIGHEST: see _kernel_t — f32 MXU matmuls otherwise run at bf16
        # precision under Mosaic
        xn = jax.lax.dot_general(
            w_ref[...], rf * rf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)       # (1, span) = ‖x̂‖²
        out_ref[i, :] = 2.0 * dots[0, :] - xn[0, :]


@functools.partial(
    jax.jit, static_argnames=("gs", "tq", "transposed", "interpret"))
def gather_rescore(
    q_eff: jnp.ndarray,        # (nq, d) f32 folded queries (q / scales)
    dim_w: jnp.ndarray,        # (d,) f32 norm weights (1/scales² | ones)
    bucket_rows: jnp.ndarray,  # (ncl·cap, d) — or (ncl·d, cap) transposed
    wblk: jnp.ndarray,         # (nq, m) i32 winner window/block ids
    gs: int,
    tq: int = 8,
    transposed: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scores (nq, m, gs) f32: 2·q·x̂ − ‖x̂‖² for every row of every winner
    window. The caller masks dead slots (bucket_ids == −1) and pads/merges.
    ``transposed`` selects the (ncl·d, cap) bucket layout (d % 128 != 0
    databases — see probe_pallas._groupmin_kernel_t).
    """
    nq, d = q_eff.shape
    m = wblk.shape[1]
    # lane alignment: the out block minor dim is m_pad·gs — pad m so it is
    # a multiple of 128 lanes (padded windows DMA block 0 and are discarded)
    m_pad = m
    while (m_pad * gs) % 128:
        m_pad += 1
    tq = max(1, min(tq, nq))
    nq_pad = -(-nq // tq) * tq
    if wblk.shape != (nq_pad, m_pad):
        wblk = jnp.pad(wblk, ((0, nq_pad - nq), (0, m_pad - m)))
    if nq_pad != nq:
        q_eff = jnp.pad(q_eff, ((0, nq_pad - nq), (0, 0)))
    nsteps = nq_pad // tq

    if transposed:
        # window DMAs are lane slices of (d, cap): Mosaic requires lane
        # slices 128-aligned (measured on-chip r5: gs=64 fails lowering)
        assert interpret or gs % 128 == 0, gs
        cap = bucket_rows.shape[1]
        ng = cap // gs
        kern = functools.partial(_kernel_t, tq=tq, m_pad=m_pad, gs=gs,
                                 d=d, ng=ng, nsteps=nsteps)
        rows_arg = bucket_rows
        slab_shape = (2, d, tq * m_pad * gs)
    else:
        nblk = bucket_rows.shape[0] // gs
        kern = functools.partial(_kernel, tq=tq, m_pad=m_pad, gs=gs, d=d,
                                 nsteps=nsteps)
        rows_arg = bucket_rows.reshape(nblk, gs, d)
        slab_shape = (2, tq * m_pad * gs, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((tq, d), lambda s, wb: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda s, wb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tq, m_pad * gs), lambda s, wb: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, bucket_rows.dtype),
            pltpu.SemaphoreType.DMA((2, tq)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, m_pad * gs), jnp.float32),
        interpret=interpret,
    )(wblk,
      q_eff.astype(jnp.bfloat16),
      dim_w.reshape(1, d),
      rows_arg)
    return out[:nq, : m * gs].reshape(nq, m, gs)
