"""Pallas group-min scoring kernel for the IVF/TI cluster-probe path.

The TPU replacement for the reference's per-row triangle-inequality scan
(``searchTriangleInequality`` VAQ.cpp:1540-1692): every probed
(cluster × its dispatched queries) pair is scored with dense MXU matmuls,
and each ``gs``-row *group* is reduced to ONE packed int32 — the group's
min squared distance (clamped f32, bitcast) with the group-local argmin row
in the low ``log2(gs)`` mantissa bits — entirely in VMEM.

Why this kernel exists (round-3 bisection, BENCH_r02 / VERDICT r2 #1): the
XLA formulation of the same computation ran at ~2% efficiency because
(a) the (cb, qcap, cap) f32 score intermediate was materialized to HBM
(+4.6 ms/batch at 1M), (b) per-(cluster, slot) ``lax.top_k`` over groups
cost +2.9 ms, and (c) the winner-group rescore gathered m·gs = 384 scattered
rows/query (+8.8 ms). With group-argmin packing the scan emits one i32 per
(group, slot), the merge is a flat row gather + one ``top_k``/``approx_max_k``
over windows, and the rescore reads the top ~2k windows' contiguous gs-row
blocks back from the buckets (whole blocks because neighbors are dense
within buckets — see ``ivf.probe_scan``) — the same window-winner structure
as the decode-then-dot capacity kernel (``scan_pallas.decode_window_scan``).

Distances are computed as ``‖x‖² − 2 q·x + ‖q‖²`` with both norms derived
*in-kernel from the bf16 operands*, so the packed quantity is exactly the
distance to the bf16-rounded row (the final rescore against the flat DB is
exact f32). Padding/deleted bucket slots carry sentinel row values
(``build_ivf`` writes 1e15), whose in-kernel distance ~1.3e32 is clamped to
the 1e30 ceiling — bitcast-safe (never NaN), never a winner against live
rows, and recognizably invalid downstream (≥ 1e30).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: distances ≥ this are treated as "no candidate" by the merge
SENTINEL_DIST = 1e30


_INNER_TILE = 1024


def _groupmin_kernel(qsl_ref, rows_ref, norms_ref, out_ref, *, gs):
    """One (cluster, row-slab) step: score the slab's rows against this
    cluster's query slab and emit per-gs-row-group packed minima.

    qsl_ref   (1, qcap, d) bf16 — the cluster's queries, PRE-SCALED by −2
    rows_ref  (rt, d)      bf16 — one large slab of the cluster's bucket rows
    norms_ref (1, rt)      f32  — exact row norms (+inf padding/deleted)
    out_ref   (rt/gs, qcap) i32 — packed (dist | local row) group minima

    The slab is as large as the VMEM DMA budget allows (whole buckets at the
    10M bench shapes — grid steps carry a fixed cost that dominated at
    rt=512 / 30k steps); compute iterates _INNER_TILE-row sub-tiles inside a
    ``fori_loop`` so the (tile, qcap) f32/i32 temporaries stay ~0.25 MB
    rather than scaling with the slab.

    The epilogue is the kernel's bound (VPU passes over every (row, slot)
    element — the MXU and HBM stream finish first), so it is pared to five:
    add row-norm column, add ‖q‖² row, mask-AND, OR local index, min-reduce.
    The −2 query pre-scale removes the multiply; the f32 norms input removes
    the in-kernel cast·square·reduce (3 passes — and makes the packed
    distance exact-norm quality); the non-negativity clamp is gone because
    dist = ‖x‖² − 2qx + ‖q‖² ≥ −ε with only bf16-rounding-scale negatives,
    and among bitcast-int negatives the min just picks some ≈0-distance row
    — harmless by construction. Padding/deleted slots mask via their +inf
    norms: +inf | local is a NaN bit pattern, but int-min ordering still
    ranks it above every finite candidate, and the merge unmasks it to
    exactly +inf (≥ SENTINEL_DIST ⇒ invalid window).
    """
    rt, d = rows_ref.shape
    qcap = qsl_ref.shape[1]
    it = max(t for t in (_INNER_TILE, 512, 256, 128, 64, 32, gs)
             if t <= _INNER_TILE and rt % t == 0)
    q = qsl_ref[0]                                         # (qcap, d) bf16
    qf = q.astype(jnp.float32)
    qn = 0.25 * jnp.sum(qf * qf, axis=1, keepdims=True).T  # (1, qcap) ‖q‖²
    local = jax.lax.broadcasted_iota(jnp.int32, (it, qcap), 0) & (gs - 1)

    def tile_body(i, _):
        rows = rows_ref[pl.dslice(i * it, it), :]
        xn = jnp.transpose(norms_ref[0:1, pl.dslice(i * it, it)],
                           (1, 0))                         # (it, 1)
        dot = jax.lax.dot_general(
            rows, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (it, qcap) −2qx
        dist = (dot + xn) + qn
        ai = jax.lax.bitcast_convert_type(dist, jnp.int32)
        packed = (ai & ~(gs - 1)) | local
        out_ref[pl.dslice(i * (it // gs), it // gs), :] = jnp.min(
            packed.reshape(it // gs, gs, qcap), axis=1)
        return 0

    jax.lax.fori_loop(0, rt // it, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("ncl", "cap", "gs", "rt", "interpret"))
def groupmin_window_scan(
    qsl: jnp.ndarray,        # (ncl, qcapP, d) bf16 query slabs, −2-scaled
    bucket_rows: jnp.ndarray,  # (ncl*cap, d) bf16, sentinel padding rows
    bucket_norms: jnp.ndarray,  # (ncl*cap,) f32, +inf padding/deleted
    ncl: int,
    cap: int,
    gs: int = 16,
    rt: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed group minima for every (cluster, query-slot, gs-row group).

    Returns (ncl, ng, qcapP) i32 with ng = cap // gs. Grid is
    (ncl, cap // rt): row slabs stream HBM→VMEM while each cluster's query
    slab stays resident across its tiles.
    """
    qcap, d = qsl.shape[1], qsl.shape[2]
    assert cap % rt == 0 and rt % gs == 0, (cap, rt, gs)
    assert gs >= 8 and gs & (gs - 1) == 0, gs
    ntiles = cap // rt
    ng = cap // gs
    packed = pl.pallas_call(
        functools.partial(_groupmin_kernel, gs=gs),
        grid=(ncl, ntiles),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda c, t: (c * (cap // rt) + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt), lambda c, t: (c * (cap // rt) + t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt // gs, qcap),
                               lambda c, t: (c * (cap // rt) + t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncl * ng, qcap), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qsl, bucket_rows, bucket_norms.reshape(ncl * ntiles, rt))
    return packed.reshape(ncl, ng, qcap)
