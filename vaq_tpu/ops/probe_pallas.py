"""Pallas group-min scoring kernel for the IVF/TI cluster-probe path.

The TPU replacement for the reference's per-row triangle-inequality scan
(``searchTriangleInequality`` VAQ.cpp:1540-1692): every probed
(cluster × its dispatched queries) pair is scored with dense MXU matmuls,
and each ``gs``-row *group* (window) is reduced to ONE f32 — the group's
min squared distance — entirely in VMEM.

Why this kernel exists (round-3 bisection, BENCH_r02 / VERDICT r2 #1): the
XLA formulation of the same computation ran at ~2% efficiency because
(a) the (cb, qcap, cap) f32 score intermediate was materialized to HBM,
(b) per-(cluster, slot) ``lax.top_k`` over groups cost +2.9 ms, and (c) the
winner rescore gathered m·gs scattered rows/query. With the group-min
reduction the scan emits one f32 per (group, slot), the merge is a flat row
gather + one ``top_k``/``approx_max_k`` over windows, and the rescore reads
the top m = 2k windows' contiguous gs-row blocks back from the buckets —
the same window-winner structure as the decode-then-dot capacity kernel
(``scan_pallas.decode_window_scan``).

Round-4 redesign, driven by on-chip bisection at the 10M bench shape
(`.scratch/repl4.out`):

* **Static unrolled inner tiles.** The r3/r4-draft ``fori_loop`` +
  dynamic ``pl.dslice`` form scalarized under Mosaic (a traced sublane
  offset defeats tile-alignment analysis): 794 ms/call at the 1M shape vs
  ~1.6 ms with compile-time slice offsets.
* **Norms are computed IN-KERNEL**, not streamed: the r3 design's f32
  norms input needs a (1, it)→(it, 1) lane→sublane relayout per tile that
  cost +3.5 ms at the 10M shape (7.37 → 3.87 ms without it). ``‖x̂‖² =
  Σ_d rows² · w_d`` with ``w`` a lane-aligned per-dim weight row
  (broadcast over sublanes is free). For int8 rows this is EXACT
  (integer squares < 2²¹ in f32); for bf16 rows it matches the f32
  accumulation quality of the old input.
* **Bucket rows may be int8** (per-dim scales folded into the query slab
  by the caller exactly as the decoded8 tier does, scan_decoded.py:168;
  ``w = 1/scales²``): the rows stream is the kernel's HBM roofline term
  and int8 halves it vs bf16.
* **Masking is by row VALUES, not a norms input.** bf16 padding/deleted
  slots hold 1e15 sentinels (distance ~1e32 — loses every min, and
  recognizable ≥ SENTINEL_DIST). int8 slots hold the max-norm POISON
  pattern (±127 alternating, see ``poison_pattern``): their distance
  ``(√B − ‖q‖)² + …`` with B = Σ max_d² ranks at or above every realistic
  row, so poisoned slots lose the group-min against live rows. This is a
  *ranking* guard only — exactness of the final output does not depend on
  it, because the block rescore masks slots with ``bucket_ids == -1``
  (padding and deletions) to −inf, so a poison row can never be returned
  (BitVecEngine.cpp:1626-1636 delete semantics).

The r3 packed argmin-index epilogue (iota/AND/OR/bitcast int) is gone —
the window rescore never consumed the index, and the f32 min makes the
near-zero-distance negative-rounding edge case exact by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: distances at or above this are treated as "definitely not a candidate";
#: bf16 sentinel rows produce ~1e32 > this, live rows are far below it
SENTINEL_DIST = 1e30


_INNER_TILE = 1024
#: VMEM budget for the per-inner-tile temporaries (dot/dist f32 pair plus
#: the bf16 row cast + f32 square), in bytes — keeps large-qcap configs
#: compilable (ADVICE r3: (it, qcap) temporaries scale with qcap up to nq)
_TEMP_BUDGET = 3 << 20
#: VMEM budget for the double-buffered row slab + output block. The chip
#: has ~16 MB of scoped VMEM; leave headroom for the query slab and
#: Mosaic's own stack.
_SLAB_BUDGET = 10 << 20


def poison_pattern(d: int, dim_scales=None) -> np.ndarray:
    """The int8 padding/deleted-slot row: alternating ±127.

    Its reconstruction has the maximum possible norm B = Σ_d max_d², and
    the alternating signs keep |q·x̂_pad| small for natural queries, so its
    distance ranks at/above every live row. (Ranking guard only — the
    rescore masks poisoned slots exactly via bucket_ids == -1.)
    """
    pat = np.full((d,), 127, dtype=np.int8)
    pat[1::2] = -127
    return pat


def pick_inner_tile(rt: int, gs: int, qcap_p: int, d: int,
                    lane_rows: bool = False) -> int:
    """Largest inner row tile whose temporaries fit _TEMP_BUDGET.

    Temporaries per tile: the bf16 row cast + f32 square (it·d·6) and
    dot/dist f32 + min input (~it·qcap·12).

    ``lane_rows``: the transposed-slab kernel slices its (d, rt) slab on
    the LANE axis, so the tile must additionally be a multiple of 128.
    """
    per_row = 6 * d + 12 * qcap_p
    budget = max(_TEMP_BUDGET // per_row, gs)
    floor = 128 if lane_rows else gs
    cands = [t for t in (_INNER_TILE, 512, 256, 128, 64, 32, 16, 8)
             if rt % t == 0 and t % gs == 0
             and (not lane_rows or t % 128 == 0)]
    return max(t for t in cands if t <= budget or t == min(cands, default=floor))


def pick_row_tile(cap: int, gs: int, qcap_p: int, d: int,
                  itemsize: int):
    """Largest row-slab tile (a multiple of 512 dividing ``cap``) whose
    double-buffered slab + output block fit _SLAB_BUDGET, or None when no
    Mosaic-legal tile exists for this (cap, gs).

    Large slabs matter: grid steps carry a fixed cost that dominated the
    10M bench at rt=512 (30k steps — 12.2 ms vs 7.4 ms whole-bucket slabs,
    r4 bisection), so rt should be as large as VMEM allows.

    Mosaic legality (ADVICE r4): the output block is (rt // gs, qcap) on a
    (ncl·ng, qcap) array, and the second-to-minor block dim must be a
    multiple of 8 — so only rt % (8·gs) == 0 tiles are admissible (a
    cap = 512·33 bucket at gs = 128 has NO such divisor; callers fall back
    to a smaller gs via :func:`pick_gs_rt`).
    """
    best = smallest_legal = None
    for rt in range(512, cap + 1, 512):
        if cap % rt or rt % (8 * gs):
            continue
        if smallest_legal is None:
            smallest_legal = rt
        bytes_needed = 2 * rt * d * itemsize + 2 * (rt // gs) * qcap_p * 4
        if bytes_needed <= _SLAB_BUDGET:
            best = rt
    return best if best is not None else smallest_legal


def pick_gs_rt(cap: int, qcap_p: int, d: int, itemsize: int,
               target_ng: int = 240, gs_max: int = 256):
    """(gs, rt) for the group-min kernel: grow the group size while the
    per-bucket window count stays above ``target_ng`` (the merge-traffic /
    rescore trade, see IVFSearcher.params), then back off until a
    Mosaic-legal row tile exists (rt % (8·gs) == 0 dividing cap — gs = 8
    always admits rt = 512, so this terminates with a valid pair)."""
    gs = 8
    while gs < gs_max and cap // gs > target_ng:
        gs *= 2
    while gs > 8:
        rt = pick_row_tile(cap, gs, qcap_p, d, itemsize)
        if rt is not None:
            return gs, rt
        gs //= 2
    return 8, pick_row_tile(cap, 8, qcap_p, d, itemsize)


def _groupmin_kernel(qsl_ref, w_ref, rows_ref, out_ref, *, gs, it):
    """One (cluster, row-slab) step: score the slab's rows against this
    cluster's query slab and emit per-gs-row-group minima.

    qsl_ref   (1, qcap, d) bf16 — the cluster's queries, PRE-SCALED by −2
                                  (and by the per-dim int8 scales when the
                                  rows are int8)
    w_ref     (1, d)       f32  — per-dim norm weights (1/scales² for int8
                                  rows; ones for bf16)
    rows_ref  (rt, d)  bf16|int8 — one large slab of the cluster's rows
    out_ref   (rt/gs, qcap) f32 — per-group min squared distances

    The slab is as large as the VMEM DMA budget allows (whole buckets at
    the bench shapes); compute iterates ``it``-row sub-tiles with
    compile-time offsets (see module docstring on why not fori_loop).
    """
    rt = rows_ref.shape[0]
    qcap = qsl_ref.shape[1]
    q = qsl_ref[0]                                         # (qcap, d) bf16
    qf = q.astype(jnp.float32)
    qn = 0.25 * jnp.sum(qf * qf, axis=1, keepdims=True).T  # (1, qcap) ‖q‖²
    w = w_ref[0:1, :]                                      # (1, d)

    for i in range(rt // it):
        rows = rows_ref[i * it:(i + 1) * it, :].astype(jnp.bfloat16)
        # precision DEFAULT, explicitly: the session-wide
        # jax_default_matmul_precision=highest otherwise reaches this
        # bf16 dot and Mosaic rejects fp32 contract precision on bf16
        # operands ("Bad lhs type", hit at the 100M d=96 compile). bf16
        # MXU multiplies are exact regardless.
        dot = jax.lax.dot_general(
            rows, q, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)            # (it, qcap) −2qx̂
        rf = rows.astype(jnp.float32)
        xn = jnp.sum(rf * rf * w, axis=1, keepdims=True)   # (it, 1) ‖x̂‖²
        dist = (dot + xn) + qn
        # f32 output, deliberately: a bf16 min was tried (halves merge
        # traffic, same kernel speed) and COLLAPSED recall at the 1M/10M
        # bench (0.32→0.23 / 0.24→0.15) — the distances carry a large
        # per-query constant (for int8 rows qn is ‖q/s‖², scale-inflated),
        # so bf16's 8 mantissa bits round away the inter-window gaps.
        # gs=64 recovers the merge traffic instead (ivf.IVFSearcher.params).
        out_ref[i * (it // gs):(i + 1) * (it // gs), :] = jnp.min(
            dist.reshape(it // gs, gs, qcap), axis=1)


def _groupmin_kernel_t(qsl_ref, w_ref, rows_ref, out_ref, *, gs, it):
    """Transposed-slab variant of :func:`_groupmin_kernel`.

    rows_ref is (d, rt) — the storage layout for d % 128 != 0 databases
    (e.g. the Fig.-11 DEEP d=96): row-major (rows, d) int8 lane-pads d up
    to 128 on device (a +3.3 GB tax at 100M×96d that OOMed every r4/r5
    upload attempt), while (d, cap) keeps physical = logical. The MXU
    takes the transposed operand natively:
    ``dot_general(slab (d,it), q (qcap,d), contract d×d) → (it, qcap)``,
    and the per-row norms come from ``(slab²) · w(d,1) → (it, 1)`` — the
    same epilogue and output layout as the row-major kernel, so the merge
    is layout-independent.

    w_ref here is (d, 1) (a sublane vector), not (1, d).
    """
    qcap = qsl_ref.shape[1]
    rt = rows_ref.shape[1]
    q = qsl_ref[0]                                         # (qcap, d) bf16
    qf = q.astype(jnp.float32)
    qn = 0.25 * jnp.sum(qf * qf, axis=1, keepdims=True).T  # (1, qcap)
    w = w_ref[...]                                         # (d, 1)

    for i in range(rt // it):
        slab = rows_ref[:, i * it:(i + 1) * it].astype(jnp.bfloat16)
        dot = jax.lax.dot_general(
            slab, q, dimension_numbers=(((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,  # see _groupmin_kernel
            preferred_element_type=jnp.float32)            # (it, qcap) −2qx̂
        sf = slab.astype(jnp.float32)
        # HIGHEST: Mosaic lowers f32 MXU matmuls at reduced precision by
        # default (measured r5: ~2⁻²¹ effective here) — the row-major
        # kernel's elementwise-sum norms are full f32, so match them
        xn = jax.lax.dot_general(
            sf * sf, w, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # (it, 1) ‖x̂‖²
        dist = (dot + xn) + qn
        out_ref[i * (it // gs):(i + 1) * (it // gs), :] = jnp.min(
            dist.reshape(it // gs, gs, qcap), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("ncl", "cap", "gs", "rt", "transposed",
                                    "interpret"))
def groupmin_window_scan(
    qsl: jnp.ndarray,        # (ncl, qcapP, d) bf16 query slabs, −2-scaled
    bucket_rows: jnp.ndarray,  # (ncl*cap, d) — or (ncl*d, cap) transposed
    dim_w: jnp.ndarray,      # (d,) f32 norm weights (1/scales² | ones)
    ncl: int,
    cap: int,
    gs: int = 16,
    rt: int = 512,
    transposed: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-(cluster, query-slot, gs-row group) min squared distances.

    Returns (ncl, ng, qcapP) f32 with ng = cap // gs (window-ranking
    values; exact distances come from the caller's block rescore). Grid is
    (ncl, cap // rt): row slabs stream HBM→VMEM while each cluster's query
    slab stays resident across its tiles. ``transposed`` selects the
    (d, cap) bucket layout for d % 128 != 0 (see _groupmin_kernel_t).
    """
    qcap, d = qsl.shape[1], qsl.shape[2]
    # rt % (8·gs): the out block's second-to-minor dim (rt // gs) must be a
    # multiple of 8 for Mosaic (ADVICE r4 — interpret mode never enforces
    # it, so assert here rather than fail only on hardware)
    assert cap % rt == 0 and rt % (8 * gs) == 0, (cap, rt, gs)
    assert gs >= 8 and gs & (gs - 1) == 0, gs
    ntiles = cap // rt
    ng = cap // gs
    it = pick_inner_tile(rt, gs, qcap, d, lane_rows=transposed)
    if transposed:
        sub = 32 if bucket_rows.dtype == jnp.int8 else 16
        assert d % sub == 0, (d, bucket_rows.dtype)  # sublane tile fit
        kern = functools.partial(_groupmin_kernel_t, gs=gs, it=it)
        rows_spec = pl.BlockSpec((d, rt), lambda c, t: (c, t),
                                 memory_space=pltpu.VMEM)
        w_arg = dim_w.reshape(d, 1)
        w_spec = pl.BlockSpec((d, 1), lambda c, t: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_groupmin_kernel, gs=gs, it=it)
        rows_spec = pl.BlockSpec((rt, d), lambda c, t: (c * ntiles + t, 0),
                                 memory_space=pltpu.VMEM)
        w_arg = dim_w.reshape(1, d)
        w_spec = pl.BlockSpec((1, d), lambda c, t: (0, 0),
                              memory_space=pltpu.VMEM)
    mins = pl.pallas_call(
        kern,
        grid=(ncl, ntiles),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            rows_spec,
        ],
        out_specs=pl.BlockSpec((rt // gs, qcap),
                               lambda c, t: (c * ntiles + t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncl * ng, qcap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(qsl, w_arg, bucket_rows)
    return mins.reshape(ncl, ng, qcap)
