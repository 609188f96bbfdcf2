"""IVF-style cluster probing — the TPU analog of triangle-inequality pruning.

The reference's TI path (``VAQ::clusterTI`` VAQ.cpp:878-999 +
``searchTriangleInequality`` VAQ.cpp:1540-1692) builds k-means clusters in
*reconstructed code space* over the first ``ti_segment_num`` subspaces,
sorts each cluster's members by distance-to-centroid, and at query time
visits nearest clusters — at least the ``visit`` fraction, and at least
until ≥ k members have been seen (VAQ.cpp:1548-1551) — breaking out of a
cluster when the triangle inequality proves the rest can't win.

Round-2 TPU redesign (VERDICT r1 #3): per-row branchy exits still don't
vectorize, but everything else now runs as ONE batched device program via
the MoE-style dispatch in ``vaq_tpu.ops.probe``:

  cluster distances (matmul) → dynamic visit-until-≥k probe masks →
  per-cluster query lists (static capacity) → one blocked batched matmul
  scoring every probed (cluster × its queries) pair → per-cluster top-k →
  gather-merge per query.

This replaces round 1's per-query ``dynamic_slice`` + ``lax.map`` host loop
(~1 dispatch per query chunk with serialized gathers). The `visit` knob
trades recall for scanned rows exactly as in the reference; the TI per-row
break is replaced by not scanning unprobed clusters at all.

Note on economics: on TPU the exhaustive fused scan is extremely
matmul-friendly; probing wins for very large databases or strict latency
targets (measured in bench.py --ivf at 10M rows).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaq_tpu import kmeans
from vaq_tpu.errors import ConfigError
from vaq_tpu.ops import probe as probe_ops
from vaq_tpu.ops import probe_pallas


@dataclasses.dataclass
class IVFState:
    """Bucketed decoded database grouped by cluster (static shapes)."""

    centroids: np.ndarray        # (ncl, seg_dims) f32 cluster centroids
    seg_dims: int                # prefix dims used for cluster distances
    cap: int                     # rows per bucket (padded)
    # Device arrays:
    bucket_rows: jnp.ndarray     # (ncl, cap, D) bf16 decoded rows; padding
    #                              and deleted slots hold 1e15 sentinels
    bucket_norms: jnp.ndarray    # (ncl, cap) f32 (+inf padding)
    bucket_ids: jnp.ndarray      # (ncl, cap) i32 (-1 padding)
    sizes: jnp.ndarray           # (ncl,) i32 live member counts

    @property
    def ncl(self) -> int:
        return self.centroids.shape[0]


def resolve_seg_num(cfg, cum_var_per_subs, highest_subs: int) -> int:
    """ti_variance < 1 → #subspaces with cumvar ≤ ti_variance (min 1);
    ti_segment_num == -1 → all kept subspaces (VAQ.cpp:879-893)."""
    if cfg.ti_variance < 1.0:
        seg = int(np.sum(np.asarray(cum_var_per_subs) <= cfg.ti_variance))
        return max(seg, 1)
    if cfg.ti_segment_num == -1:
        return highest_subs
    return int(cfg.ti_segment_num)


def build_ivf(index, verbose: bool = False,
              balance_cap_factor: float = 1.5,
              ti_cluster_num: Optional[int] = None,
              ti_segment_num: Optional[int] = None) -> IVFState:
    """Cluster the decoded database and group rows into padded buckets.

    Mirrors clusterTI(useKMeans=True): k-means in decoded (reconstructed)
    space over the prefix subspaces, assignment by nearest centroid, rows
    regrouped by cluster. Two TPU adaptations: (a) the member sort by
    distance-to-centroid (which powers the reference's per-row break) is
    unnecessary; (b) clusters larger than ``balance_cap_factor ×`` the mean
    are capacity-bounded — overflow rows move to their next-nearest cluster
    with space — so the static bucket capacity (and with it the batched
    scan's wasted work) stays bounded under k-means imbalance.

    ``ti_cluster_num``/``ti_segment_num`` override the config's TI fields
    when given, so benchmark/serving callers never have to mutate
    ``index.config`` to attach probe state (VERDICT r2 weak #9).
    """
    cfg = index.config
    if ti_cluster_num is not None or ti_segment_num is not None:
        cfg = dataclasses.replace(
            cfg,
            ti_cluster_num=(cfg.ti_cluster_num if ti_cluster_num is None
                            else ti_cluster_num),
            ti_segment_num=(cfg.ti_segment_num if ti_segment_num is None
                            else ti_segment_num))
    index._ensure_decoded()
    dec_dev = index.decoded                     # (n, D) bf16, device
    norms_dev = jnp.asarray(index.decoded_norms)
    n, d_full = dec_dev.shape
    seg_subs = resolve_seg_num(cfg, index.cum_var_per_subs, index.highest_subs)
    seg_subs = min(seg_subs, index.highest_subs)
    seg_dims = seg_subs * index.subs_len
    ncl = int(cfg.ti_cluster_num)
    if ncl <= 0:
        raise ConfigError("ti_cluster_num must be set for the TI/IVF method")

    # Everything data-proportional stays on device: the r1 build fetched the
    # decoded DB to host and pushed padded buckets back (2×5 GB through the
    # tunnel at 10M rows — it dominated the build).
    prefix = dec_dev[:, :seg_dims].astype(jnp.float32)
    rng = np.random.default_rng(cfg.seed)
    init_idx = (rng.choice(n, size=ncl, replace=False) if n >= ncl
                else rng.choice(n, size=ncl, replace=True))
    c0 = prefix[jnp.asarray(init_idx.astype(np.int32))]
    cents_dev = kmeans.lloyd(prefix, c0, iters=cfg.kmeans_iters)
    assign = np.asarray(kmeans.assign_clusters(prefix, cents_dev),
                        dtype=np.int64)
    cents = np.asarray(cents_dev)

    # Capacity-bounded reassignment: pick the S nearest clusters per row,
    # fill clusters first-choice-first with a hard cap.
    cap = max(1, int(math.ceil(balance_cap_factor * n / ncl)))
    if np.bincount(assign, minlength=ncl).max() > cap:
        s_cand = min(8, ncl)

        # top-S candidate clusters per row, computed in row blocks so the
        # (n, ncl) distance matrix is never materialized (40 GB at 10M×1k)
        @jax.jit
        def _topS(block):
            d2b = probe_ops.cluster_sq_dists(block, cents_dev)
            _, idx = jax.lax.top_k(-d2b, s_cand)
            return idx

        cand = np.empty((n, s_cand), dtype=np.int64)
        blk = 1 << 20
        for start in range(0, n, blk):
            cand[start:start + blk] = np.asarray(
                _topS(prefix[start:start + blk]))
        # round-based greedy fill (vectorized): in round j, unplaced rows
        # claim their j-th nearest cluster; each cluster admits claimants up
        # to its remaining space in row order
        fill = np.zeros(ncl, dtype=np.int64)
        assign = np.full(n, -1, dtype=np.int64)
        for j in range(s_cand):
            un = np.flatnonzero(assign < 0)
            if un.size == 0:
                break
            choice = cand[un, j]
            order = np.argsort(choice, kind="stable")
            sorted_choice = choice[order]
            seg_start = np.searchsorted(sorted_choice, sorted_choice,
                                        side="left")
            rank = np.arange(un.size) - seg_start
            take = rank < (cap - fill)[sorted_choice]
            taken_rows = un[order[take]]
            taken_cl = sorted_choice[take]
            assign[taken_rows] = taken_cl
            fill += np.bincount(taken_cl, minlength=ncl)
        spill = np.flatnonzero(assign < 0)
        if spill.size:  # extremely skewed data: fill remaining space
            space = np.maximum(cap - fill, 0)
            slots = np.repeat(np.arange(ncl), space)
            assign[spill] = slots[: spill.size]
    sizes = np.bincount(assign, minlength=ncl)
    cap = int(max(cap, sizes.max()))
    cap = -(-cap // 512) * 512  # multiple of the Pallas kernel's 512-row
    #                             tile (padding slots carry sentinel rows —
    #                             clamped to SENTINEL_DIST, never winners)
    if verbose:
        print(f"== ivf: {ncl} clusters, seg_dims={seg_dims}, cap={cap}, "
              f"sizes min/mean/max = {sizes.min()}/{sizes.mean():.0f}/"
              f"{sizes.max()}")

    # bucket membership table on host (one vectorized scatter, no per-cluster
    # loop), then ONE device gather materializes the padded buckets from the
    # already-resident decoded DB
    del prefix  # free the f32 projection before materializing buckets
    bids = np.full((ncl, cap), -1, dtype=np.int32)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    seg_start = np.searchsorted(sorted_assign, sorted_assign, side="left")
    rank = np.arange(n) - seg_start
    bids[sorted_assign, rank] = order.astype(np.int32)

    bids_dev = jnp.asarray(bids)
    safe = jnp.maximum(bids_dev, 0).reshape(-1)
    bnorms = jnp.where(bids_dev >= 0,
                       norms_dev[safe].reshape(ncl, cap), jnp.inf)
    # rows deleted before the build carry +inf norms; exclude them from the
    # live member counts the visit rule uses, and overwrite their bucket
    # rows (and padding slots) with the kernel's sentinel value so the
    # group-argmin scan can never select them
    live = jnp.isfinite(bnorms)
    rows_dev = jnp.where(
        live[:, :, None], dec_dev[safe].reshape(ncl, cap, d_full),
        jnp.asarray(1e15, dec_dev.dtype))
    live = live.sum(axis=1).astype(jnp.int32)

    return IVFState(
        centroids=cents,
        seg_dims=seg_dims,
        cap=cap,
        bucket_rows=rows_dev,
        bucket_norms=bnorms,
        bucket_ids=bids_dev,
        sizes=live,
    )


@functools.partial(jax.jit, static_argnames=(
    "k", "p_visit", "p_max", "qcap", "exact", "gs", "rt", "interpret"))
def probe_scan(
    qp: jnp.ndarray,           # (nq, D) projected queries
    centroids: jnp.ndarray,    # (ncl, seg_dims)
    bucket_rows: jnp.ndarray,  # (ncl, cap, D) bf16 (sentinel-padded)
    bucket_norms: jnp.ndarray,  # (ncl, cap) f32 (+inf padding/deleted)
    bucket_ids: jnp.ndarray,    # (ncl, cap) i32 (-1 padding)
    sizes: jnp.ndarray,         # (ncl,) live member counts
    k: int,
    p_visit: int,
    p_max: int,
    qcap: int,
    exact: bool = True,
    gs: int = 16,
    rt: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused dispatch: probe → MoE dispatch → Pallas group-argmin scan →
    per-query window merge → block rescore of the winner windows.

    Round-3 redesign (VERDICT r2 #1, per-stage bisection in BASELINE.md):
    the scoring kernel (``ops/probe_pallas.groupmin_window_scan``) reduces
    every gs-row group to one packed (min distance | argmin row) int32 in
    VMEM, so nothing row-shaped ever hits HBM; the merge gathers each
    query's probed group minima as flat rows and takes the best m = 2k
    windows; the rescore reads those windows' full gs-row blocks back from
    the bucket-resident arrays — contiguous slabs, not the old path's
    scattered single-row gather from the flat DB (which, together with the
    (cb, qcap, cap) f32 HBM intermediate and per-(cluster, slot) ``top_k``,
    made up ~16 ms of the 23 ms batch at 1M).

    Window-rescore correctness: a gs-row group containing any true top-k row
    has group-min ≤ d_k, and at most k groups can have group-min ≤ d_k (any
    such group's argmin is itself a top-k row) — so the top m = 2k windows
    provably contain every group holding a top-k row, and rescoring their
    full blocks recovers neighbors that are DENSE within one bucket (the
    common IVF case a one-candidate-per-group reduction loses; measured
    0.39 vs 0.90 recall on the 4k-row fixture before this fix). Remaining
    approximation: bf16 scoring ties and the visit budget itself — the same
    contract as the reference's TI break (VAQ.cpp:1548-1551). Deleted rows
    carry +inf bucket_norms and sentinel bucket rows, so they rescore to
    +inf and are filtered exactly (BitVecEngine.cpp:1626-1636 semantics).
    """
    nq, d_full = qp.shape
    ncl, cap = bucket_ids.shape
    ng = cap // gs
    if ng * gs != cap or cap % rt or rt % gs:
        raise ValueError(f"cap {cap} not tileable by rt={rt}, gs={gs}")
    qcap = min(qcap, nq)

    cd = probe_ops.cluster_sq_dists(qp[:, : centroids.shape[1]], centroids)
    probe, active = probe_ops.dynamic_probe(cd, sizes, k, p_visit, p_max)
    table, ok, ent_c, ent_r = probe_ops.dispatch_table(probe, active, ncl,
                                                       qcap)
    qp_pad = jnp.concatenate(
        [qp, jnp.zeros((1, d_full), qp.dtype)], axis=0)
    # −2 pre-scale: the kernel's epilogue is VPU-pass-bound, so the distance
    # multiply is folded into the query slab here (see _groupmin_kernel)
    qsl = (-2.0 * qp_pad)[table].astype(jnp.bfloat16)      # (ncl, qcap, D)
    qcap_p = -(-qcap // 128) * 128                         # kernel lane tile
    if qcap_p != qcap:
        qsl = jnp.pad(qsl, ((0, 0), (0, qcap_p - qcap), (0, 0)))

    packed = probe_pallas.groupmin_window_scan(
        qsl, bucket_rows.reshape(ncl * cap, d_full),
        bucket_norms.reshape(ncl * cap), ncl, cap, gs=gs, rt=rt,
        interpret=interpret)                               # (ncl, ng, qcap_p)

    # per-query window merge: flat row gather of each dispatched entry's
    # group minima, then top-m windows by the packed float view
    flat = packed.transpose(0, 2, 1).reshape(ncl * qcap_p, ng)
    inf_bits = jnp.int32(0x7F800000)                       # +inf, idx = 0
    cand = jnp.where(ok[:, None], flat[ent_c * qcap_p + ent_r], inf_bits)
    cand = cand.reshape(nq, p_max * ng)
    f = jax.lax.bitcast_convert_type(cand, jnp.float32)
    m = min(max(2 * k, 16), p_max * ng)
    if exact or p_max * ng < 1024:
        _, pos = jax.lax.top_k(-f, m)
    else:
        _, pos = jax.lax.approx_max_k(-f, m, recall_target=0.95)
        pos = pos.astype(jnp.int32)
    wp = jnp.take_along_axis(cand, pos, axis=1)            # (nq, m)
    wf = jax.lax.bitcast_convert_type(wp & ~(gs - 1), jnp.float32)
    w_ok = wf < probe_pallas.SENTINEL_DIST                 # dispatched + live
    p_slot = pos // ng
    g_idx = pos % ng
    clus = jnp.take_along_axis(probe, p_slot, axis=1)
    wblk = clus * ng + g_idx                               # (nq, m) block ids

    # block rescore: gather the winner windows' full gs-row slabs from the
    # bucket-resident arrays (contiguous gs·D·2-byte blocks — the slab shape
    # is what makes this gather ~4× cheaper than m·gs scattered rows).
    # NOTE: do NOT "flatten" these to (ncl·ng, gs·d) row gathers — that
    # reshape retiles the whole bucket array (measured +10 ms at 10M).
    blk_rows = bucket_rows.reshape(ncl * ng, gs, d_full)[wblk]
    blk_norms = bucket_norms.reshape(ncl * ng, gs)[wblk]   # (nq, m, gs)
    blk_ids = bucket_ids.reshape(ncl * ng, gs)[wblk]
    inner = jnp.einsum("qd,qmgd->qmg", qp.astype(jnp.bfloat16), blk_rows,
                       preferred_element_type=jnp.float32)
    score = jnp.where(w_ok[:, :, None], 2.0 * inner - blk_norms, -jnp.inf)
    score = score.reshape(nq, m * gs)
    rows = blk_ids.reshape(nq, m * gs)
    qn = jnp.sum(qp * qp, axis=1)
    kk = min(k, m * gs)
    top_s, post = jax.lax.top_k(score, kk)                 # k ≤ 2k·gs = m·gs
    top_i = jnp.take_along_axis(rows, post, axis=1)
    if kk < k:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)),
                        constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    d2 = jnp.maximum(qn[:, None] - top_s, 0.0)
    fin = jnp.isfinite(top_s)
    return jnp.where(fin, d2, jnp.inf), jnp.where(fin, top_i, -1)


class IVFSearcher:
    """Adapter giving `VAQIndex.search` its TI/IVF path (index.ivf)."""

    def __init__(self, state: IVFState, visit: float):
        self.state = state
        self.visit = float(visit)

    def _sizes_np(self) -> np.ndarray:
        return np.asarray(self.state.sizes)

    def params(self, k: int, nq: int) -> Tuple[int, int, int, int, int]:
        """(p_visit, p_max, qcap, gs, rt) — static shapes for this (k, nq)."""
        st = self.state
        ncl = st.ncl
        p_visit = max(1, int(np.ceil(self.visit * ncl)))
        # worst case over probe sets: smallest clusters first
        sizes = self._sizes_np()
        cum = np.cumsum(np.sort(sizes))
        p_floor = int(np.searchsorted(cum, k) + 1)
        p_max = min(ncl, max(p_visit, p_floor))
        # group size trades the kernel's packed-output traffic
        # (ncl·cap/gs·qcap·4 B) against the block rescore (2k·gs rows/query);
        # correctness is gs-independent (window rescore, see probe_scan), so
        # scale gs ∝ cap and clamp to the packing's [8, 64] range
        gs = 8
        while gs < 64 and st.cap // gs > 480:
            gs *= 2
        # Small batches get strict capacity (qcap = nq: no entry can ever
        # drop); large throughput batches use ~2× mean-demand slack, where
        # drops require pathologically correlated queries (documented in
        # ops/probe.py).
        qcap = nq if nq <= 256 else probe_ops.pick_qcap(nq, p_max, ncl)
        # Row tile: as large as the VMEM budget allows (~4 MB of bf16 rows
        # double-buffered). Small tiles multiply grid steps — rt=512 at the
        # 10M shapes meant 30k steps whose fixed per-step cost dominated the
        # kernel (17.8 ms vs a ~6 ms roofline).
        d_full = st.bucket_rows.shape[2]
        budget = max(512, (4 << 20) // (2 * d_full) // 512 * 512)
        rt = max(g for g in range(512, st.cap + 1, 512)
                 if st.cap % g == 0 and g % gs == 0 and g <= budget)
        return p_visit, p_max, qcap, gs, rt

    def probes(self, k: int) -> int:
        """Static probe count (legacy accessor used by tests/tools)."""
        return self.params(k, 1)[1]

    def search(self, index, qp: jnp.ndarray, luts, k: int,
               exact: bool = True):
        st = self.state
        qp = jnp.asarray(qp)
        p_visit, p_max, qcap, gs, rt = self.params(k, qp.shape[0])
        interpret = jax.default_backend() != "tpu"
        return probe_scan(qp, jnp.asarray(st.centroids), st.bucket_rows,
                          st.bucket_norms, st.bucket_ids, st.sizes,
                          k, p_visit, p_max, qcap, exact=exact, gs=gs,
                          rt=rt, interpret=interpret)


def attach_ivf(index, verbose: bool = False,
               ti_cluster_num: Optional[int] = None,
               ti_segment_num: Optional[int] = None,
               visit: Optional[float] = None):
    """Build + attach the cluster-probe state (the clusterTI call site,
    demo_vaq.cpp:127). Explicit overrides avoid config mutation."""
    state = build_ivf(index, verbose=verbose, ti_cluster_num=ti_cluster_num,
                      ti_segment_num=ti_segment_num)
    index.ivf = IVFSearcher(
        state, index.config.visit if visit is None else visit)
    return index
