"""IVF-style cluster probing — the TPU analog of triangle-inequality pruning.

The reference's TI path (``VAQ::clusterTI`` VAQ.cpp:878-999 +
``searchTriangleInequality`` VAQ.cpp:1540-1692) builds k-means clusters in
*reconstructed code space* over the first ``ti_segment_num`` subspaces,
sorts each cluster's members by distance-to-centroid, and at query time
visits the ``visit`` fraction of nearest clusters, breaking out of a cluster
as soon as the triangle inequality proves the remaining (sorted) members
can't beat the current k-th best.

Per-row branchy early exits don't vectorize on TPU (SURVEY §2.1 V13), but
the *cluster-visit budget* does: we keep the same build (k-means over the
decoded prefix dims, same assignment), group rows into fixed-capacity
buckets, and per query scan exactly the top-p nearest clusters
(p = ceil(visit · n_clusters)) — a static-shape gather + scan + top-k. The
`visit` knob trades recall for scanned rows exactly as in the reference;
the TI per-row break is replaced by simply not scanning non-probed clusters.

Note on economics: on TPU the exhaustive fused scan is so matmul-friendly
that probing only wins for very large databases or strict latency targets;
it is kept for behavior parity and for the capacity regime (SURVEY §7
phase 5: "exhaustive scan is the speed-of-light path").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaq_tpu import kmeans


@dataclasses.dataclass
class IVFState:
    """Bucketed decoded database grouped by cluster."""

    centroids: np.ndarray        # (ncl, seg_dims) f32 cluster centroids
    seg_dims: int                # prefix dims used for cluster distances
    cap: int                     # rows per bucket (padded)
    # Device arrays:
    bucket_rows: jnp.ndarray     # (ncl*cap, D) bf16 decoded rows
    bucket_norms: jnp.ndarray    # (ncl*cap,) f32 (+inf padding)
    bucket_ids: jnp.ndarray      # (ncl*cap,) i32 (-1 padding)

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


def build_ivf(index, verbose: bool = False) -> IVFState:
    """Cluster the decoded database and group rows into padded buckets.

    Mirrors clusterTI(useKMeans=True): k-means in decoded (reconstructed)
    space over the prefix subspaces, assignment by nearest centroid, rows
    regrouped by cluster (the member sort by distance-to-centroid powers the
    reference's per-row break and is unnecessary here).
    """
    cfg = index.config
    index._ensure_decoded()
    decoded = np.asarray(index.decoded, dtype=np.float32)
    norms = np.asarray(index.decoded_norms)
    n, d_full = decoded.shape
    seg_subs = resolve_seg_num(cfg, index.cum_var_per_subs, index.highest_subs)
    seg_subs = min(seg_subs, index.highest_subs)
    seg_dims = seg_subs * index.subs_len
    ncl = int(cfg.ti_cluster_num)
    if ncl <= 0:
        raise ValueError("ti_cluster_num must be set for the TI/IVF method")

    prefix = decoded[:, :seg_dims]
    cents, assign = kmeans.fit(prefix, ncl, iters=cfg.kmeans_iters,
                               seed=cfg.seed)

    sizes = np.bincount(assign, minlength=ncl)
    cap = int(sizes.max())
    if verbose:
        print(f"== ivf: {ncl} clusters, seg_dims={seg_dims}, "
              f"sizes min/mean/max = {sizes.min()}/{sizes.mean():.0f}/{cap}")

    rows = np.zeros((ncl * cap, d_full), dtype=np.float32)
    bnorms = np.full(ncl * cap, np.inf, dtype=np.float32)
    bids = np.full(ncl * cap, -1, dtype=np.int32)
    order = np.argsort(assign, kind="stable")
    start = 0
    for c in range(ncl):
        members = order[start:start + sizes[c]]
        start += sizes[c]
        rows[c * cap: c * cap + len(members)] = decoded[members]
        bnorms[c * cap: c * cap + len(members)] = norms[members]
        bids[c * cap: c * cap + len(members)] = members

    return IVFState(
        centroids=cents,
        seg_dims=seg_dims,
        cap=cap,
        bucket_rows=jnp.asarray(rows).astype(jnp.bfloat16),
        bucket_norms=jnp.asarray(bnorms),
        bucket_ids=jnp.asarray(bids),
    )


@functools.partial(jax.jit, static_argnames=("k", "p", "cap", "query_chunk"))
def _probe_scan(
    qp: jnp.ndarray,           # (nq, D) projected queries
    centroids: jnp.ndarray,    # (ncl, seg_dims)
    bucket_rows: jnp.ndarray,  # (ncl*cap, D) bf16
    bucket_norms: jnp.ndarray,
    bucket_ids: jnp.ndarray,
    k: int,
    p: int,
    cap: int,
    query_chunk: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    nq, d_full = qp.shape
    seg_dims = centroids.shape[1]

    # Query→cluster distances on the prefix dims (VAQ.cpp:799-827; the
    # reference sqrt's them, which cannot change the top-p order).
    qseg = qp[:, :seg_dims]
    cd = (jnp.sum(qseg * qseg, axis=1, keepdims=True)
          - 2.0 * jnp.dot(qseg, centroids.T,
                          preferred_element_type=jnp.float32)
          + jnp.sum(centroids * centroids, axis=1)[None, :])
    _, probe = jax.lax.top_k(-cd, p)                      # (nq, p)

    pad_q = (-nq) % query_chunk
    qp_p = jnp.pad(qp, ((0, pad_q), (0, 0)))
    probe_p = jnp.pad(probe, ((0, pad_q), (0, 0)))
    qchunks = qp_p.reshape(-1, query_chunk, d_full)
    pchunks = probe_p.reshape(-1, query_chunk, p)

    def per_chunk(args):
        qc, pc = args                                     # (Qc, D), (Qc, p)

        def per_query(q, clusters):
            def gather_cluster(c):
                rows = jax.lax.dynamic_slice(
                    bucket_rows, (c * cap, 0), (cap, d_full))
                norms_c = jax.lax.dynamic_slice(bucket_norms, (c * cap,),
                                                (cap,))
                ids_c = jax.lax.dynamic_slice(bucket_ids, (c * cap,), (cap,))
                score = (2.0 * jnp.dot(rows, q.astype(jnp.bfloat16),
                                       preferred_element_type=jnp.float32)
                         - norms_c)
                return score, ids_c

            scores, ids = jax.lax.map(gather_cluster, clusters)  # (p, cap)
            scores = scores.reshape(-1)
            ids = ids.reshape(-1)
            kk = min(k, scores.shape[0])
            top_s, pos = jax.lax.top_k(scores, kk)
            top_i = ids[pos]
            if kk < k:
                top_s = jnp.pad(top_s, (0, k - kk),
                                constant_values=-jnp.inf)
                top_i = jnp.pad(top_i, (0, k - kk), constant_values=-1)
            qn = jnp.sum(q * q)
            d2 = jnp.maximum(qn - top_s, 0.0)
            return jnp.where(top_i >= 0, d2, jnp.inf), top_i

        return jax.vmap(per_query)(qc, pc)

    d_all, i_all = jax.lax.map(per_chunk, (qchunks, pchunks))
    d_all = d_all.reshape(-1, k)[:nq]
    i_all = i_all.reshape(-1, k)[:nq]
    return d_all, i_all


class IVFSearcher:
    """Adapter giving `VAQIndex.search` its TI/IVF path (index.ivf)."""

    def __init__(self, state: IVFState, visit: float):
        self.state = state
        self.visit = float(visit)

    def probes(self, k: int) -> int:
        st = self.state
        p = max(1, int(np.ceil(self.visit * st.ncl)))
        # Visit enough clusters that k results are possible (the reference
        # keeps visiting until ≥ k members, VAQ.cpp:1548-1551).
        while p * st.cap < k and p < st.ncl:
            p += 1
        return min(p, st.ncl)

    def search(self, index, qp: jnp.ndarray, luts, k: int):
        st = self.state
        return _probe_scan(qp, jnp.asarray(st.centroids), st.bucket_rows,
                           st.bucket_norms, st.bucket_ids, k,
                           self.probes(k), st.cap)


def attach_ivf(index, verbose: bool = False):
    """Build + attach the cluster-probe state (the clusterTI call site,
    demo_vaq.cpp:127)."""
    state = build_ivf(index, verbose=verbose)
    index.ivf = IVFSearcher(state, index.config.visit)
    return index
