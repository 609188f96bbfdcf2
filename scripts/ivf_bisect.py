"""Per-stage timing bisection of the IVF probe path (VERDICT r2 #1 / r3 #4).

Fabricates probe_scan's inputs at the bench shapes (timing depends only on
shapes, not cluster quality) and times each stage with the chained-dependency
methodology from bench.py. Round-4 edition: f32 group-min kernel, int8 or
bf16 bucket rows (see vaq_tpu/ops/probe_pallas.py). Run inside a long-lived
REPL so kernel variants iterate without re-claiming the chip:

    import ivf_bisect as b; st = b.make_state(10_000_000); b.run(st)
    st8 = b.make_state(10_000_000, dtype="int8"); b.run(st8)

Stages:
  probe    cluster dists + dynamic probe + dispatch table + qsl gather
  kernel   the Pallas group-min scan alone
  merge    per-entry window gather + per-query top-m windows
  rescore  winner-window gs-row block gather + rescore + final top-k
  full     the whole probe_scan
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vaq_tpu.ivf import IVFSearcher, IVFState, probe_scan  # noqa: E402
from vaq_tpu.ops import probe as probe_ops  # noqa: E402
from vaq_tpu.ops import probe_pallas  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain(fn, dev_in, iters):
    """Chained timing: each iter's input depends on the previous scalar."""
    q = dev_in
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q)
        s = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                for o in jax.tree.leaves(out))
        q = dev_in + s.astype(dev_in.dtype) * 1e-30
    float(jnp.sum(q))
    return time.perf_counter() - t0


def t_ms(fn, dev_in, iters=8, reps=3):
    chain(fn, dev_in, 1)  # compile/warm
    t1 = min(chain(fn, dev_in, 1) for _ in range(reps))
    tn = min(chain(fn, dev_in, iters) for _ in range(reps))
    return (tn - t1) / (iters - 1) * 1000.0


class State:
    pass


def make_state(n=10_000_000, d=128, ncl=1000, nq=1024, k=10, visit=0.05,
               seed=0, dtype="int8", cap_factor=1.5):
    """Fabricated IVF buckets + queries at the bench shapes."""
    st = State()
    st.n, st.d, st.ncl, st.nq, st.k, st.visit = n, d, ncl, nq, k, visit
    st.dtype = dtype
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)

    cap = int(np.ceil(cap_factor * n / ncl))
    cap = -(-cap // 512) * 512
    st.cap = cap

    # db rows built chunkwise (bf16 reconstruction or int8-quantized)
    rows = []
    chunk = 2_000_000
    for i in range(0, n, chunk):
        kk_ = jax.random.fold_in(k1, i)
        blk = jax.random.normal(kk_, (min(chunk, n - i), d),
                                dtype=jnp.float32)
        if dtype == "int8":
            rows.append(jnp.clip(jnp.round(blk * 32.0), -127,
                                 127).astype(jnp.int8))
        else:
            rows.append(blk.astype(jnp.bfloat16))
    db_rows = jnp.concatenate(rows, axis=0)
    del rows
    if dtype == "int8":
        st.dim_scales = jnp.full((d,), 32.0, jnp.float32)
        db_norms = jnp.sum((db_rows.astype(jnp.float32) / 32.0) ** 2, axis=1)
    else:
        st.dim_scales = None
        db_norms = jnp.sum(db_rows.astype(jnp.float32) ** 2, axis=1)

    # random balanced-ish assignment -> bucket ids (host, vectorized)
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, ncl, size=n)
    bids = np.full((ncl, cap), -1, dtype=np.int32)
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    seg = np.searchsorted(sa, sa, side="left")
    rank = np.arange(n) - seg
    keep = rank < cap
    bids[sa[keep], rank[keep]] = order[keep].astype(np.int32)
    st.bucket_ids = jnp.asarray(bids)
    safe = jnp.maximum(st.bucket_ids, 0).reshape(-1)
    live = (st.bucket_ids >= 0)
    sentinel = jnp.int8(0) if dtype == "int8" else jnp.asarray(
        1e15, db_rows.dtype)
    st.bucket_rows = jnp.where(
        live[:, :, None], db_rows[safe].reshape(ncl, cap, d), sentinel)
    st.sizes = live.sum(axis=1).astype(jnp.int32)
    del db_rows, db_norms

    seg_dims = 64
    st.centroids = jax.random.normal(k2, (ncl, seg_dims), dtype=jnp.float32)
    st.qp = jax.random.normal(k3, (nq, d), dtype=jnp.float32)

    # static params exactly as IVFSearcher.params
    state = IVFState(centroids=np.zeros((ncl, seg_dims), np.float32),
                     seg_dims=seg_dims, cap=cap, bucket_rows=st.bucket_rows,
                     bucket_ids=st.bucket_ids,
                     sizes=st.sizes, dim_scales=st.dim_scales)
    st.p_visit, st.p_max, st.qcap, st.gs, st.rt = IVFSearcher(
        state, visit).params(k, nq)
    ng = cap // st.gs
    isz = st.bucket_rows.dtype.itemsize
    log(f"state: n={n} cap={cap} dtype={dtype} p_max={st.p_max} "
        f"qcap={st.qcap} gs={st.gs} rt={st.rt} "
        f"bucket HBM={ncl * cap * d * isz / 1e9:.2f} GB "
        f"mins out={ncl * ng * (-(-min(st.qcap, nq) // 128) * 128) * 4 / 1e9:.2f} GB")
    return st


# ---------- stage functions (jitted separately) ----------

@functools.partial(jax.jit, static_argnames=("k", "p_visit", "p_max", "qcap"))
def stage_probe(qp, centroids, sizes, dim_scales, k, p_visit, p_max, qcap):
    ncl = centroids.shape[0]
    cd = probe_ops.cluster_sq_dists(qp[:, : centroids.shape[1]], centroids)
    probe, active = probe_ops.dynamic_probe(cd, sizes, k, p_visit, p_max)
    table, ok, ent_c, ent_r = probe_ops.dispatch_table(probe, active, ncl,
                                                       qcap)
    q_eff = qp if dim_scales is None else qp / dim_scales[None, :]
    qp_pad = jnp.concatenate(
        [q_eff, jnp.zeros((1, qp.shape[1]), qp.dtype)], 0)
    qsl = (-2.0 * qp_pad)[table].astype(jnp.bfloat16)
    qcap_p = -(-qcap // 128) * 128
    if qcap_p != qcap:
        qsl = jnp.pad(qsl, ((0, 0), (0, qcap_p - qcap), (0, 0)))
    return qsl, probe, ok, ent_c, ent_r


@functools.partial(jax.jit, static_argnames=("nq", "k", "p_max", "gs",
                                             "qcap_p", "exact"))
def stage_merge(mins, probe, ok, ent_c, ent_r, nq, k, p_max, gs, qcap_p,
                exact):
    ncl, ng, _ = mins.shape
    flat = mins.transpose(0, 2, 1).reshape(ncl * qcap_p, ng)
    cand = jnp.where(ok[:, None], flat[ent_c * qcap_p + ent_r], jnp.inf)
    cand = cand.reshape(nq, p_max * ng)
    m = min(max(2 * k, 16), p_max * ng)
    if exact or p_max * ng < 1024:
        wd, pos = jax.lax.top_k(-cand, m)
    else:
        wd, pos = jax.lax.approx_max_k(-cand, m, recall_target=0.95)
        pos = pos.astype(jnp.int32)
    w_ok = jnp.isfinite(wd)
    clus = jnp.take_along_axis(probe, pos // ng, axis=1)
    wblk = clus * ng + pos % ng
    return wblk, w_ok


@functools.partial(jax.jit, static_argnames=("k", "gs"))
def stage_rescore(wblk, w_ok, qp, bucket_rows, bucket_ids,
                  dim_scales, k, gs):
    nq, m = wblk.shape
    ncl, cap, d = bucket_rows.shape
    ng = cap // gs
    q_eff = qp if dim_scales is None else qp / dim_scales[None, :]
    dim_w = (jnp.ones((d,), jnp.float32) if dim_scales is None
             else 1.0 / (dim_scales * dim_scales))
    blk_rows = bucket_rows.reshape(ncl * ng, gs, d)[wblk]
    blk_ids = bucket_ids.reshape(ncl * ng, gs)[wblk]
    inner = jnp.einsum("qd,qmgd->qmg", q_eff.astype(jnp.bfloat16),
                       blk_rows.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    brf = blk_rows.astype(jnp.float32)
    blk_norms = jnp.einsum("qmgd,d->qmg", brf * brf, dim_w)
    score = jnp.where(w_ok[:, :, None] & (blk_ids >= 0),
                      2.0 * inner - blk_norms, -jnp.inf)
    score = score.reshape(nq, m * gs)
    rows = blk_ids.reshape(nq, m * gs)
    qn = jnp.sum(qp * qp, axis=1)
    top_s, post = jax.lax.top_k(score, k)
    top_i = jnp.take_along_axis(rows, post, axis=1)
    d2 = jnp.maximum(qn[:, None] - top_s, 0.0)
    fin = jnp.isfinite(top_s)
    return jnp.where(fin, d2, jnp.inf), jnp.where(fin, top_i, -1)


def run(st, iters=8, exact=False, gs=None, rt=None):
    res = {}
    gs = gs or st.gs
    rt = rt or st.rt
    qcap = min(st.qcap, st.nq)
    qcap_p = -(-qcap // 128) * 128

    def probe_fn(q):
        return stage_probe(q, st.centroids, st.sizes, st.dim_scales, st.k,
                           st.p_visit, st.p_max, qcap)

    res["probe"] = t_ms(probe_fn, st.qp, iters)
    log(f"probe+dispatch+qsl: {res['probe']:.2f} ms")

    qsl, probe, ok, ent_c, ent_r = jax.block_until_ready(probe_fn(st.qp))
    flat_rows = st.bucket_rows.reshape(st.ncl * st.cap, st.d)
    dim_w = (jnp.ones((st.d,), jnp.float32) if st.dim_scales is None
             else 1.0 / (st.dim_scales * st.dim_scales))

    def kernel_fn(q):
        eps = (jnp.sum(q) * 1e-30).astype(jnp.bfloat16)
        return probe_pallas.groupmin_window_scan(
            qsl + eps, flat_rows, dim_w, st.ncl, st.cap, gs=gs,
            rt=rt)

    res["kernel"] = t_ms(kernel_fn, st.qp, iters)
    log(f"pallas groupmin kernel: {res['kernel']:.2f} ms")

    mins = jax.block_until_ready(kernel_fn(st.qp))

    def merge_fn(q):
        eps = (jnp.sum(q) * 0).astype(jnp.float32)
        return stage_merge(mins + eps, probe, ok, ent_c, ent_r, st.nq,
                           st.k, st.p_max, gs, qcap_p, exact)

    res["merge"] = t_ms(merge_fn, st.qp, iters)
    log(f"merge: {res['merge']:.2f} ms")

    wblk, w_ok = jax.block_until_ready(merge_fn(st.qp))

    def rescore_fn(q):
        return stage_rescore(wblk, w_ok, q, st.bucket_rows,
                             st.bucket_ids, st.dim_scales, st.k, gs)

    res["rescore"] = t_ms(rescore_fn, st.qp, iters)
    log(f"block rescore: {res['rescore']:.2f} ms")

    def full_fn(q):
        return probe_scan(q, st.centroids, st.bucket_rows,
                          st.bucket_ids, st.sizes, st.k, st.p_visit,
                          st.p_max, st.qcap, dim_scales=st.dim_scales,
                          exact=exact, gs=gs, rt=rt)

    res["full"] = t_ms(full_fn, st.qp, iters)
    ssum = res["probe"] + res["kernel"] + res["merge"] + res["rescore"]
    log(f"full probe_scan: {res['full']:.2f} ms  (sum of stages: {ssum:.2f})"
        f"  -> {st.nq / res['full'] * 1000:.0f} QPS")
    return res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dtype = sys.argv[2] if len(sys.argv) > 2 else "int8"
    st = make_state(n, dtype=dtype)
    run(st)
