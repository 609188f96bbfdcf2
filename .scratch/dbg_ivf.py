"""Bisect the IVF recall collapse stage by stage on the test fixture."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from vaq_tpu.data import make_sift_like
from vaq_tpu.config import parse_method_string
from vaq_tpu.ivf import attach_ivf, probe_scan
from vaq_tpu.vaq import VAQIndex
from vaq_tpu import metrics
from vaq_tpu.ops import probe as probe_ops
from vaq_tpu.ops import probe_pallas

base, queries, gt = make_sift_like(n=4000, n_queries=64, d=128, seed=42)
cfg = parse_method_string("VAQ128m16min7max8var1,TI32m16")
idx = VAQIndex(cfg).train(base).encode(base)
attach_ivf(idx)
idx.ivf.visit = 1.0
k = 50

st = idx.ivf.state
from vaq_tpu import pca
qp = pca.project(queries, idx.eigvecs, idx.total_dim)
p_visit, p_max, qcap, gs, rt = idx.ivf.params(k, qp.shape[0])
print("params:", p_visit, p_max, qcap, gs, rt, "cap", st.cap, "ncl", st.ncl)

idx._ensure_decoded()
dec = np.asarray(idx.decoded, dtype=np.float32)   # (n, D)
dn = np.asarray(idx.decoded_norms)
qpn = np.asarray(qp)

# decoded-space true top-k (the recall ceiling for this path)
d_exact = ((qpn**2).sum(1)[:, None] - 2 * qpn @ dec.T + dn[None, :])
gt_dec = np.argsort(d_exact, axis=1)[:, :k]

# run the real probe_scan
d_ivf, l_ivf = probe_scan(
    jnp.asarray(qp), jnp.asarray(st.centroids), st.bucket_rows,
    st.bucket_ids, st.sizes, idx.decoded, jnp.asarray(idx.decoded_norms),
    k, p_visit, p_max, qcap, exact=True, gs=gs, rt=rt, interpret=True)
l_ivf = np.asarray(l_ivf)
r_vs_dec = np.mean([len(set(l_ivf[i]) & set(gt_dec[i])) / k
                    for i in range(len(qpn))])
print("ivf recall vs decoded-exact:", r_vs_dec)

# ---- stage A: kernel group minima vs numpy recompute ----
nq = qpn.shape[0]
ncl, cap = st.bucket_ids.shape
ng = cap // gs
cd = probe_ops.cluster_sq_dists(qp[:, : st.centroids.shape[1]],
                                jnp.asarray(st.centroids))
wsizes = -(-st.sizes // gs)
probe, active = probe_ops.dynamic_probe(cd, st.sizes, k, p_visit, p_max,
                                        wsizes)
table, ok, ent_c, ent_r = probe_ops.dispatch_table(probe, active, ncl, qcap)
qp_pad = jnp.concatenate([qp, jnp.zeros((1, qp.shape[1]), qp.dtype)], axis=0)
qsl = qp_pad[table].astype(jnp.bfloat16)
qcap_p = -(-qcap // 128) * 128
if qcap_p != qcap:
    qsl = jnp.pad(qsl, ((0, 0), (0, qcap_p - qcap), (0, 0)))
packed = probe_pallas.groupmin_window_scan(
    qsl, st.bucket_rows.reshape(ncl * cap, -1), ncl, cap, gs=gs, rt=rt,
    interpret=True)
packed_np = np.asarray(packed)

# numpy recompute for cluster 0
rows_np = np.asarray(st.bucket_rows, dtype=np.float32)  # (ncl, cap, D)
qsl_np = np.asarray(qsl, dtype=np.float32)              # (ncl, qcap_p, D)
c = 0
xn = (rows_np[c]**2).sum(1)[:, None]
qn2 = (qsl_np[c]**2).sum(1)[None, :]
dist = xn - 2 * rows_np[c] @ qsl_np[c].T + qn2          # (cap, qcap_p)
dist = np.clip(dist, 0, probe_pallas.SENTINEL_DIST)
ai = dist.astype(np.float32).view(np.int32)
local = (np.arange(cap)[:, None] & (gs - 1)).astype(np.int32)
pk = (ai & ~(gs - 1)) | np.broadcast_to(local, ai.shape)
ref_min = pk.reshape(ng, gs, -1).min(axis=1)
got = packed_np[c]
mism = (ref_min != got)
print("stage A kernel-vs-numpy mismatch frac (cluster 0):", mism.mean())
if mism.any():
    i, j = np.argwhere(mism)[0]
    print("first mismatch at group", i, "slot", j,
          "ref", ref_min[i, j], "got", got[i, j],
          "ref_dist", ref_min[i, j] & ~(gs-1), "got_dist", got[i, j] & ~(gs-1))

# ---- stage B: merged candidate rows contain decoded-true top-k? ----
ok_np = np.asarray(ok).reshape(nq, p_max)
entc_np = np.asarray(ent_c).reshape(nq, p_max)
entr_np = np.asarray(ent_r).reshape(nq, p_max)
probe_np = np.asarray(probe)
bids = np.asarray(st.bucket_ids)
flat = packed_np.transpose(0, 2, 1).reshape(ncl * qcap_p, ng)
hits_window = []
m = min(max(2 * k, 16), p_max * ng)
hits_merge = []
for q in range(nq):
    cand = np.full((p_max, ng), 0x7F800000, np.int32)
    for s in range(p_max):
        if ok_np[q, s]:
            cand[s] = flat[entc_np[q, s] * qcap_p + entr_np[q, s]]
    candf = cand.view(np.float32).reshape(-1)
    # all candidate rows across windows
    all_rows = set()
    for s in range(p_max):
        if not ok_np[q, s]:
            continue
        cl = probe_np[q, s]
        for g in range(ng):
            loc = cand[s, g] & (gs - 1)
            r = bids[cl, g * gs + loc]
            if r >= 0 and (cand[s, g] & ~(gs - 1)) < 0x7F800000:
                all_rows.add(r)
    hits_window.append(len(all_rows & set(gt_dec[q])) / k)
    pos = np.argsort(candf, kind="stable")[:m]
    sel_rows = set()
    for p in pos:
        s, g = p // ng, p % ng
        cl = probe_np[q, s]
        loc = cand[s, g] & (gs - 1)
        r = bids[cl, g * gs + loc]
        if r >= 0:
            sel_rows.add(r)
    hits_merge.append(len(sel_rows & set(gt_dec[q])) / k)
print("stage B: frac of decoded-true topk present as some window argmin:",
      np.mean(hits_window))
print("stage B: frac present in top-m merged windows:", np.mean(hits_merge))
