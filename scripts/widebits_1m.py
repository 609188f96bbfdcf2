#!/usr/bin/env python
"""Paper wide-bits config on chip (VERDICT r4 #7).

Runs the SIFT1M Fig. 5 configuration — ``VAQ256m32min2max13var1`` with
hierarchical k-means (the reference's --kmeans-ver 1, VAQ.cpp:546-607) and
u16 codes (VAQ.cpp:663-726) — at 1M rows on the default platform, and
measures build time, decoded-tier QPS (chained methodology), recall@10, and
refined recall. Also gates the u16 encode path on hardware: the exact
f32 LUT-gather scan over the u16 codes must agree with the decoded-tier
candidates (same ADC quantity, scan formulation independent).

Writes WIDEBITS_1M.json at the repo root.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--config", default="VAQ256m32min2max13var1,HEAP")
    args = p.parse_args()

    from vaq_tpu.cli import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.ops import scan_jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import measure_qps

    log(f"devices: {jax.devices()}")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".bench_cache")
    with np.load(os.path.join(cache_dir,
                              "data_n1000000_d128_q1024.npz")) as z:
        base, queries = z["base"][: args.n], z["queries"][: args.queries]
    gt_path = os.path.join(cache_dir,
                           f"wb_gt_n{args.n}_q{args.queries}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        from vaq_tpu.ops.distances import exact_search
        _, gt = exact_search(jnp.asarray(queries), jnp.asarray(base), 100)
        gt = np.asarray(gt)
        np.save(gt_path, gt)

    cfg = dataclasses.replace(vaq_tpu.parse_method_string(args.config),
                              hierarchical_kmeans=True)
    t0 = time.perf_counter()
    idx = vaq_tpu.VAQIndex(cfg).build(base, verbose=True)
    build_s = time.perf_counter() - t0
    log(f"build: {build_s:.0f}s  bits={np.asarray(idx.bits).tolist()}")
    assert int(idx.bits.max()) > 8, "config must exercise the u16 path"
    assert idx.codes.dtype == jnp.uint16, idx.codes.dtype

    k = args.k
    d, lab = idx.search(queries, 100)
    rec10 = metrics.avg_recall(lab[:, :k], gt, k)
    rec100 = metrics.avg_recall(lab, gt, 100)
    _, refined = idx.refine(queries, lab, base, k)
    rec_ref = metrics.avg_recall(refined, gt, k)
    log(f"recall@10={rec10:.4f} recall@100={rec100:.4f} "
        f"refined(100->10)={rec_ref:.4f}")

    qb = jnp.asarray(queries)
    qps, ms = measure_qps(lambda q: idx.search_device(q, k),
                          qb, qb.shape[0], args.iters)
    log(f"decoded QPS={qps:.1f} ({ms:.3f} ms/batch)")

    # u16 hardware gate: exact f32 LUT-gather scan over the u16 codes must
    # agree with the decoded scan (identical ADC quantity) on a data slice.
    from vaq_tpu import pca
    ns = min(131072, args.n)
    qs = queries[:128]
    qp = pca.project(jnp.asarray(qs), idx.eigvecs, idx.total_dim)
    luts = scan_jax.build_luts(qp, jnp.asarray(idx.centroids))
    codes_slice = jnp.asarray(idx.codes[:, :ns]).T
    d_l, l_l = scan_jax.adc_scan_topk(codes_slice, luts, k)
    dec_slice = idx.decoded[:ns] if idx.decoded is not None else None
    if dec_slice is None:
        idx._ensure_decoded()
        dec_slice = idx.decoded[:ns]
    from vaq_tpu.ops import scan_decoded
    d_d, l_d = scan_decoded.decoded_scan_topk(
        dec_slice, idx.decoded_norms[:ns], qp, k, exact=True)
    l_l, l_d = np.asarray(l_l), np.asarray(l_d)
    agree = np.mean([len(set(l_l[i]) & set(l_d[i])) / k
                     for i in range(l_l.shape[0])])
    log(f"u16 gate: LUT-gather vs decoded top-{k} overlap = {agree:.4f}")

    out = {"metric": f"wide-bits (min2max13/u16) decoded QPS at {args.n}",
           "value": round(qps, 1), "unit": "qps", "vs_baseline": 1.0,
           "config": args.config, "hierarchical_kmeans": True,
           "n": args.n, "build_s": round(build_s, 1),
           "bits_max": int(idx.bits.max()),
           "bits": np.asarray(idx.bits).tolist(),
           "codes_dtype": str(np.asarray(idx.codes[:1, :1]).dtype),
           "widebits_qps": round(qps, 1),
           "batch_ms": round(ms, 3),
           "widebits_recall_at_k": round(rec10, 4),
           "recall_at_100": round(rec100, 4),
           "recall_at_10_refined": round(rec_ref, 4),
           "u16_gate_overlap": round(float(agree), 4)}
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "WIDEBITS_1M.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
