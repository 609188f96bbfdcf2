#!/usr/bin/env python
"""Honest 1M recall measurement on CPU (r5).

Recall is platform-independent now that f32 matmuls are f32 everywhere
(the r5 precision correction) — so the headline recall figures can be
pinned without the chip: build the bench's 1M index on CPU, compute exact
groundtruth, and measure decoded recall@10/@100 + refined(100→10).

Writes scripts/cpu_recall_1m.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.ops.distances import exact_search_host_stream

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".bench_cache", "data_n1000000_d128_q1024.npz")
    with np.load(cache) as z:
        base, queries = z["base"], z["queries"]
    cfg = vaq_tpu.parse_method_string("VAQ256m32min7max8var1,HEAP")

    t0 = time.perf_counter()
    idx = vaq_tpu.VAQIndex(cfg).build(base, verbose=True)
    log(f"build: {time.perf_counter() - t0:.0f}s")

    gt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", ".bench_cache", "cpu_gt_1m_q1024.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        t0 = time.perf_counter()
        _, gt = exact_search_host_stream(queries, base, 100,
                                         chunk_rows=250_000)
        np.save(gt_path, gt)
        log(f"groundtruth: {time.perf_counter() - t0:.0f}s")

    t0 = time.perf_counter()
    d, labels = idx.search(queries, 100, query_batch=256)
    log(f"search: {time.perf_counter() - t0:.0f}s")
    r10 = metrics.avg_recall(labels[:, :10], gt, 10)
    r100 = metrics.avg_recall(labels, gt, 100)
    _, refined = idx.refine(queries, labels, base, 10)
    r10r = metrics.avg_recall(refined, gt, 10)

    out = {"n": 1_000_000, "config": "VAQ256m32min7max8var1,HEAP",
           "platform": "cpu (exact-precision parity with r5 TPU)",
           "recall_at_10": round(float(r10), 4),
           "recall_at_100": round(float(r100), 4),
           "recall_at_10_refined": round(float(r10r), 4),
           "r4_values_vs_corrupt_gt": {"recall_at_10": 0.3195,
                                       "recall_at_100": 0.3944,
                                       "recall_at_10_refined": 0.7252}}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cpu_recall_1m.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
