"""Benchmark driver: SIFT1M-scale ADC search QPS/chip at measured recall.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...,
   "recall_at_10": ..., ...}

Setup mirrors the reference's headline configuration (SIFT1M ADC,
``ExperimentsParameters.txt:51-55`` / BASELINE.md): 1M × 128-d vectors,
256-bit budget over 32 subspaces. The reference repo publishes no measured
numbers (BASELINE.json "published": {}), so ``vs_baseline`` is the ratio
against the measured reference C++ throughput when available in
``baseline_measured.json``, else 1.0.

All progress goes to stderr; stdout carries exactly the one JSON line.
The built index is cached under .bench_cache/ so repeat runs skip training.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--config", default="VAQ256m32min7max8var1,HEAP")
    p.add_argument("--batch", type=int, default=1024,
                   help="query batch size for the timed runs")
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--no-secondary", action="store_true",
                   help="skip decoded8/hamming measurements (HBM budget at "
                        "10M+ rows)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.data import make_anisotropic_gaussian
    from vaq_tpu.ops.distances import (exact_search,
                                       exact_search_host_stream)

    log(f"devices: {jax.devices()}")

    rng_tag = f"n{args.n}_d{args.d}_{args.config.replace(',', '_')}"
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, rng_tag + ".npz")

    t0 = time.perf_counter()
    data_cache = os.path.join(cache_dir, f"data_n{args.n}_d{args.d}"
                                         f"_q{args.queries}.npz")
    if os.path.exists(data_cache) and not args.no_cache:
        with np.load(data_cache) as z:
            base, queries = z["base"], z["queries"]
        log(f"data loaded from cache: {time.perf_counter() - t0:.1f}s")
    else:
        base, queries = make_anisotropic_gaussian(
            args.n, args.d, args.queries, seed=42)
        if args.n >= 5_000_000:  # cache only when regen is expensive
            np.savez(data_cache, base=base, queries=queries)
        log(f"data gen: {time.perf_counter() - t0:.1f}s")

    cfg = vaq_tpu.parse_method_string(args.config)
    build_s = None
    if os.path.exists(cache) and not args.no_cache:
        idx = vaq_tpu.VAQIndex.load(cache)
        log(f"loaded cached index {cache}")
    else:
        t0 = time.perf_counter()
        idx = vaq_tpu.VAQIndex(cfg).build(base, verbose=True)
        build_s = time.perf_counter() - t0
        log(f"build: {build_s:.1f}s")
        idx.save(cache)

    # Groundtruth on the TPU (exact search over the full base), cached.
    gt_cache = os.path.join(cache_dir, rng_tag + f"_gt{args.queries}.npy")
    t0 = time.perf_counter()
    if os.path.exists(gt_cache) and not args.no_cache:
        gt = np.load(gt_cache)
        log(f"groundtruth loaded from cache")
    else:
        if args.n > 4_000_000:   # keep device memory O(chunk) at scale
            _, gt = exact_search_host_stream(queries, base, 100)
        else:
            gt_d, gt = exact_search(jnp.asarray(queries), jnp.asarray(base),
                                    100)
            gt = np.asarray(gt)
        np.save(gt_cache, gt)
        log(f"groundtruth: {time.perf_counter() - t0:.1f}s")

    # Recall measurement (full query set, one pass) + refined recall
    # (refine 100 → 10, the reference's Fig.10-style configuration).
    d, labels = idx.search(queries, 100, query_batch=args.batch)
    recall10 = metrics.avg_recall(labels[:, :10], gt, args.k)
    recall100 = metrics.avg_recall(labels, gt, 100)
    _, refined = idx.refine(queries, labels, base, 10)
    recall10_refined = metrics.avg_recall(refined, gt, 10)
    log(f"recall@10={recall10:.4f} recall@100={recall100:.4f} "
        f"refined@10={recall10_refined:.4f}")

    # Timed steady-state QPS, chained methodology: each iteration's query
    # batch depends on the previous result so the device cannot reorder or
    # elide work, and a single tiny scalar fetch at the end drains the chain.
    # (block_until_ready is unreliable through this harness's device tunnel,
    # and per-iteration fetches add ~30 ms tunnel latency that is not chip
    # time.) Marginal cost = (T(iters) - T(1)) / (iters - 1).
    qb_dev = jnp.asarray(queries[: args.batch])

    def chain(iters):
        q = qb_dev
        t0 = time.perf_counter()
        for _ in range(iters):
            dd, ii = idx.search_device(q, args.k)
            s = (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
            q = qb_dev + s * 1e-30
        float(jnp.sum(q))  # one tiny fetch drains everything
        return time.perf_counter() - t0

    chain(1)  # warm/compile
    t1 = min(chain(1) for _ in range(3))
    tn = min(chain(args.iters) for _ in range(3))
    batch_ms = (tn - t1) / (args.iters - 1) * 1000.0
    qps = args.batch / (batch_ms / 1000.0)
    log(f"QPS={qps:.1f}  batch latency={batch_ms:.3f}ms (chained marginal)")

    # Secondary backends at the same scale.
    def chain_generic(step_fn, iters):
        q = qb_dev
        t0 = time.perf_counter()
        for _ in range(iters):
            dd, ii = step_fn(q)
            s = (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
            q = qb_dev + s * 1e-30
        float(jnp.sum(q))
        return time.perf_counter() - t0

    def measure(step_fn, iters):
        chain_generic(step_fn, 1)
        t1 = min(chain_generic(step_fn, 1) for _ in range(3))
        tn = min(chain_generic(step_fn, iters) for _ in range(3))
        ms = (tn - t1) / (iters - 1) * 1000.0
        return args.batch / (ms / 1000.0), ms

    qps8 = ms8 = qps_h = ms_h = None
    if not args.no_secondary:
        qps8, ms8 = measure(
            lambda q: idx.search_device(q, args.k, backend="decoded8"),
            args.iters)
        log(f"decoded8 QPS={qps8:.1f} ({ms8:.3f}ms/batch)")

        from vaq_tpu.binary import BinaryIndex
        bidx = BinaryIndex(bit_budget=256).train(
            base[: min(args.n, 200000)]).encode(base)
        b01, bpop = bidx.db01, bidx.db_pop
        from vaq_tpu.binary import hamming_topk_matmul, unpack_bits_01
        qpk = jnp.asarray(unpack_bits_01(bidx.encode_queries(
            queries[: args.batch]), bidx.total_bits))

        def ham_step(q):
            # thread the chain dependency through the packed queries (eps is
            # 0 at runtime but the compiler cannot prove it)
            eps = (jnp.sum(q) * 1e-30).astype(jnp.int8)
            return hamming_topk_matmul(b01, bpop, qpk + eps, args.k)

        qps_h, ms_h = measure(ham_step, args.iters)
        log(f"hamming QPS={qps_h:.1f} ({ms_h:.3f}ms/batch)")

    vs_baseline = 1.0
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "baseline_measured.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            bl = json.load(f)
        ref_qps = bl.get("reference_qps")
        if ref_qps:
            vs_baseline = qps / ref_qps

    out = {
        "metric": "ADC search QPS/chip (1M x 128d, 256-bit VAQ)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(vs_baseline, 3),
        "recall_at_10": round(recall10, 4),
        "recall_at_100": round(recall100, 4),
        "recall_at_10_refined": round(recall10_refined, 4),
        "batch_latency_ms": round(batch_ms, 3),
        "n": args.n,
        "config": args.config,
    }
    if qps8 is not None:
        out["decoded8_qps"] = round(qps8, 1)
        out["hamming_qps"] = round(qps_h, 1)
    if build_s is not None:
        out["build_s"] = round(build_s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
