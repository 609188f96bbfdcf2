#!/usr/bin/env python
"""100M-row capacity experiment (VERDICT r1 #5; reference Fig. 11 configs,
ExperimentsParameters.txt:114-124: DEEP-100M, 256 bits, 32 segments).

Runs a DEEP-like synthetic dataset (default 100M × 96d) through the standard
build (train on samples → streamed encode), serves from the two capacity
tiers that fit one v5e chip's 16 GB HBM at this scale:

  * codes + Pallas decode-then-dot scan (32 B/row → 3.2 GB resident)
  * decoded8 (int8 reconstruction, 96 B/row → 9.6 GB resident)

and reports build time, per-tier QPS (chained methodology), recall@10, and
refined recall against streamed exact groundtruth. Emits one JSON line and
writes CAPACITY_100M.json at the repo root.

Data source (--source):
  * device (default): chunks generated on-device (data.DeviceChunkSource);
    chunk i is a pure function of (seed, i), so encode / groundtruth /
    refine each stream regenerated chunks with O(chunk) transients and the
    38 GB raw dataset never exists anywhere. This host moves memory at
    O(10 MB/s), so the disk path below is hours of pure datagen/IO at 100M.
  * disk: the original memmap path (gen_memmap + streamed reads), kept for
    hosts with real IO and as the reference-format interop path.

HBM budget at n=100M, d=96, 256-bit codes (documented for BASELINE.md).
Both database arrays are stored TRANSPOSED so the TPU (32, 128) 8-bit tile
packs them exactly — row-major storage lane-pads (n, 32) u8 codes 4× (to
11.9 GB) and (n, 96) int8 1.33× (to 12.8 GB), which is what OOMed the first
100M attempt:
  codes u8 (32 × n)                    3.2 GB
  decoded8 int8 (96 × n) + norms f32   9.6 + 0.4 GB
  query workspace (128-batch scores)   ~0.5 GB peak
  → decoded8 + codes tiers co-resident ≈ 13.2 GB; the bf16 decoded tier
    (19.2 GB) does NOT fit and is skipped. decode_db_int8 runs with a
    block_rows that divides n so no padded-copy transient appears.

Usage: python scripts/capacity_100m.py [--n 100000000] [--d 96]
       [--queries 128] [--chunk 2000000] [--source device|disk]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_memmap(path, n, d, seed=42, chunk=4_000_000):
    """DEEP-like anisotropic gaussian streamed to a disk memmap."""
    from vaq_tpu.data import make_anisotropic_gaussian

    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, d))
    queries = None
    for start in range(0, n, chunk):
        rows = min(chunk, n - start)
        base, q = make_anisotropic_gaussian(rows, d, 128,
                                            seed=seed + start // chunk)
        mm[start:start + rows] = base
        if queries is None:
            queries = q
        log(f"gen {start + rows}/{n}")
    mm.flush()
    return queries


def divisor_block(n: int, target: int = 65536) -> int:
    """Largest block_rows ≤ target that divides n (avoids the padded-copy
    transient in decode_db_int8 — 9.6 GB at 100M would tip HBM over)."""
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000_000)
    p.add_argument("--d", type=int, default=96)
    # 1024-query batches: the decode-then-dot tier reconstructs every cell
    # once per CALL, so throughput is batch-amortized (its use case is bulk
    # serving); decoded8 is batch-insensitive.
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=2_000_000)
    p.add_argument("--source", choices=["device", "disk"], default="device")
    # max8 (not the reference's max12/13) so the codes tier stays u8/32 B-row
    # resident — the whole point of this experiment; 256b/m32 then allocates
    # uniformly (8 bits each), i.e. the classic PQ32x8 DEEP-100M operating
    # point.
    p.add_argument("--config", default="VAQ256m32min5max8var1,HEAP")
    p.add_argument("--workdir", default="/root/capacity100m")
    p.add_argument("--train-sample", type=int, default=262_144)
    p.add_argument("--save-index", action="store_true",
                   help="persist the index npz (multi-GB fetch at 100M)")
    p.add_argument("--only-ivf", action="store_true",
                   help="run ONLY the IVF probe section in this process "
                        "(requires a prior --save-index run; a fresh "
                        "process gives the ~13 GB bucket upload an "
                        "unfragmented HBM pool — the full flow's earlier "
                        "tier benches fragment it and the upload OOMs). "
                        "Merges its fields into CAPACITY_100M.json.")
    args = p.parse_args()

    from vaq_tpu.cli import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.data import DeviceChunkSource
    from vaq_tpu.ops.distances import (exact_rescore_chunked,
                                       exact_search_chunked)

    os.makedirs(args.workdir, exist_ok=True)
    cfg = vaq_tpu.parse_method_string(args.config)

    # ------------------------------------------------------------------
    # Data source: chunk_fn(i) -> (rows_i, d) f32
    # ------------------------------------------------------------------
    t_src = time.perf_counter()
    if args.source == "device":
        src = DeviceChunkSource(args.n, args.d, args.chunk)
        chunk_fn = src.chunk
        q_cache = os.path.join(args.workdir,
                               f"queries_{args.n}_{args.queries}.npy")
        if os.path.exists(q_cache):
            # cached: keeps the --only-ivf retry path free of ANY device
            # work before the ~13 GB bucket upload (this backend frees
            # transients lazily; even one 0.8 GB chunk-gen next to the
            # upload has tipped HBM over)
            queries = np.load(q_cache)
        else:
            queries = src.queries(args.queries)
            np.save(q_cache, queries)
        train_sample = None  # loaded lazily only when building
        log(f"device source ready: {time.perf_counter() - t_src:.0f}s "
            f"({src.n_chunks} chunks)")
    else:
        data_path = os.path.join(args.workdir,
                                 f"base_{args.n}x{args.d}.f32")
        q_path = os.path.join(args.workdir, "queries.npy")
        if os.path.exists(data_path) and os.path.exists(q_path):
            queries = np.load(q_path)[: args.queries]
            log("dataset cached")
        else:
            queries = gen_memmap(data_path, args.n, args.d,
                                 chunk=args.chunk)[: args.queries]
            np.save(q_path, queries)
            log(f"datagen: {time.perf_counter() - t_src:.0f}s")
        base = np.memmap(data_path, dtype=np.float32, mode="r",
                         shape=(args.n, args.d))

        def chunk_fn(i):
            return np.asarray(base[i * args.chunk:(i + 1) * args.chunk])

        step = max(1, args.n // args.train_sample)
        train_sample = np.asarray(base[::step][: args.train_sample])

    # ------------------------------------------------------------------
    # Build: train on the sample, stream-encode all chunks
    # ------------------------------------------------------------------
    idx_path = os.path.join(args.workdir, f"index_{args.n}.npz")
    stage_path = os.path.join(args.workdir, f"ivf_stage_{args.n}.npz")
    if os.path.exists(idx_path):
        # probe-only + cached staging never needs the codes on device
        with_codes = not (args.only_ivf and os.path.exists(stage_path))
        idx = vaq_tpu.VAQIndex.load(idx_path, with_codes=with_codes)
        log(f"index cached (codes {'loaded' if with_codes else 'skipped'})")
        build_s = None
    else:
        t0 = time.perf_counter()
        if train_sample is None:
            train_sample = src.host_sample(args.train_sample)
        idx = vaq_tpu.VAQIndex(cfg).train(train_sample, verbose=True)
        idx.encode_chunks(chunk_fn, args.n, args.chunk, verbose=True)
        build_s = time.perf_counter() - t0
        log(f"build: {build_s:.0f}s")
        if args.save_index:
            idx.save(idx_path)

    # ------------------------------------------------------------------
    # Groundtruth (streamed exact scan; cached — tiny file)
    # ------------------------------------------------------------------
    gt_path = os.path.join(args.workdir,
                           f"gt_{args.n}_{args.queries}_{args.source}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        t0 = time.perf_counter()
        _, gt = exact_search_chunked(queries, chunk_fn, args.n, args.chunk,
                                     100)
        np.save(gt_path, gt)
        log(f"groundtruth: {time.perf_counter() - t0:.0f}s")

    qb = jnp.asarray(queries[: args.batch])

    def chain(step, iters):
        q = qb
        t0 = time.perf_counter()
        for _ in range(iters):
            dd, ii = step(q)
            s = (jnp.sum(dd.astype(jnp.float32)) + jnp.sum(ii)).astype(
                jnp.float32)
            q = qb + s * 1e-30
        float(jnp.sum(q))
        return time.perf_counter() - t0

    n_batch = int(qb.shape[0])  # honest divisor: qb may hold fewer rows
    #                             than --batch when --queries is smaller

    def measure(step, iters=8):
        chain(step, 1)
        t1 = min(chain(step, 1) for _ in range(2))
        tn = min(chain(step, iters) for _ in range(2))
        ms = (tn - t1) / (iters - 1) * 1000.0
        return n_batch / (ms / 1000.0), ms

    cap_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "CAPACITY_100M.json")
    out = {"metric": f"capacity tiers at {args.n} x {args.d}d",
           "n": args.n, "d": args.d, "config": args.config,
           "source": args.source, "unit": "qps"}
    if args.only_ivf:
        # merge into the existing artifact so the final JSON is complete
        if os.path.exists(cap_json):
            with open(cap_json) as f:
                out = json.load(f)
            out.pop("ivf_error", None)
    if build_s is not None:
        out["build_s"] = round(build_s, 1)

    # --- codes tier first (decode-then-dot Pallas kernel, 32 B/row; benched
    # before decoded8 exists so its workspace has headroom) ---
    def lut_step(q):
        return idx.search_device(q, args.k, backend="codes")

    if args.only_ivf:
        lut_qps = None  # tiers measured by the main run
    else:
        lut_qps, lut_ms = measure(lut_step, iters=4)
    if not args.only_ivf:
        dl, ll = lut_step(jnp.asarray(queries))
        recl = metrics.avg_recall(np.asarray(ll), gt, args.k)
        log(f"codes tier: {lut_qps:.1f} QPS ({lut_ms:.1f}ms/batch) "
            f"recall@{args.k}={recl:.4f}")
        out["lut_qps"] = round(lut_qps, 1)
        out["lut_recall_at_k"] = round(recl, 4)

        # --- decoded8 tier (96 B/row int8 matmul scan) ---
        t0 = time.perf_counter()
        idx._ensure_decoded8(block_rows=divisor_block(args.n))
        log(f"decoded8 materialize: {time.perf_counter() - t0:.0f}s")
        d8_qps, d8_ms = measure(
            lambda q: idx.search_device(q, args.k, backend="decoded8"))
        _, l8 = idx.search_device(jnp.asarray(queries), args.k,
                                  backend="decoded8")
        rec8 = metrics.avg_recall(np.asarray(l8), gt, args.k)
        log(f"decoded8: {d8_qps:.0f} QPS ({d8_ms:.1f}ms/batch) "
            f"recall@{args.k}={rec8:.4f}")
        out["decoded8_qps"] = round(d8_qps, 1)
        out["decoded8_recall_at_k"] = round(rec8, 4)

        # --- refined recall (decoded8 candidates -> exact rerank R -> k),
        # the reference's Fig. 11 refine sweep (refine 100-500,
        # ExperimentsParameters.txt:114-124) ---
        for r_depth in (100, 500):
            _, cand = idx.search_device(jnp.asarray(queries), r_depth,
                                        backend="decoded8")
            _, refined = exact_rescore_chunked(queries, np.asarray(cand),
                                               chunk_fn, args.n, args.chunk,
                                               args.k)
            rec_ref = metrics.avg_recall(refined, gt, args.k)
            key = ("refined_recall_at_k" if r_depth == 100
                   else f"refined{r_depth}_recall_at_k")
            out[key] = round(rec_ref, 4)
            log(f"refined({r_depth}->{args.k}): {rec_ref:.4f}")

    # --- IVF cluster-probe tier (VERDICT r3 #5: the Fig. 11 visit sweep
    # 25/10/5% at 100M, ExperimentsParameters.txt:114-124). Streamed build:
    # host-staged int8 buckets (~13 GB HBM at d=96 incl 128-lane padding),
    # so the decoded8 tier AND the codes must be released first — after
    # this section the index serves only the probe tier. Guarded so a
    # failure here keeps the tiers measured above. ---
    try:
        from vaq_tpu import pca
        from vaq_tpu.ivf import IVFSearcher, build_ivf_streamed

        idx.decoded8 = idx.decoded8_scales = idx.decoded8_norms = None
        if args.only_ivf and os.path.exists(stage_path):
            # cached staging needs no codes at all — keep the device as
            # empty as possible before the ~13 GB bucket allocation
            idx.codes = None
        import gc
        gc.collect()
        t0 = time.perf_counter()
        state = build_ivf_streamed(
            idx, verbose=True, ti_cluster_num=1000, ti_segment_num=16,
            chunk_rows=args.chunk, free_codes_before_upload=True,
            balance_cap_factor=1.0,  # padding is pure HBM at this scale
            stage_cache=stage_path)
        out["ivf_build_s"] = round(time.perf_counter() - t0, 1)
        log(f"ivf streamed build: {out['ivf_build_s']}s "
            f"(cap={state.cap}, HBM={state.bucket_rows.nbytes / 1e9:.1f} GB"
            f" logical)")
        import jax
        log(f"live device bytes after upload: "
            f"{sum(a.nbytes for a in jax.live_arrays()) / 1e9:.2f} GB "
            f"(logical)")

        def retry_oom(fn, tries=10, wait=20):
            # The first allocation AFTER the ~10 GB bucket upload has OOMed
            # twice (r4 single-transfer AND r5 chunked+eager-delete): the
            # backend retires the upload's transfer buffers lazily. Backoff
            # probes whether the backlog drains; if it genuinely never
            # drains the last try re-raises for the section guard.
            for t in range(tries - 1):
                try:
                    return fn()
                except Exception as e:  # noqa: BLE001
                    if "RESOURCE_EXHAUSTED" not in repr(e):
                        raise
                    log(f"post-upload OOM, retry {t + 1}/{tries} "
                        f"in {wait}s")
                    gc.collect()
                    time.sleep(wait)
            return fn()

        qp_b = retry_oom(lambda: jax.block_until_ready(
            pca.project(qb, idx.eigvecs, idx.total_dim)))
        qp_all = pca.project(np.asarray(queries), idx.eigvecs,
                             idx.total_dim)
        sweep = []
        for visit in (0.25, 0.10, 0.05):
            searcher = IVFSearcher(state, visit)

            def ivf_step(q, s=searcher):
                eps = jnp.sum(q) * 1e-30
                return s.search(idx, qp_b + eps, None, args.k, exact=False)

            v_qps, v_ms = measure(ivf_step, iters=4)
            _, l_iv = searcher.search(idx, jnp.asarray(qp_all), None,
                                      args.k, exact=False)
            v_rec = metrics.avg_recall(np.asarray(l_iv), gt, args.k)
            sweep.append({"visit": visit, "qps": round(v_qps, 1),
                          "ms": round(v_ms, 3),
                          "recall_at_k": round(v_rec, 4)})
            log(f"ivf: {v_qps:.1f} QPS ({v_ms:.1f}ms/batch) "
                f"recall@{args.k}={v_rec:.4f} (visit={visit})")
        out["ivf_sweep"] = sweep
        best = max(sweep, key=lambda r: r["qps"])
        out["ivf_qps"] = best["qps"]
        out["ivf_recall_at_k"] = best["recall_at_k"]
        out["ivf_visit"] = best["visit"]
    except Exception as e:  # noqa: BLE001 — keep the tiers above
        import traceback
        log(f"ivf section failed: {e!r}")
        log(traceback.format_exc())
        out["ivf_error"] = repr(e)

    out["value"] = out.get("decoded8_qps") or out.get("ivf_qps") or 0.0
    out["vs_baseline"] = 1.0
    line = json.dumps(out)
    print(line)
    with open(cap_json, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
