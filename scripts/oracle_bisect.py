#!/usr/bin/env python
"""Bisect the engine-vs-oracle recall gap (VERDICT r4 #3).

The bench's oracle companion measured engine 0.3849 vs oracle 0.4015 at
n=100k, k=10 (Δ −0.0166) — 3× the ≤0.5% parity target (SURVEY §6). This
script decomposes that gap stage by stage on the SAME data/config as
``bench.oracle_fields``:

  A. engine default (approx_max_k + 2k over-fetch + exact rescore)
  B. engine exact=True (true top_k over the bf16 scores)      → approx share
  C. engine exact ADC scan in f32 (lut_gather backend)        → bf16 share
  D. engine codes scored by the ORACLE's exact ADC scan        → scan share
  E. oracle end-to-end                                        → training share
     (E−D isolates codebook/training differences: same scan, different
     codebooks)

plus codebook diagnostics (bit allocations, per-subspace quantization MSE
on the training set).

On CPU approx_max_k lowers to an exact top-k, so stage A≡B there; run on
the chip for the approx share (the default platform), or with
VAQ_TPU_PLATFORM=cpu for the training/bf16 shares only.

Writes scripts/oracle_bisect_<platform>.json.
"""
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
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--config", default="VAQ256m32min7max8var1,HEAP")
    args = p.parse_args()

    from vaq_tpu.cli import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.io import pad_dims
    from vaq_tpu.ops import scan_jax
    from vaq_tpu.ops.distances import exact_search

    platform = jax.default_backend()
    log(f"platform: {platform}")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".bench_cache")
    data_cache = os.path.join(cache_dir, "data_n1000000_d128_q1024.npz")
    if os.path.exists(data_cache) and args.d == 128:
        with np.load(data_cache) as z:
            base, queries = z["base"][: args.n], z["queries"][: args.queries]
        log("data from bench cache")
    else:
        from vaq_tpu.data import make_anisotropic_gaussian
        base, queries = make_anisotropic_gaussian(
            args.n, args.d, args.queries, seed=42)

    k = args.k
    gt_d, gt = exact_search(jnp.asarray(queries), jnp.asarray(base), k)
    gt = np.asarray(gt)

    cfg = vaq_tpu.parse_method_string(args.config)
    t0 = time.perf_counter()
    eng = vaq_tpu.VAQIndex(cfg).train(base).encode(base)
    log(f"engine build: {time.perf_counter() - t0:.0f}s")

    out = {"n": args.n, "k": k, "config": args.config,
           "platform": platform}

    # A: default path (approx + rescore)
    _, lab = eng.search(queries, k)
    out["A_engine_default"] = round(metrics.avg_recall(lab, gt, k), 4)

    # B: exact top_k over the bf16 scores
    d_b, l_b = eng.search_device(jnp.asarray(queries), k, exact=True)
    out["B_engine_exact_topk"] = round(
        metrics.avg_recall(np.asarray(l_b), gt, k), 4)

    # C: exact f32 ADC scan over the engine's codes (LUT gather, no bf16)
    _, l_c = eng.search(queries, k, backend="lut_gather")
    out["C_engine_f32_adc"] = round(metrics.avg_recall(l_c, gt, k), 4)

    # D/E: the oracle — its own scan over (D) the ENGINE's artifacts and
    # (E) its own end-to-end pipeline
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from oracle_ref import OracleVAQ

    base_p = pad_dims(np.asarray(base, np.float32), cfg.subspace_num)
    q_p = pad_dims(np.asarray(queries, np.float32), cfg.subspace_num)

    t0 = time.perf_counter()
    o = OracleVAQ(cfg.bit_budget, cfg.subspace_num, cfg.min_bits,
                  cfg.max_bits, var=cfg.percent_var_explained, seed=cfg.seed)
    o.train(base_p).encode(base_p)
    _, olab = o.search(q_p, k)
    out["E_oracle_e2e"] = round(metrics.avg_recall(olab, gt, k), 4)
    log(f"oracle pipeline: {time.perf_counter() - t0:.0f}s")

    # D: oracle scan machinery over the ENGINE's eigvecs/codebooks/codes —
    # isolates scan differences from training differences. Build LUTs from
    # the engine's centroids with the engine's projection, score the
    # engine's codes in f64.
    qp_eng = np.asarray(queries, np.float32) @ \
        eng.eigvecs[:, : eng.total_dim]
    luts = np.asarray(scan_jax.build_luts(
        jnp.asarray(qp_eng), jnp.asarray(eng.centroids)))   # (nq, M', C)
    codes_rm = eng.codes_rowmajor().astype(np.int64)        # (n, M')
    dists = np.zeros((args.queries, args.n), dtype=np.float64)
    for s in range(codes_rm.shape[1]):
        dists += luts[:, s, :][:, codes_rm[:, s]]
    l_d = np.argsort(dists, axis=1, kind="stable")[:, :k]
    out["D_oracle_scan_engine_codes"] = round(
        metrics.avg_recall(l_d, gt, k), 4)

    # shares
    out["share_approx"] = round(
        out["B_engine_exact_topk"] - out["A_engine_default"], 4)
    out["share_bf16_scan"] = round(
        out["C_engine_f32_adc"] - out["B_engine_exact_topk"], 4)
    out["share_scan_formulation"] = round(
        out["D_oracle_scan_engine_codes"] - out["C_engine_f32_adc"], 4)
    out["share_training"] = round(
        out["E_oracle_e2e"] - out["D_oracle_scan_engine_codes"], 4)
    out["delta_total"] = round(
        out["E_oracle_e2e"] - out["A_engine_default"], 4)

    # codebook diagnostics: bit allocations + train quantization MSE
    out["engine_bits"] = np.asarray(eng.bits).tolist()
    out["oracle_bits"] = np.asarray(o.bits).tolist()

    def quant_mse(x_proj, centroids, codes_rm, subs_len, highest):
        err = 0.0
        for s in range(highest):
            sl = x_proj[:, s * subs_len:(s + 1) * subs_len]
            rec = centroids[s][codes_rm[:, s]]
            err += float(np.mean(np.sum((sl - rec) ** 2, axis=1)))
        return err

    xp_eng = base_p @ eng.eigvecs[:, : eng.total_dim]
    out["engine_train_mse"] = round(
        quant_mse(xp_eng, eng.centroids, codes_rm, eng.subs_len,
                  eng.highest_subs), 4)
    xp_o = base_p @ o.eigvecs[:, : o.total_dim]
    out["oracle_train_mse"] = round(
        quant_mse(xp_o, o.centroids, np.asarray(o.codes, np.int64),
                  o.subs_len, o.highest_subs), 4)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"oracle_bisect_{platform}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
