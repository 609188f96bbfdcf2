"""On-hardware kernel equivalence gate (VERDICT r2 #7).

The Pallas scan kernels are unit-tested in interpreter mode on CPU
(`tests/test_scan_pallas.py`); a Mosaic *lowering* miscompile would slip
through and surface only as an unexplained recall dip in a noisy bench run.
This module runs each kernel twice on the SAME device inputs — once compiled
through Mosaic, once through the Pallas interpreter (the kernel body as
plain XLA ops). The one-hot (fast4) kernel is gated bitwise. The
decode-then-dot kernel is gated at 1e-4 relative: its in-kernel f32
reductions (the ‖x̂‖² lane sum) legally use a different accumulation order
under Mosaic than under XLA — measured on v5e: ≤ 3.5e-5 relative score
difference on ~32% of windows, with id flips only on genuine near-ties
(score Δ ≤ 4e-6), while the interpreter output is bitwise equal to an
independent XLA reference. A real lowering miscompile produces wrong
values, not few-ULP rounding, so the tolerance gate still catches it.

Run by bench.py on the real chip every round (`kernel_parity_ok` in the
bench JSON); on CPU both paths are the interpreter and the check is vacuous
(reported as skipped).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _parity_one(fn, *args) -> Tuple[bool, int]:
    """Run fn compiled and interpreted; return (bitwise equal, #mismatches)."""
    out_c = fn(*args, interpret=False)
    out_i = fn(*args, interpret=True)
    bad = 0
    for c, i in zip(jax.tree_util.tree_leaves(out_c),
                    jax.tree_util.tree_leaves(out_i)):
        bad += int(np.sum(np.asarray(c) != np.asarray(i)))
    return bad == 0, bad


def _parity_scores_ids(fn, *args, rtol: float = 1e-4) -> Tuple[bool, dict]:
    """Tolerance gate for (scores, ids) window scans: scores within rtol
    everywhere; ids may differ only where the two scores are within rtol
    (near-ties), and on < 0.1% of windows."""
    s_c, i_c = fn(*args, interpret=False)
    s_i, i_i = fn(*args, interpret=True)
    s_c, i_c, s_i, i_i = (np.asarray(a) for a in (s_c, i_c, s_i, i_i))
    denom = np.maximum(np.abs(s_i), 1e-20)
    rel = np.abs(s_c - s_i) / denom
    score_ok = bool(np.all(rel < rtol))
    id_diff = i_c != i_i
    ties_ok = bool(np.all(rel[id_diff] < rtol)) if id_diff.any() else True
    frac_ok = id_diff.mean() < 1e-3
    detail = {"max_rel_score_diff": float(rel.max()),
              "id_mismatch_frac": float(id_diff.mean())}
    return score_ok and ties_ok and frac_ok, detail


def groupmin_ref64_and_bound(qsl, rows_np, dim_w, ncl, cap, gs):
    """Float64 reference for the group-min kernel plus a per-output
    reassociation-error BOUND derived from the data (VERDICT r4 #6: the
    gate's tolerance must be anchored, not widened post-hoc).

    The kernel computes, per (cluster, row, slot),
    ``dist = Σ_d (q̃·r̃) + Σ_d r̃²·w + 0.25·Σ_d q̃²`` with q̃, r̃ the bf16-cast
    inputs (bf16 products are exact in f32; only the f32 ACCUMULATION order
    is implementation-defined), then a min over each gs-row group. Any
    reassociation of an n-term f32 sum differs from the exact sum by at
    most ``(n−1)·u·Σ|terms|`` (u = 2⁻²⁴), and a min over values each
    perturbed by ≤ e moves by ≤ e. So
    ``bound[c,g,s] = u·(d−1)·(max_{row∈g}(Σ|q̃r̃| + Σr̃²w) + 0.25Σq̃²)``
    is a sound envelope for BOTH the compiled and interpreted outputs
    around the f64 reference — no measured-on-chip constant involved.

    rows_np: the bf16-cast row values as float64 (int8 values are exact in
    bf16, so callers pass the raw integers cast to f64).
    Returns (ref64 (ncl, ng, qcap), bound (ncl, ng, qcap)) as float64.
    """
    d = rows_np.shape[1]
    q = np.asarray(qsl, dtype=np.float64)                     # (ncl,qcap,d)
    r = rows_np.reshape(ncl, cap, d)
    w = np.asarray(dim_w, dtype=np.float64)
    dot = np.einsum("cqd,crd->crq", q, r)                     # exact-ish f64
    xn = np.sum(r * r * w[None, None, :], axis=2)             # (ncl, cap)
    qn = 0.25 * np.sum(q * q, axis=2)                         # (ncl, qcap)
    dist = dot + xn[:, :, None] + qn[:, None, :]
    ref = dist.reshape(ncl, cap // gs, gs, -1).min(axis=2)
    mag = (np.einsum("cqd,crd->crq", np.abs(q), np.abs(r))
           + xn[:, :, None] + qn[:, None, :])
    u = 2.0 ** -24
    bound = u * (d - 1) * mag.reshape(ncl, cap // gs, gs, -1).max(axis=2)
    return ref, bound


def _parity_groupmin() -> Tuple[bool, dict]:
    """Compiled-vs-f64-anchored gate for the IVF group-min probe kernel
    (VERDICT r3 #3: it shipped in r3 without any compiled-path coverage and
    failed Mosaic lowering on the first real-chip run). Exercises ntiles=1
    (whole-bucket slab, the 1M shape), ntiles>1, the gs ≥ 128 large-cap
    regime (ADVICE r4: its (rt//gs, qcap) out block is a distinct Mosaic
    tiling), and both row dtypes.

    Gate (VERDICT r4 #6): compiled and interpreted outputs must each lie
    within the data-derived reassociation envelope of the f64 reference
    (see :func:`groupmin_ref64_and_bound`) with a 4× safety factor for the
    min-selection crossover (a min may pick a different row within the
    envelope, compounding two elements' errors plus double rounding of the
    f32 store). The interpreted path measures ≤ 0.4% of the limit on CPU;
    a real lowering miscompile produces errors orders of magnitude past
    the envelope."""
    from vaq_tpu.ops import probe_pallas

    detail = {}
    ok_all = True
    rng = np.random.default_rng(0)
    for tag, (ncl, cap, rt, gs, qcap, d, dtype, transposed) in {
        "1tile_int8": (8, 1536, 1536, 8, 128, 128, "int8", False),
        "ntile_bf16": (4, 1024, 512, 16, 128, 128, "bf16", False),
        "gs128_int8": (4, 2048, 2048, 128, 128, 128, "int8", False),
        "t96_int8": (4, 2048, 1024, 16, 128, 96, "int8", True),
    }.items():
        rows = rng.standard_normal((ncl * cap, d)).astype(np.float32)
        if dtype == "int8":
            rows = np.clip(np.round(rows * 32.0), -127, 127).astype(np.int8)
            rows_np = rows.astype(np.float64)  # int8 exact in bf16
            rows = jnp.asarray(rows)
            dim_w = jnp.full((d,), 1.0 / (32.0 * 32.0), jnp.float32)
        else:
            rows = jnp.asarray(rows).astype(jnp.bfloat16)
            rows_np = np.asarray(rows, dtype=np.float64)
            dim_w = jnp.ones((d,), jnp.float32)
        qsl = jnp.asarray((-2.0 * rng.standard_normal(
            (ncl, qcap, d))).astype(jnp.bfloat16))
        ref, bound = groupmin_ref64_and_bound(
            qsl, rows_np, dim_w, ncl, cap, gs)
        limit = 4.0 * np.maximum(bound, 1e-12)
        if transposed:
            rows = jnp.asarray(np.ascontiguousarray(
                np.asarray(rows.astype(jnp.float32)).reshape(ncl, cap, d)
                .transpose(0, 2, 1))).astype(rows.dtype).reshape(
                    ncl * d, cap)
        for mode, interp in (("compiled", False), ("interp", True)):
            out = np.asarray(probe_pallas.groupmin_window_scan(
                qsl, rows, dim_w, ncl, cap, gs=gs, rt=rt,
                transposed=transposed,
                interpret=interp), dtype=np.float64)
            err = np.abs(out - ref)
            ok = bool(np.all(err <= limit))
            ratio = float((err / limit).max())
            if not ok:
                detail[f"{tag}_{mode}"] = {
                    "max_err_over_limit": round(ratio, 3),
                    "max_abs_err": float(err.max())}
            ok_all = ok_all and ok
    return ok_all, detail


def _parity_gather_rescore(rtol: float = 2e-4) -> Tuple[bool, dict]:
    """Compiled-vs-interpreted gate for the scalar-prefetch gather-rescore
    kernel (ops/rescore_pallas): same math both ways (bf16 dot with exact
    products + Precision.HIGHEST f32 norms — bitwise, measured r5), so the
    only legal difference is the f32 ACCUMULATION order of the dot:
    ≤ (d−1)·2⁻²⁴·Σ|q̃·r̃| ≈ 1e-4 absolute at these magnitudes, which reads
    as rel ≈ 1e-4 on near-zero scores (the denom floors at 1). 2e-4 covers
    that envelope ×2; measured on-chip max 3.05e-5. (Without HIGHEST the
    norms ran at bf16 precision — 1.3e-3 rel, 12.8% on near-zero scores —
    which this gate catches.)"""
    from vaq_tpu.ops import rescore_pallas

    detail = {}
    ok_all = True
    rng = np.random.default_rng(1)
    for tag, (nq, m, gs, d, nblk, dtype, transposed) in {
        "gs16_int8": (16, 20, 16, 128, 64, "int8", False),
        "gs64_bf16": (8, 20, 64, 128, 32, "bf16", False),
        "t96_int8": (8, 6, 128, 96, 12, "int8", True),
    }.items():
        rows = rng.standard_normal((nblk * gs, d)).astype(np.float32)
        if dtype == "int8":
            rows = np.clip(np.round(rows * 32.0), -127, 127).astype(np.int8)
            rows = jnp.asarray(rows)
            dim_w = jnp.full((d,), 1.0 / (32.0 * 32.0), jnp.float32)
        else:
            rows = jnp.asarray(rows).astype(jnp.bfloat16)
            dim_w = jnp.ones((d,), jnp.float32)
        if transposed:  # single bucket of cap = nblk·gs, (d, cap) layout
            rows = jnp.asarray(np.ascontiguousarray(
                np.asarray(rows.astype(jnp.float32)).T)).astype(rows.dtype)
        q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
        wblk = jnp.asarray(
            rng.integers(0, nblk, size=(nq, m)).astype(np.int32))
        out_c = np.asarray(rescore_pallas.gather_rescore(
            q, dim_w, rows, wblk, gs, transposed=transposed,
            interpret=False), dtype=np.float32)
        out_i = np.asarray(rescore_pallas.gather_rescore(
            q, dim_w, rows, wblk, gs, transposed=transposed,
            interpret=True), dtype=np.float32)
        rel = np.abs(out_c - out_i) / np.maximum(np.abs(out_i), 1.0)
        ok = bool(np.all(rel < rtol))
        if not ok:
            detail[tag] = {"max_rel_diff": float(rel.max())}
        ok_all = ok_all and ok
    return ok_all, detail


def kernel_parity_fields(idx, queries: np.ndarray, n_rows: int = 65536,
                         nq: int = 128) -> dict:
    """Compiled-vs-interpreted equality for the decode-then-dot window scan,
    the one-hot (fast4) window scan (on a slice of a live index) and the
    IVF group-min probe kernel (synthetic buckets at both tiling regimes).

    Returns bench-JSON fields: kernel_parity_ok (bool) plus per-kernel
    mismatch counts when non-zero.
    """
    from vaq_tpu import pca
    from vaq_tpu.ops import scan_jax, scan_pallas

    if jax.default_backend() == "cpu":
        return {"kernel_parity_ok": None,
                "kernel_parity_note": "cpu backend: both paths interpret"}

    n_rows = min(n_rows, idx.n_rows)
    n_rows -= n_rows % 4096  # divisible by 8·block_rows for both kernels
    fields = {}

    codes_t = idx.codes[:, :n_rows]
    dec_table, _ = scan_pallas.build_decode_table(idx.centroids)
    qp = jnp.asarray(pca.project(queries[:nq], idx.eigvecs, idx.total_dim))

    ok_d, detail_d = _parity_scores_ids(
        lambda c, t, q, interpret: scan_pallas.decode_window_scan(
            c, t, q, block_rows=64, q_tile=128, interpret=interpret),
        codes_t, dec_table, qp)

    codes_rm = codes_t.T  # fast4 keeps the row-major contract
    luts = scan_jax.build_luts(qp, jnp.asarray(idx.centroids))
    ok_f, bad_f = _parity_one(
        lambda c, l, interpret: scan_pallas.fast4_window_scan(
            c, l, block_rows=64, q_tile=128, interpret=interpret),
        codes_rm, luts)

    ok_g, detail_g = _parity_groupmin()
    ok_r, detail_r = _parity_gather_rescore()

    fields["kernel_parity_ok"] = bool(ok_d and ok_f and ok_g and ok_r)
    if not ok_d:
        fields["kernel_parity_decode_detail"] = detail_d
    if not ok_f:
        fields["kernel_parity_fast4_mismatches"] = bad_f
    if not ok_g:
        fields["kernel_parity_groupmin_detail"] = detail_g
    if not ok_r:
        fields["kernel_parity_rescore_detail"] = detail_r
    return fields
