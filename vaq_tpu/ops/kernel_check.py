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


def _parity_groupmin(rtol: float = 5e-4) -> Tuple[bool, dict]:
    """Compiled-vs-interpreted gate for the IVF group-min probe kernel
    (VERDICT r3 #3: it shipped in r3 without any compiled-path coverage and
    failed Mosaic lowering on the first real-chip run). Exercises BOTH
    tiling regimes — ntiles=1 (whole-bucket slab, the 1M shape) and
    ntiles>1 — and both row dtypes. Values are f32 group minima; the
    in-kernel lane reductions (‖q‖², weighted ‖x̂‖²) may legally
    reassociate under Mosaic, and the distance is a small difference of
    large terms, so reassociation ulps amplify — measured 1.03e-4 max rel
    on v5e (BENCH r4). The 5e-4 gate still catches real miscompiles
    (those produce garbage, not sub-1e-3)."""
    from vaq_tpu.ops import probe_pallas

    detail = {}
    ok_all = True
    rng = np.random.default_rng(0)
    for tag, (ncl, cap, rt, gs, qcap, dtype) in {
        "1tile_int8": (8, 1536, 1536, 8, 128, "int8"),
        "ntile_bf16": (4, 1024, 512, 16, 128, "bf16"),
    }.items():
        d = 128
        rows = rng.standard_normal((ncl * cap, d)).astype(np.float32)
        if dtype == "int8":
            rows = np.clip(np.round(rows * 32.0), -127, 127).astype(np.int8)
            rows = jnp.asarray(rows)
            dim_w = jnp.full((d,), 1.0 / (32.0 * 32.0), jnp.float32)
        else:
            rows = jnp.asarray(rows).astype(jnp.bfloat16)
            dim_w = jnp.ones((d,), jnp.float32)
        qsl = jnp.asarray((-2.0 * rng.standard_normal(
            (ncl, qcap, d))).astype(jnp.bfloat16))
        out_c = np.asarray(probe_pallas.groupmin_window_scan(
            qsl, rows, dim_w, ncl, cap, gs=gs, rt=rt, interpret=False),
            dtype=np.float32)
        out_i = np.asarray(probe_pallas.groupmin_window_scan(
            qsl, rows, dim_w, ncl, cap, gs=gs, rt=rt, interpret=True),
            dtype=np.float32)
        rel = np.abs(out_c - out_i) / np.maximum(np.abs(out_i), 1e-20)
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

    fields["kernel_parity_ok"] = bool(ok_d and ok_f and ok_g)
    if not ok_d:
        fields["kernel_parity_decode_detail"] = detail_d
    if not ok_f:
        fields["kernel_parity_fast4_mismatches"] = bad_f
    if not ok_g:
        fields["kernel_parity_groupmin_detail"] = detail_g
    return fields
