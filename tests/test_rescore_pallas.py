"""Gather-rescore kernel tests (VERDICT r4 #5): value equivalence with the
XLA block-rescore formulation it replaces, in interpret mode on CPU (the
Mosaic lowering is gated on chip by ops/kernel_check)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vaq_tpu.ops import rescore_pallas


def _xla_reference(q_eff, dim_w, bucket_rows, wblk, gs):
    """The formulation probe_scan used before the kernel existed."""
    d = q_eff.shape[1]
    blk_rows = bucket_rows.reshape(-1, gs, d)[wblk]        # (nq, m, gs, d)
    inner = jnp.einsum("qd,qmgd->qmg", q_eff.astype(jnp.bfloat16),
                       blk_rows.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    brf = blk_rows.astype(jnp.float32)
    norms = jnp.einsum("qmgd,d->qmg", brf * brf, dim_w)
    return 2.0 * inner - norms


def _make(nq, m, gs, d, nblk, dtype, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.standard_normal((nblk * gs, d)).astype(np.float32)
    if dtype == "int8":
        rows = np.clip(np.round(rows * 32.0), -127, 127).astype(np.int8)
        dim_w = jnp.full((d,), 1.0 / (32.0 * 32.0), jnp.float32)
    else:
        rows = jnp.asarray(rows).astype(jnp.bfloat16)
        dim_w = jnp.ones((d,), jnp.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    wblk = rng.integers(0, nblk, size=(nq, m)).astype(np.int32)
    return jnp.asarray(q), dim_w, jnp.asarray(rows), jnp.asarray(wblk)


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
@pytest.mark.parametrize("nq,m,gs,d,nblk", [
    (16, 20, 16, 128, 64),     # the 1M-ish shape (m·gs=320 needs pad)
    (8, 20, 64, 128, 32),      # the 10M shape class (m·gs=1280 aligned)
    (5, 6, 8, 128, 16),        # nq not a tile multiple, m_pad 6→16
    (32, 4, 256, 96, 8),       # the 100M gs/d class
])
def test_gather_rescore_matches_xla(dtype, nq, m, gs, d, nblk):
    q, w, rows, wblk = _make(nq, m, gs, d, nblk, dtype)
    out = rescore_pallas.gather_rescore(q, w, rows, wblk, gs,
                                        interpret=True)
    ref = _xla_reference(q, w, rows, wblk, gs)
    assert out.shape == (nq, m, gs)
    o, r = np.asarray(out), np.asarray(ref)
    # identical math (bf16 dot + f32 norms); only reduction order differs
    denom = np.maximum(np.abs(r), 1.0)
    assert np.max(np.abs(o - r) / denom) < 2e-5


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
@pytest.mark.parametrize("nq,m,gs,d,nblk", [
    (8, 6, 64, 96, 20),        # the 100M transposed class (gs·cap slices)
    (5, 5, 16, 64, 12),        # small/unaligned everything
])
def test_gather_rescore_transposed_matches_xla(dtype, nq, m, gs, d, nblk):
    q, w, rows, wblk = _make(nq, m, gs, d, nblk, dtype, seed=11)
    ref = _xla_reference(q, w, rows, wblk, gs)
    # repack rows into the (ncl·d, cap) transposed layout with ONE
    # "cluster" (nblk windows of one cap=nblk·gs bucket)
    cap = nblk * gs
    rows_np = np.asarray(rows.astype(jnp.float32)).reshape(cap, d)
    rows_t = jnp.asarray(np.ascontiguousarray(rows_np.T)).astype(rows.dtype)
    out = rescore_pallas.gather_rescore(q, w, rows_t, wblk, gs,
                                        transposed=True, interpret=True)
    o, r = np.asarray(out), np.asarray(ref)
    denom = np.maximum(np.abs(r), 1.0)
    assert np.max(np.abs(o - r) / denom) < 2e-5


def test_gather_rescore_duplicate_and_boundary_windows():
    """Duplicate window ids (common: several queries share a hot cluster)
    and ids at both ends of the block range must gather correctly."""
    q, w, rows, _ = _make(9, 5, 16, 128, 10, "int8", seed=3)
    wblk = jnp.asarray(np.array([[0, 0, 9, 9, 0]] * 9, dtype=np.int32))
    out = rescore_pallas.gather_rescore(q, w, rows, wblk, 16,
                                        interpret=True)
    ref = _xla_reference(q, w, rows, wblk, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-3)
    # window 0 and 1 reference the same block → identical scores
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(out[:, 1]))
