"""ADC scan correctness: blocked scan + top-k vs a numpy reference of
searchSort (VAQ.cpp:1760-1776)."""

import jax.numpy as jnp
import numpy as np

from vaq_tpu.ops import scan_jax
from vaq_tpu.ops.distances import exact_search


def _numpy_adc(codes, luts):
    """Reference semantics: dist[q, n] = Σ_s lut[q, s, codes[n, s]]."""
    nq, m, c = luts.shape
    n = codes.shape[0]
    out = np.zeros((nq, n), dtype=np.float64)
    for q in range(nq):
        for s in range(m):
            out[q] += luts[q, s][codes[:, s]]
    return out


def test_build_luts_matches_direct():
    rng = np.random.default_rng(0)
    nq, m, c, l = 4, 6, 8, 3
    q = rng.standard_normal((nq, m * l)).astype(np.float32)
    cent = rng.standard_normal((m, c, l)).astype(np.float32)
    luts = np.asarray(scan_jax.build_luts(jnp.asarray(q), jnp.asarray(cent)))
    qr = q.reshape(nq, m, l)
    direct = ((qr[:, :, None, :] - cent[None]) ** 2).sum(-1)
    np.testing.assert_allclose(luts, direct, atol=1e-4)


def test_scan_matches_numpy_reference():
    rng = np.random.default_rng(1)
    n, m, c, nq, k = 1000, 8, 16, 5, 10
    codes = rng.integers(0, c, size=(n, m)).astype(np.int32)
    luts = rng.random((nq, m, c)).astype(np.float32)
    d, i = scan_jax.adc_scan_topk(jnp.asarray(codes), jnp.asarray(luts), k,
                                  block_rows=128)
    ref = _numpy_adc(codes, luts)
    ref_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
    ref_d = np.take_along_axis(ref, ref_i, axis=1)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-5, atol=1e-5)
    # ids can differ on exact ties; distances must match, and returned ids
    # must achieve those distances.
    got = np.take_along_axis(ref, np.asarray(i), axis=1)
    np.testing.assert_allclose(got, ref_d, rtol=1e-5, atol=1e-5)


def test_scan_respects_n_valid():
    rng = np.random.default_rng(2)
    n, m, c, nq, k = 64, 4, 4, 2, 8
    codes = rng.integers(0, c, size=(n, m)).astype(np.int32)
    luts = rng.random((nq, m, c)).astype(np.float32)
    d, i = scan_jax.adc_scan_topk(jnp.asarray(codes), jnp.asarray(luts), k,
                                  n_valid=jnp.int32(10), block_rows=16)
    assert np.asarray(i).max() < 10


def test_scan_block_size_invariance():
    rng = np.random.default_rng(3)
    n, m, c, nq, k = 777, 5, 8, 3, 7
    codes = rng.integers(0, c, size=(n, m)).astype(np.int32)
    luts = rng.random((nq, m, c)).astype(np.float32)
    d1, _ = scan_jax.adc_scan_topk(jnp.asarray(codes), jnp.asarray(luts), k,
                                   block_rows=64)
    d2, _ = scan_jax.adc_scan_topk(jnp.asarray(codes), jnp.asarray(luts), k,
                                   block_rows=512)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_exact_search_matches_numpy():
    rng = np.random.default_rng(4)
    db = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    d, i = exact_search(jnp.asarray(q), jnp.asarray(db), 5, block_rows=64)
    ref = ((q[:, None, :] - db[None]) ** 2).sum(-1)
    ref_i = np.argsort(ref, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_refine_topk():
    rng = np.random.default_rng(5)
    db = rng.standard_normal((100, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    cand_labels = np.stack([rng.choice(100, 20, replace=False) for _ in range(3)])
    cands = db[cand_labels]
    d, i = scan_jax.refine_topk(jnp.asarray(q), jnp.asarray(cands),
                                jnp.asarray(cand_labels.astype(np.int32)), 5)
    # Reference: best-5 by exact distance among the candidates.
    ref = ((q[:, None, :] - cands) ** 2).sum(-1)
    order = np.argsort(ref, axis=1)[:, :5]
    ref_labels = np.take_along_axis(cand_labels, order, axis=1)
    ref_d = np.take_along_axis(ref, order, axis=1)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-5)
    np.testing.assert_allclose(
        np.sort(np.asarray(i), axis=1), np.sort(ref_labels, axis=1))


def test_quantize_luts():
    rng = np.random.default_rng(6)
    luts = rng.random((2, 3, 8)).astype(np.float32) * 10
    offsets = luts.min(axis=(0, 2))
    scales = 255.0 / (luts.max(axis=(0, 2)) - offsets + 1e-9)
    q = np.asarray(scan_jax.quantize_luts(jnp.asarray(luts),
                                          jnp.asarray(offsets),
                                          jnp.asarray(scales)))
    assert q.dtype == np.uint8
    deq = q.astype(np.float32) / scales[None, :, None] + offsets[None, :, None]
    assert np.max(np.abs(deq - luts)) < 1.0 / scales.min() + 1e-3


def test_exact_search_host_stream_matches():
    from vaq_tpu.ops.distances import exact_search_host_stream
    rng = np.random.default_rng(7)
    db = rng.standard_normal((1000, 16)).astype(np.float32)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    d_ref, i_ref = exact_search(jnp.asarray(q), jnp.asarray(db), 7)
    d, i = exact_search_host_stream(q, db, 7, chunk_rows=300)
    np.testing.assert_array_equal(i, np.asarray(i_ref))
    np.testing.assert_allclose(d, np.asarray(d_ref), rtol=1e-5, atol=1e-5)
