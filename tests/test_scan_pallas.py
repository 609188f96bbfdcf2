"""Pallas FAST-scan kernel: interpret-mode correctness vs the XLA reference
scan (compiled-mode perf is exercised on hardware by bench/verify)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vaq_tpu.ops import scan_jax, scan_pallas


def _setup(seed=0, n=2048, m=8, nq=4):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 16, size=(n, m)).astype(np.int32)
    luts = rng.random((nq, m, 16)).astype(np.float32)
    return codes, luts


def _numpy_adc(codes, luts):
    nq, m, c = luts.shape
    out = np.zeros((nq, codes.shape[0]))
    for q in range(nq):
        for s in range(m):
            out[q] += luts[q, s][codes[:, s]]
    return out


def test_window_scan_matches_numpy():
    codes, luts = _setup()
    scores, ids = scan_pallas.fast4_window_scan(
        jnp.asarray(codes), jnp.asarray(luts), block_rows=256, q_tile=4,
        interpret=True)
    ref = _numpy_adc(codes, luts)
    nblocks = codes.shape[0] // 256
    for q in range(luts.shape[0]):
        for j in range(nblocks):
            w = ref[q, j * 256:(j + 1) * 256]
            assert np.isclose(np.asarray(scores)[q, j], w.min(), atol=1e-2)
            assert np.asarray(ids)[q, j] == j * 256 + int(w.argmin())


def test_fast4_topk_high_recall_vs_exact():
    codes, luts = _setup(seed=1, n=4096, m=6, nq=5)
    k = 8
    d_ref, i_ref = scan_jax.adc_scan_topk(jnp.asarray(codes),
                                          jnp.asarray(luts), k)
    d, i = scan_pallas.fast4_scan_topk(jnp.asarray(codes), jnp.asarray(luts),
                                       k, block_rows=64, q_tile=8,
                                       interpret=True)
    # window candidates: expect most of the true top-k found, exact distances
    for q in range(5):
        inter = len(set(np.asarray(i)[q]) & set(np.asarray(i_ref)[q]))
        assert inter >= k - 2, (q, inter)
    got = np.asarray(d)
    assert np.all(np.diff(got, axis=1) >= -1e-5)


def test_fast4_topk_n_valid():
    codes, luts = _setup(seed=2, n=512, m=4, nq=3)
    _, i = scan_pallas.fast4_scan_topk(jnp.asarray(codes), jnp.asarray(luts),
                                       5, n_valid=jnp.int32(40),
                                       block_rows=32, q_tile=4,
                                       interpret=True)
    ids = np.asarray(i)
    assert ids.max() < 40
    assert np.all((ids >= 0) | (ids == -1))


def test_fast4_unpadded_rows():
    codes, luts = _setup(seed=3, n=1000, m=4, nq=2)
    d, i = scan_pallas.fast4_scan_topk(jnp.asarray(codes), jnp.asarray(luts),
                                       5, block_rows=128, q_tile=2,
                                       interpret=True)
    assert np.asarray(i).max() < 1000
    assert np.all(np.isfinite(np.asarray(d)))


def test_v2_kernel_matches_v1():
    """The packed-min v2 kernel returns the same windows/winners as v1
    (scores may differ in the low mantissa bits the index packing claims)."""
    rng = np.random.default_rng(17)
    n, m, nq = 8192, 16, 8
    codes = rng.integers(0, 16, (n, m), dtype=np.int8)
    luts = rng.random((nq, m, 16), dtype=np.float32)
    s1, i1 = scan_pallas.fast4_window_scan(
        jnp.asarray(codes), jnp.asarray(luts), block_rows=256,
        interpret=True)
    s2, i2 = scan_pallas.fast4_window_scan_v2(
        jnp.asarray(codes), jnp.asarray(luts), block_rows=256,
        interpret=True)
    # same winning row unless a packed-precision tie occurred (rare): then
    # the packed scores still agree
    same = np.asarray(i1) == np.asarray(i2)
    assert same.mean() > 0.99, same.mean()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)
    d1, l1 = scan_pallas.fast4_scan_topk(jnp.asarray(codes),
                                         jnp.asarray(luts), 5,
                                         block_rows=256, interpret=True,
                                         kernel="v1")
    d2, l2 = scan_pallas.fast4_scan_topk(jnp.asarray(codes),
                                         jnp.asarray(luts), 5,
                                         block_rows=256, interpret=True,
                                         kernel="v2")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
