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


def test_int8_kernel_matches_quantized_reference():
    """The u8-LUT int8 kernel's window winners equal a NumPy emulation of
    the reference FAST semantics (sum of raw u8 table entries,
    VAQ.cpp:1800-1830), and fast4_scan_topk with luts8 still returns exact
    f32 distances from the unquantized LUTs."""
    rng = np.random.default_rng(17)
    n, m, nq = 4096, 16, 4
    codes = rng.integers(0, 16, (n, m), dtype=np.int8)
    luts = rng.random((nq, m, 16), dtype=np.float32) * 4.0
    # a simple global quantizer for the test
    lut8 = np.clip(np.floor(luts * 63.0), 0, 255).astype(np.uint8)

    s8, i8 = scan_pallas.fast4_window_scan(
        jnp.asarray(codes),
        jnp.asarray((lut8.astype(np.int16) - 128).astype(np.int8)),
        block_rows=128, q_tile=4, interpret=True)
    ref = np.zeros((nq, n), dtype=np.int64)
    for q in range(nq):
        for s in range(m):
            ref[q] += lut8[q, s][codes[:, s]].astype(np.int64)
    ref -= 128 * m
    nblocks = n // 128
    for q in range(nq):
        for j in range(nblocks):
            w = ref[q, j * 128:(j + 1) * 128]
            assert np.asarray(s8)[q, j] == w.min(), (q, j)
            assert np.asarray(i8)[q, j] == j * 128 + int(w.argmin())

    d, i = scan_pallas.fast4_scan_topk(
        jnp.asarray(codes), jnp.asarray(luts), 5, block_rows=128, q_tile=4,
        interpret=True, luts8=jnp.asarray(lut8))
    # distances are exact f32 ADC sums of the returned ids
    full = _numpy_adc(codes, luts)
    got_d, got_i = np.asarray(d), np.asarray(i)
    for q in range(nq):
        np.testing.assert_allclose(got_d[q], full[q][got_i[q]], rtol=1e-5)
    # and winners overlap heavily with the f32 path
    d32, i32 = scan_pallas.fast4_scan_topk(
        jnp.asarray(codes), jnp.asarray(luts), 5, block_rows=128, q_tile=4,
        interpret=True)
    ov = np.mean([len(set(got_i[q]) & set(np.asarray(i32)[q])) / 5
                  for q in range(nq)])
    assert ov >= 0.6, ov


def test_general_c_window_scan():
    """C=256 (8-bit codes) and C=32 (5-bit) flow through the same kernel
    (GS = 128/C subspaces per matmul group)."""
    rng = np.random.default_rng(23)
    for c, m in ((256, 4), (32, 8)):
        n, nq = 1024, 2
        codes = rng.integers(0, c, (n, m)).astype(np.int32)
        luts = rng.random((nq, m, c)).astype(np.float32)
        scores, ids = scan_pallas.fast4_window_scan(
            jnp.asarray(codes), jnp.asarray(luts), block_rows=64, q_tile=2,
            interpret=True)
        ref = _numpy_adc(codes, luts)
        for q in range(nq):
            for j in range(n // 64):
                w = ref[q, j * 64:(j + 1) * 64]
                assert np.isclose(np.asarray(scores)[q, j], w.min(),
                                  atol=1e-2), (c, q, j)
                assert np.asarray(ids)[q, j] == j * 64 + int(w.argmin())
