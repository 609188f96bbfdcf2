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


def test_decode_scan_topk_exact_vs_bruteforce():
    """The decode-then-dot capacity kernel: returned distances are exact ADC
    sums (f32 reconstruction) and winners match the brute-force reference at
    several (C, L) geometries."""
    rng = np.random.default_rng(31)
    for m, c, l, n, br in ((8, 16, 4, 1024, 16), (32, 256, 4, 4096, 64),
                           (16, 4, 8, 1024, 16)):
        d = m * l
        nq = 4
        cents = rng.standard_normal((m, c, l)).astype(np.float32)
        codes = rng.integers(0, c, (n, m)).astype(np.uint8)
        qp = rng.standard_normal((nq, d)).astype(np.float32)
        table, _ = scan_pallas.build_decode_table(cents)
        rows = scan_pallas.build_decode_rows(cents)
        dk, ik = scan_pallas.decode_scan_topk(
            jnp.asarray(codes.T.copy()), table, rows, jnp.asarray(qp), 10,
            block_rows=br, q_tile=8, interpret=True)
        dk, ik = np.asarray(dk), np.asarray(ik)
        xhat = cents[np.arange(m)[None, :], codes].reshape(n, d)
        full = ((qp[:, None, :] - xhat[None, :, :]) ** 2).sum(2)
        for q in range(nq):
            # exact distances for the returned ids
            np.testing.assert_allclose(dk[q], full[q][ik[q]], rtol=1e-5)
            # the true top-1 row always wins its window and the rescore
            assert ik[q][0] == np.argmin(full[q]), (m, c, q)


def test_decode_rescore_exact():
    """decode_rescore returns exact f32 per-pair distances."""
    rng = np.random.default_rng(32)
    m, c, l, r = 8, 64, 4, 100
    d = m * l
    cents = rng.standard_normal((m, c, l)).astype(np.float32)
    cand = rng.integers(0, c, (r, m)).astype(np.uint8)
    q_rep = rng.standard_normal((r, d)).astype(np.float32)
    rows = scan_pallas.build_decode_rows(cents)
    d2 = np.asarray(scan_pallas.decode_rescore(
        jnp.asarray(cand), rows, jnp.asarray(q_rep), interpret=True))
    xhat = cents[np.arange(m)[None, :], cand].reshape(r, d)
    ref = ((q_rep - xhat) ** 2).sum(1)
    np.testing.assert_allclose(d2, ref, rtol=1e-5)


def test_codes_backend_matches_decoded():
    """VAQIndex backend='codes' returns the decoded backend's neighbors on a
    small index (both rescore exactly; window-best candidates suffice when
    n/block_rows >> k)."""
    import vaq_tpu
    from vaq_tpu.data import make_sift_like
    # n ≥ 64·k·16 keeps the codes path eligible (block_rows floor is 16 —
    # the Mosaic 128-lane minimum; below it the backend falls back to the
    # decoded scan whose bf16 distances would fail the exactness check here)
    base, queries, gt = make_sift_like(n=8000, n_queries=8, d=64, seed=3)
    cfg = vaq_tpu.parse_method_string("VAQ128m16min7max8var1,HEAP")
    idx = vaq_tpu.VAQIndex(cfg).train(base).encode(base)
    d_dec, i_dec = idx.search(queries, 5, backend="decoded")
    d_cod, i_cod = idx.search(queries, 5, backend="codes")
    # top-1 must agree; distances of returned ids must be ADC-exact
    assert (i_dec[:, 0] == i_cod[:, 0]).mean() >= 0.9
    from vaq_tpu import pca as _pca
    qp = np.asarray(_pca.project(queries, idx.eigvecs, idx.total_dim))
    xhat = idx.reconstruct(i_cod.reshape(-1)).reshape(8, 5, -1)
    ref = ((qp[:, None, :] - xhat) ** 2).sum(2)
    np.testing.assert_allclose(d_cod, ref, rtol=1e-4, atol=1e-3)
