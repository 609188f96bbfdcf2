"""Native extension: build, parity with the numpy fallback paths."""

import numpy as np
import pytest

from vaq_tpu import io, native


@pytest.fixture(scope="module")
def mod():
    m = native.get()
    if m is None:
        pytest.skip("no compiler available; numpy fallbacks cover behavior")
    return m


def test_native_builds(mod):
    assert hasattr(mod, "pack_codes")
    assert hasattr(mod, "read_vecs")
    assert hasattr(mod, "merge_topk")


def test_pack_codes_parity(mod):
    import vaq_tpu.binary as b
    rng = np.random.default_rng(0)
    bits = np.array([4, 7, 8, 1, 12, 3, 5], dtype=np.int64)
    buckets = np.stack([rng.integers(0, 1 << int(x), size=200) for x in bits],
                       axis=1)
    nat = native.pack_codes(buckets, bits)
    # force the numpy path for comparison
    import os
    os.environ["VAQ_TPU_NO_NATIVE"] = "1"
    native._tried, native._mod = False, None
    try:
        ref = b.pack_codes(buckets, bits)
    finally:
        del os.environ["VAQ_TPU_NO_NATIVE"]
        native._tried, native._mod = False, None
    np.testing.assert_array_equal(nat, ref)


def test_read_vecs_parity(mod, tmp_path):
    x = np.random.default_rng(1).standard_normal((50, 17)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    io.write_fvecs(p, x)
    got = native.read_vecs(p, np.float32)
    np.testing.assert_array_equal(got, x)
    got3 = native.read_vecs(p, np.float32, max_rows=3)
    np.testing.assert_array_equal(got3, x[:3])


def test_merge_topk_parity(mod):
    rng = np.random.default_rng(2)
    nq, k, m = 5, 8, 12
    best_d = np.sort(rng.random((nq, k)).astype(np.float32), axis=1)
    best_i = np.stack([rng.permutation(1000)[:k] for _ in range(nq)]
                      ).astype(np.int32)
    new_d = rng.random((nq, m)).astype(np.float32)
    new_i = np.stack([1000 + rng.permutation(1000)[:m] for _ in range(nq)]
                     ).astype(np.int32)

    cd = np.concatenate([best_d, new_d], axis=1)
    ci = np.concatenate([best_i, new_i], axis=1)
    order = np.argsort(cd, axis=1, kind="stable")[:, :k]
    ref_d = np.take_along_axis(cd, order, axis=1)

    d2, i2 = best_d.copy(), best_i.copy()
    assert native.merge_topk(d2, i2, new_d, new_i)
    np.testing.assert_allclose(d2, ref_d)
    # ids achieve the same distances
    for q in range(nq):
        lookup = {int(i): float(v) for v, i in zip(cd[q], ci[q])}
        for v, i in zip(d2[q], i2[q]):
            assert abs(lookup[int(i)] - v) < 1e-6
