"""Jaccard + Manhattan distance golden tests, mirroring the reference's
``test/test-distancefunction.cpp:65-116`` (Jaccard) and ``manhattanDist``
(DistanceFunctions.hpp:254-263).

The reference packs bits MSB-first into u64 words; our engine packs MSB-first
into u32 lanes. For distance purposes only the multiset of set bits matters,
so the goldens are expressed directly as u32 word patterns.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vaq_tpu.ops.distances import (jaccard_dists, jaccard_topk,
                                   manhattan_dists, manhattan_topk,
                                   exact_search)


def _bv(*words):
    """One packed bit-vector row from u32 word values."""
    return np.asarray([list(words)], dtype=np.uint32)


def _jac(a, b):
    return float(np.asarray(jaccard_dists(jnp.asarray(a), jnp.asarray(b)))[0, 0])


# (v1, v2, expected) — transcribed from test-distancefunction.cpp:65-116.
JACCARD_GOLDENS = [
    # interchangeable params
    ((0x0,), (0x1,), 1.0),
    ((0x1,), (0x0,), 1.0),
    ((0x0,), (0xF,), 1.0),
    ((0xF,), (0x0,), 1.0),
    # 4 bit
    ((0x0,), (0x0,), 0.0),
    ((0x8,), (0x8,), 0.0),
    ((0xF,), (0xF,), 0.0),
    ((0x1,), (0x3,), 0.5),
    ((0x1,), (0x7,), 1.0 - 1.0 / 3),
    ((0x1,), (0xF,), 0.75),
    # 8 bit
    ((0x11,), (0x03,), 2.0 / 3),
    ((0x11,), (0x1E,), 4.0 / 5),
    ((0x11,), (0xFF,), 6.0 / 8),
    # 16 bit
    ((0x1111,), (0x0003,), 4.0 / 5),
    ((0x1111,), (0x00FF,), 4.0 / 5),
    ((0x1111,), (0xFFFF,), 3.0 / 4),
    # 32 bit
    ((0x11111111,), (0x00000003,), 8.0 / 9),
    ((0x11111111,), (0x0000FFFF,), 4.0 / 5),
    ((0x11111111,), (0xFFFFFFFF,), 3.0 / 4),
    # 64 bit (two u32 words; reference uses one u64)
    ((0x0, 0x0), (0x0, 0x0), 0.0),
    ((0x0000FFFF, 0x0), (0x0000FFFF, 0x0), 0.0),
    ((0x11111111, 0x0), (0x00000003, 0x0), 8.0 / 9),
    ((0x11111111, 0x0), (0x0000FFFF, 0x0), 4.0 / 5),
    ((0x11111111, 0x0), (0xFFFFFFFF, 0x0), 3.0 / 4),
]


@pytest.mark.parametrize("v1,v2,expected", JACCARD_GOLDENS)
def test_jaccard_goldens(v1, v2, expected):
    assert _jac(_bv(*v1), _bv(*v2)) == pytest.approx(expected, abs=1e-6)


def test_jaccard_symmetry_random():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2 ** 32, (8, 4), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (8, 4), dtype=np.uint32)
    dab = np.asarray(jaccard_dists(jnp.asarray(a), jnp.asarray(b)))
    dba = np.asarray(jaccard_dists(jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(dab, dba.T, rtol=1e-6)
    assert (dab >= 0).all() and (dab <= 1).all()


def test_jaccard_topk_matches_numpy():
    rng = np.random.default_rng(5)
    db = rng.integers(0, 2 ** 32, (300, 3), dtype=np.uint32)
    q = rng.integers(0, 2 ** 32, (7, 3), dtype=np.uint32)

    def pop(x):
        return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)

    inter = pop(np.bitwise_and(q[:, None, :], db[None, :, :]).reshape(7, 300, -1))
    union = pop(np.bitwise_or(q[:, None, :], db[None, :, :]).reshape(7, 300, -1))
    ref = np.where(union == 0, 0.0, 1.0 - inter / np.maximum(union, 1))
    d, i = jaccard_topk(jnp.asarray(db), jnp.asarray(q), 10, block_rows=128)
    d, i = np.asarray(d), np.asarray(i)
    ref_sorted = np.sort(ref, axis=1)[:, :10]
    np.testing.assert_allclose(np.sort(d, axis=1), ref_sorted, atol=1e-6)
    # returned ids actually achieve the returned distances
    np.testing.assert_allclose(ref[np.arange(7)[:, None], i], d, atol=1e-6)


def test_manhattan_goldens():
    q = jnp.asarray([[1.0, 2.0, 3.0]])
    x = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [2.0, 0.0, 4.0]])
    d = np.asarray(manhattan_dists(q, x))
    np.testing.assert_allclose(d[0], [0.0, 6.0, 4.0], atol=1e-6)


def test_manhattan_topk_matches_numpy():
    rng = np.random.default_rng(9)
    db = rng.standard_normal((500, 24)).astype(np.float32)
    q = rng.standard_normal((6, 24)).astype(np.float32)
    ref = np.abs(q[:, None, :] - db[None, :, :]).sum(2)
    d, i = manhattan_topk(jnp.asarray(q), jnp.asarray(db), 9, block_rows=128)
    d, i = np.asarray(d), np.asarray(i)
    order = np.argsort(ref, axis=1)[:, :9]
    np.testing.assert_allclose(
        d, np.take_along_axis(ref, order, axis=1), rtol=1e-5)
    # L1 ties are rare in float data; ids should match outright
    np.testing.assert_allclose(ref[np.arange(6)[:, None], i], d, rtol=1e-5)


def test_binary_engine_metric_plumbing(sift_like):
    from vaq_tpu.binary import BinaryIndex
    base, queries, _ = sift_like
    idx = BinaryIndex(bit_budget=64).train(base[:2000]).encode(base[:2000])
    d, i = idx.query(queries[:4], 5, metric="jaccard")
    assert d.shape == (4, 5) and (d >= 0).all() and (d <= 1).all()
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    dm, im = idx.query_naive(queries[:4], base[:2000], 5, metric="manhattan")
    ref = np.abs(queries[:4, None, :] - base[None, :2000, :]).sum(2)
    np.testing.assert_allclose(
        dm, np.sort(ref, axis=1)[:, :5], rtol=1e-4)
