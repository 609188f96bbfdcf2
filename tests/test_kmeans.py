"""K-means correctness tests (reference KMeans.hpp family)."""

import numpy as np

from vaq_tpu import kmeans


def _blobs(n_per, centers, spread=0.1, seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for c in centers:
        pts.append(c + spread * rng.standard_normal((n_per, len(c))))
    return np.concatenate(pts).astype(np.float32)


def test_recovers_separated_blobs():
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], dtype=np.float32)
    x = _blobs(50, centers)
    # kmeans++ init: plain subset init can seed two centroids in one blob and
    # Lloyd (faithfully, like arma) stays in that local optimum.
    c, assign = kmeans.fit(x, 4, iters=25, seed=3, init="kmeans++")
    # Every true center should have a learned centroid within 0.5.
    d = np.sqrt(((centers[:, None, :] - c[None, :, :]) ** 2).sum(-1))
    assert d.min(axis=1).max() < 0.5
    assert len(np.unique(assign)) == 4


def test_assignment_consistency():
    x = _blobs(30, np.array([[0, 0], [5, 5]], dtype=np.float32))
    c, assign = kmeans.fit(x, 2, iters=10, seed=1)
    d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(assign, d.argmin(axis=1))


def test_kmeanspp_init():
    x = _blobs(30, np.array([[0, 0], [8, 8], [-8, 8]], dtype=np.float32))
    c, _ = kmeans.fit(x, 3, init="kmeans++", iters=15, seed=5)
    centers = np.array([[0, 0], [8, 8], [-8, 8]], dtype=np.float32)
    d = np.sqrt(((centers[:, None, :] - c[None, :, :]) ** 2).sum(-1))
    assert d.min(axis=1).max() < 1.0


def test_chunked_matches_unchunked():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    c1, _ = kmeans.fit(x, 16, iters=5, seed=9, block_rows=128)
    c2, _ = kmeans.fit(x, 16, iters=5, seed=9, block_rows=100000)
    np.testing.assert_allclose(c1, c2, atol=1e-4)


def test_empty_cluster_keeps_centroid():
    # k > distinct points forces empty clusters; must not produce NaNs.
    x = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]], dtype=np.float32)
    c, _ = kmeans.fit(x, 3, iters=5, seed=0)
    assert np.all(np.isfinite(c))


def test_minibatch_runs():
    x = _blobs(100, np.array([[0, 0], [6, 6]], dtype=np.float32))
    c, assign = kmeans.fit_minibatch(x, 2, iters=20, batch_size=64, seed=4)
    assert np.all(np.isfinite(c))
    assert len(np.unique(assign)) == 2


def test_hierarchical_fit_shapes():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2000, 4)).astype(np.float32)
    c = kmeans.hierarchical_fit(x, bits=9, iters=3, seed=1, coarse_bits=5)
    assert c.shape == (512, 4)
    assert np.all(np.isfinite(c))


def test_binary_split_fit_shapes():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((600, 4)).astype(np.float32)
    c = kmeans.binary_split_fit(x, bits=5, iters=3, seed=2)
    assert c.shape == (32, 4)
    assert np.all(np.isfinite(c))
