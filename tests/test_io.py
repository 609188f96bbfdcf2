"""IO round-trip tests (reference utils/IO.hpp readers/writers)."""

import numpy as np

from vaq_tpu import io


def test_fvecs_roundtrip(tmp_path):
    x = np.random.default_rng(0).standard_normal((10, 7)).astype(np.float32)
    p = str(tmp_path / "a.fvecs")
    io.write_fvecs(p, x)
    y = io.read_fvecs(p)
    np.testing.assert_array_equal(x, y)


def test_fvecs_max_rows(tmp_path):
    x = np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "a.fvecs")
    io.write_fvecs(p, x)
    y = io.read_fvecs(p, max_rows=3)
    np.testing.assert_array_equal(x[:3], y)


def test_ivecs_roundtrip(tmp_path):
    x = np.random.default_rng(0).integers(0, 1000, size=(5, 100)).astype(np.int32)
    p = str(tmp_path / "a.ivecs")
    io.write_ivecs(p, x)
    np.testing.assert_array_equal(io.read_ivecs(p), x)


def test_reference_siftsmall_files_parse():
    # The in-tree reference fixture files must parse with our readers.
    q = io.read_fvecs("/root/reference/data/siftsmall/siftsmall_query.fvecs")
    gt = io.read_ivecs("/root/reference/data/siftsmall/siftsmall_groundtruth.ivecs")
    assert q.shape == (100, 128)
    assert gt.shape == (100, 100)
    assert gt.min() >= 0 and gt.max() < 10000


def test_bin_roundtrip(tmp_path):
    x = np.random.default_rng(1).standard_normal((6, 3)).astype(np.float32)
    p = str(tmp_path / "a.bin")
    x.tofile(p)
    np.testing.assert_array_equal(io.read_bin(p, 3), x)


def test_pad_dims():
    x = np.ones((4, 10), np.float32)
    y = io.pad_dims(x, 4)
    assert y.shape == (4, 12)
    np.testing.assert_array_equal(y[:, 10:], 0)
    assert io.pad_dims(x, 5).shape == (4, 10)


def test_index_npz_roundtrip(tmp_path):
    p = str(tmp_path / "idx.npz")
    arrays = {"a": np.arange(6).reshape(2, 3).astype(np.float32)}
    meta = {"k": 5, "name": "x"}
    io.save_index_npz(p, arrays, meta)
    a2, m2 = io.load_index_npz(p)
    np.testing.assert_array_equal(a2["a"], arrays["a"])
    assert m2 == meta


def test_write_knn_results(tmp_path):
    p = str(tmp_path / "res.csv")
    io.write_knn_results(p, np.array([[1, 2], [3, 4]]))
    lines = open(p).read().strip().split("\n")
    assert lines == ["1,2", "3,4"]


def test_reference_centroid_format_roundtrip(tmp_path):
    cents = [np.random.default_rng(i).standard_normal((2 ** (4 + i % 3), 4)
                                                      ).astype(np.float32)
             for i in range(5)]
    p = str(tmp_path / "cent.bin")
    io.save_centroids_ref(p, cents)
    loaded = io.load_centroids_ref(p)
    assert len(loaded) == 5
    for a, b in zip(cents, loaded):
        np.testing.assert_array_equal(a, b)


def test_reference_codebook_format_roundtrip(tmp_path):
    codes = np.random.default_rng(0).integers(0, 65535, size=(100, 16)
                                              ).astype(np.uint16)
    p = str(tmp_path / "cb.bin")
    io.save_codebook_ref(p, codes)
    np.testing.assert_array_equal(io.load_codebook_ref(p), codes)


def test_bolt_export(tmp_path):
    cents = [np.ones((16, 4), np.float32) * i for i in range(3)]
    p = str(tmp_path / "bolt.csv")
    io.write_centroids_bolt(p, cents)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 48
    assert lines[0] == "0,0,0,0"
    assert lines[-1] == "2,2,2,2"


def test_read_dataset_dispatch(tmp_path):
    x = np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32)
    p1 = str(tmp_path / "a.fvecs")
    io.write_fvecs(p1, x)
    np.testing.assert_array_equal(io.read_dataset(p1), x)
    p2 = str(tmp_path / "a.bin")
    x.tofile(p2)
    np.testing.assert_array_equal(io.read_dataset(p2, dim=4), x)
    import pytest as _pt
    with _pt.raises(ValueError):
        io.read_dataset(p2)  # bin without dim
    with _pt.raises(ValueError):
        io.read_dataset(str(tmp_path / "a.unknown"))


def test_sampled_readers(tmp_path):
    """Sampled streaming readers (reference IO.hpp:431-518): rows come from
    the file, are distinct, and the sample is seed-reproducible."""
    from vaq_tpu.io import (read_bin_sampled, read_bvecs_sampled,
                            read_fvecs_sampled, write_fvecs)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((500, 12)).astype(np.float32)
    p = str(tmp_path / "a.fvecs")
    write_fvecs(p, x)
    s1 = read_fvecs_sampled(p, 50, seed=7)
    s2 = read_fvecs_sampled(p, 50, seed=7)
    np.testing.assert_array_equal(s1, s2)
    assert s1.shape == (50, 12)
    # every sampled row is an actual file row, all distinct
    matches = (s1[:, None, :] == x[None, :, :]).all(2)
    rows = matches.argmax(1)
    assert matches.any(1).all()
    assert len(np.unique(rows)) == 50
    # oversampling clamps to the file size
    assert read_fvecs_sampled(p, 10_000).shape == (500, 12)

    pb = str(tmp_path / "a.bin")
    x.tofile(pb)
    sb = read_bin_sampled(pb, 12, 64, seed=3)
    assert sb.shape == (64, 12)
    assert (sb[:, None, :] == x[None, :, :]).all(2).any(1).all()

    # bvecs
    xb = rng.integers(0, 256, (100, 8), dtype=np.uint8)
    pv = str(tmp_path / "a.bvecs")
    with open(pv, "wb") as f:
        for row in xb:
            f.write(np.int32(8).tobytes())
            f.write(row.tobytes())
    sv = read_bvecs_sampled(pv, 30, seed=1)
    assert sv.shape == (30, 8) and sv.dtype == np.float32
