"""Device-chunk streaming: the 100M capacity pipeline's building blocks.

Covers data.DeviceChunkSource (deterministic regenerable chunks — the
device-side analog of the reference's disk-resident chunk reads,
BitVecEngine.cpp:1441-1624), VAQIndex.encode_chunks, and the chunked exact
search / rescore used by scripts/capacity_100m.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import vaq_tpu
from vaq_tpu.data import DeviceChunkSource
from vaq_tpu.ops.distances import (exact_rescore_chunked, exact_search,
                                   exact_search_chunked)

N, D, CHUNK = 4096 + 123, 32, 1024  # deliberately non-divisible


@pytest.fixture(scope="module")
def src():
    return DeviceChunkSource(N, D, CHUNK, seed=7)


def test_chunks_deterministic_and_cover(src):
    a = np.asarray(src.chunk(2))
    b = np.asarray(src.chunk(2))
    np.testing.assert_array_equal(a, b)
    sizes = [src.chunk(i).shape[0] for i in range(src.n_chunks)]
    assert sum(sizes) == N
    assert sizes[-1] == N % CHUNK
    # distinct chunks are distinct data
    assert not np.allclose(np.asarray(src.chunk(0))[:8],
                           np.asarray(src.chunk(1))[:8])


def test_queries_and_sample_shapes(src):
    q = src.queries(17)
    assert q.shape == (17, D) and q.dtype == np.float32
    s = src.host_sample(500)
    assert s.shape == (500, D) and s.dtype == np.float32


def test_encode_chunks_matches_encode(src):
    base = np.concatenate([np.asarray(c) for c in src.chunks()])
    cfg = vaq_tpu.parse_method_string("VAQ32m8min2max6var1,HEAP")
    idx_a = vaq_tpu.VAQIndex(cfg).train(base).encode(base)
    idx_b = vaq_tpu.VAQIndex(cfg).train(base)
    idx_b.encode_chunks(src.chunk, N, CHUNK)
    assert idx_b.codes.dtype == idx_a.codes.dtype
    np.testing.assert_array_equal(np.asarray(idx_a.codes),
                                  np.asarray(idx_b.codes))
    assert idx_b.n_rows == N


def test_exact_search_chunked_matches_monolithic(src):
    base = np.concatenate([np.asarray(c) for c in src.chunks()])
    q = src.queries(9)
    d_ref, l_ref = exact_search(jnp.asarray(q), jnp.asarray(base), 10)
    d_ch, l_ch = exact_search_chunked(q, src.chunk, N, CHUNK, 10)
    np.testing.assert_allclose(d_ch, np.asarray(d_ref), rtol=1e-4, atol=1e-3)
    # labels can differ only on exact-distance ties; distances pin parity
    same = l_ch == np.asarray(l_ref)
    ties = np.isclose(d_ch, np.asarray(d_ref), rtol=1e-4, atol=1e-3)
    assert np.all(same | ties)


def test_exact_rescore_chunked(src):
    base = np.concatenate([np.asarray(c) for c in src.chunks()])
    q = src.queries(5)
    rng = np.random.default_rng(0)
    cand = rng.choice(N, size=(5, 20), replace=False).astype(np.int32)
    d, lab = exact_rescore_chunked(q, cand, src.chunk, N, CHUNK, 7)
    # brute force over the same candidates
    for qi in range(5):
        d2 = np.sum((q[qi][None] - base[cand[qi]]) ** 2, axis=1)
        order = np.argsort(d2)[:7]
        np.testing.assert_array_equal(lab[qi], cand[qi][order])
        np.testing.assert_allclose(d[qi], d2[order], rtol=1e-4, atol=1e-3)


def test_exact_rescore_handles_invalid_ids(src):
    q = src.queries(3)
    cand = np.full((3, 8), -1, dtype=np.int32)
    cand[:, 0] = [0, 1, 2]
    d, lab = exact_rescore_chunked(q, cand, src.chunk, N, CHUNK, 3)
    assert np.all(np.isfinite(d[:, 0]))
    assert np.all(np.isinf(d[:, 1:]))
    np.testing.assert_array_equal(lab[:, 0], [0, 1, 2])
