"""Continuous-batching server tests."""

import threading

import numpy as np
import pytest

from vaq_tpu import metrics
from vaq_tpu.config import parse_method_string
from vaq_tpu.serving import SearchServer
from vaq_tpu.vaq import VAQIndex


@pytest.fixture(scope="module")
def server_setup(sift_like):
    base, queries, gt = sift_like
    cfg = parse_method_string("VAQ128m16min7max8var1,SORT")
    idx = VAQIndex(cfg).train(base).encode(base)
    return idx, queries, gt


def test_single_query_roundtrip(server_setup):
    idx, queries, gt = server_setup
    srv = SearchServer(idx, k=10, max_batch=32, max_wait_ms=1.0)
    try:
        d, i = srv.search(queries[0])
        assert d.shape == (1, 10) and i.shape == (1, 10)
        ref_d, ref_i = idx.search(queries[:1], 10)
        np.testing.assert_array_equal(i, ref_i)
    finally:
        srv.close()


def test_concurrent_clients_batched(server_setup):
    idx, queries, gt = server_setup
    srv = SearchServer(idx, k=10, max_batch=16, max_wait_ms=20.0)
    try:
        futs = [srv.submit(queries[j]) for j in range(48)]
        results = [f.result(60) for f in futs]
        labels = np.concatenate([i for _, i in results], axis=0)
        rec = metrics.avg_recall(labels, gt[:48], 10)
        ref_rec = metrics.avg_recall(idx.search(queries[:48], 10)[1],
                                     gt[:48], 10)
        assert abs(rec - ref_rec) < 1e-6
        # coalescing actually happened (48 queries in ≤ ~6 batches, not 48)
        assert srv.batches_served <= 12, srv.batches_served
        assert srv.queries_served == 48
    finally:
        srv.close()


def test_group_submit(server_setup):
    idx, queries, _ = server_setup
    srv = SearchServer(idx, k=5, max_batch=64)
    try:
        d, i = srv.search(queries[:7])
        assert i.shape == (7, 5)
    finally:
        srv.close()


def test_close_idempotent(server_setup):
    idx, queries, _ = server_setup
    srv = SearchServer(idx, k=5)
    srv.search(queries[0])
    srv.close()
    # after close, thread is gone
    assert not srv._thread.is_alive()


def test_latency_stats_collected(server_setup):
    idx, queries, _ = server_setup
    srv = SearchServer(idx, k=5, max_batch=16, max_wait_ms=5.0)
    try:
        futs = [srv.submit(queries[j]) for j in range(20)]
        [f.result(60) for f in futs]
        s = srv.stats.summary()
        assert s["queries"] == 20
        assert s["qps"] > 0
        assert s["p50_ms"] > 0
    finally:
        srv.close()


def test_phase_timer():
    from vaq_tpu.profiling import PhaseTimer
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_oversized_group_rejected(server_setup):
    idx, queries, _ = server_setup
    srv = SearchServer(idx, k=5, max_batch=8)
    try:
        fut = srv.submit(queries[:20])
        import pytest as _pt
        with _pt.raises(ValueError):
            fut.result(10)
    finally:
        srv.close()


def test_batch_overflow_carries_over(server_setup):
    idx, queries, _ = server_setup
    srv = SearchServer(idx, k=5, max_batch=10, max_wait_ms=30.0)
    try:
        # 3 groups of 6: no two fit in one 10-batch; all must still be served
        futs = [srv.submit(queries[i * 6:(i + 1) * 6]) for i in range(3)]
        res = [f.result(60) for f in futs]
        for d, i in res:
            assert i.shape == (6, 5)
        assert srv.queries_served == 18
    finally:
        srv.close()
