"""HTTP serving front-end tests (vaq_tpu/serving_http.py).

The reference has no network surface; these pin the deployment contract:
JSON request/response shapes, error codes, concurrent-client batching, and
the stats endpoint.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from vaq_tpu.config import parse_method_string
from vaq_tpu.serving import SearchServer
from vaq_tpu.serving_http import SearchHTTPServer
from vaq_tpu.vaq import VAQIndex


@pytest.fixture(scope="module")
def http_setup(sift_like):
    base, queries, gt = sift_like
    cfg = parse_method_string("VAQ128m16min7max8var1,SORT")
    idx = VAQIndex(cfg).train(base).encode(base)
    srv = SearchServer(idx, k=10, max_batch=32, max_wait_ms=2.0)
    http = SearchHTTPServer(srv, host="127.0.0.1", port=0).start()
    host, port = http.address[:2]
    yield idx, queries, f"http://{host}:{port}"
    http.close()
    srv.close()


def _post(url, obj, timeout=60.0):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=10.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def test_healthz_and_404(http_setup):
    _, _, root = http_setup
    assert _get(root + "/healthz") == {"ok": True}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(root + "/nope")
    assert ei.value.code == 404


def test_search_roundtrip_matches_index(http_setup):
    idx, queries, root = http_setup
    out = _post(root + "/search", {"query": queries[0].tolist()})
    labels = np.asarray(out["labels"])
    dists = np.asarray(out["distances"])
    assert labels.shape == (1, 10) and dists.shape == (1, 10)
    _, ref_i = idx.search(queries[:1], 10)
    np.testing.assert_array_equal(labels, np.asarray(ref_i))


def test_search_group_and_small_k(http_setup):
    idx, queries, root = http_setup
    out = _post(root + "/search",
                {"query": queries[:3].tolist(), "k": 5})
    assert np.asarray(out["labels"]).shape == (3, 5)


def test_bad_requests(http_setup):
    _, queries, root = http_setup
    for body, code in [
        ({"query": queries[0].tolist(), "k": 99}, 400),   # k > server k
        ({"nope": 1}, 400),                                # missing query
        ({"query": [[[1.0]]]}, 400),                       # 3-d query
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(root + "/search", body)
        assert ei.value.code == code


def test_concurrent_http_clients(http_setup):
    idx, queries, root = http_setup
    n = 24
    results = [None] * n
    errs = []

    def worker(j):
        try:
            results[j] = _post(root + "/search",
                               {"query": queries[j].tolist()})
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errs
    labels = np.concatenate([np.asarray(r["labels"]) for r in results])
    _, ref_i = idx.search(queries[:n], 10)
    np.testing.assert_array_equal(labels, np.asarray(ref_i))
    stats = _get(root + "/stats")
    assert stats["queries_served"] >= n
    assert stats["batches_served"] >= 1
    assert "p50_ms" in stats
