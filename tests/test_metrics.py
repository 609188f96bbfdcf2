"""Golden tests for the metric formulas (Experiment.hpp:234-369 ports)."""

import numpy as np
import pytest

from vaq_tpu.metrics import (avg_recall, mean_average_precision, recall_at_r,
                             cluster_index)


def test_avg_recall_perfect():
    pred = np.array([[0, 1, 2], [3, 4, 5]])
    gt = np.array([[2, 1, 0], [5, 4, 3]])
    assert avg_recall(pred, gt, 3) == 1.0


def test_avg_recall_partial():
    pred = np.array([[0, 1, 9]])   # 2 of 3 in gt top-3
    gt = np.array([[2, 1, 0]])
    assert avg_recall(pred, gt, 3) == pytest.approx(2 / 3)


def test_avg_recall_k_prefix_of_gt():
    # Only gt[:k] counts as relevant.
    pred = np.array([[5]])
    gt = np.array([[1, 5]])
    assert avg_recall(pred, gt, 1) == 0.0
    assert avg_recall(np.array([[1]]), gt, 1) == 1.0


def test_recall_at_r():
    gt = np.array([[7, 1, 2], [9, 1, 2]])
    pred = np.array([[3, 7, 5], [0, 1, 2]])
    # query 0 finds true NN (7) within r=3; query 1 doesn't find 9.
    assert recall_at_r(pred, gt, 3) == 0.5
    assert recall_at_r(pred, gt, 1) == 0.0


def test_gt_offset():
    # 1-based groundtruth files (IdxOffset=1 in the reference).
    pred = np.array([[0, 1]])
    gt = np.array([[1, 2]])
    assert avg_recall(pred, gt, 2, gt_offset=1) == 1.0


def test_map_perfect():
    pred = np.array([[0, 1, 2]])
    gt = np.array([[0, 1, 2]])
    assert mean_average_precision(pred, gt, 3) == pytest.approx(1.0)


def test_map_formula_hand_computed():
    # pred=[2,0,9], gt=[0,1,2], K=3.
    # r=1: pred[0]=2 ∈ gt[:3] yes; |pred[:1] ∩ gt[:1]| = |{2}∩{0}| = 0 → 0/1
    # r=2: pred[1]=0 ∈ gt[:3] yes; |{2,0}∩{0,1}| = 1 → 1/2
    # r=3: pred[2]=9 ∉ gt[:3] → 0
    # AP = (0 + 0.5 + 0)/3
    pred = np.array([[2, 0, 9]])
    gt = np.array([[0, 1, 2]])
    assert mean_average_precision(pred, gt, 3) == pytest.approx(0.5 / 3)


def test_cluster_index():
    X = np.array([[0.0, 0.0], [2.0, 0.0]])
    C = np.array([[1.0, 0.0]])
    a = np.array([0, 0])
    assert cluster_index(a, X, C) == pytest.approx(1.0)


def test_knn_classification_accuracy():
    from vaq_tpu.metrics import knn_classification_accuracy
    # db classes: row i has class i % 2; predictions retrieve rows of the
    # query's own class for q0, wrong class for q1
    pred = np.array([[0, 2, 4], [1, 3, 5]])
    db_classes = np.array([0, 1] * 3)
    assert knn_classification_accuracy(pred, np.array([0, 0]), db_classes) \
        == 0.5
    assert knn_classification_accuracy(pred, np.array([0, 1]), db_classes) \
        == 1.0


def test_silhouette_separated_blobs():
    from vaq_tpu.metrics import silhouette_score
    X = np.array([[0, 0], [0.1, 0], [5, 5], [5.1, 5]], dtype=np.float64)
    C = np.array([[0.05, 0], [5.05, 5]], dtype=np.float64)
    a = np.array([0, 0, 1, 1])
    assert silhouette_score(X, a, C) > 0.9


def test_formulas_match_reference_checker_randomized():
    """Cross-validate the vectorized metrics against straightforward loop
    transcriptions of the reference's offline checker
    (scripts/compute_accuracy.py:5-41) on random inputs."""
    rng = np.random.default_rng(11)

    def ref_avg_recall(gt, ans, k):
        total = 0.0
        for i in range(len(gt)):
            ct = 0
            for p in ans[i]:
                if p in gt[i][:k]:
                    ct += 1
            total += ct / k
        return total / len(gt)

    def ref_recall_at_r(gt, ans):
        return sum(1 for i in range(len(gt)) if gt[i][0] in ans[i]) / len(gt)

    def ref_map(gt, ans, k):
        total = 0.0
        for i in range(len(gt)):
            ap = 0.0
            for r in range(k):
                if ans[i][r] in gt[i][:k]:
                    ct = sum(1 for j in range(r + 1)
                             if ans[i][j] in gt[i][:r + 1])
                    ap += ct / (r + 1)
            total += ap / k
        return total / len(gt)

    from vaq_tpu.metrics import (avg_recall, mean_average_precision,
                                 recall_at_r)
    for trial in range(5):
        nq, k = 7, 6
        gt = np.stack([rng.permutation(40)[:k] for _ in range(nq)])
        pred = np.stack([rng.permutation(40)[:k] for _ in range(nq)])
        gt_l = gt.tolist()
        pred_l = pred.tolist()
        assert avg_recall(pred, gt, k) == pytest.approx(
            ref_avg_recall(gt_l, pred_l, k))
        assert recall_at_r(pred, gt, k) == pytest.approx(
            ref_recall_at_r(gt_l, pred_l))
        assert mean_average_precision(pred, gt, k) == pytest.approx(
            ref_map(gt_l, pred_l, k))
