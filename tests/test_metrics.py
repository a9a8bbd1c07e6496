"""Metrics parity vs sklearn + event clustering/matching semantics."""

import numpy as np
import pytest
from sklearn.metrics import (
    average_precision_score as sk_ap,
    confusion_matrix as sk_cm,
    precision_recall_fscore_support as sk_prfs,
    roc_auc_score as sk_auc,
)

from sldm_gnn_tpu.evals.metrics import (
    EventMetrics,
    PackMetrics,
    average_precision_score,
    roc_auc_score,
    _cluster,
)
from sldm_gnn_tpu.utils.calibration import bayes_prior_shift


def test_roc_auc_and_ap_match_sklearn(rng):
    for trial in range(5):
        gt = rng.integers(0, 2, 200)
        scores = np.round(rng.random(200), 2)  # ties included
        np.testing.assert_allclose(roc_auc_score(gt, scores), sk_auc(gt, scores), rtol=1e-9)
        np.testing.assert_allclose(
            average_precision_score(gt, scores), sk_ap(gt, scores), rtol=1e-9
        )


def test_pack_metrics_match_sklearn(rng):
    gt = rng.integers(0, 2, 300)
    scores = rng.random(300)
    pm = PackMetrics(gt_arr_1d=gt, scr_arr_1d=scores, threshold=0.4)
    pred = (scores >= 0.4).astype(int)
    np.testing.assert_array_equal(pm.conf_matrix, sk_cm(gt, pred, labels=[0, 1]))
    p, r, f1, _ = sk_prfs(gt, pred, average="binary", zero_division=0)
    np.testing.assert_allclose([pm.precision, pm.recall, pm.f1_score], [p, r, f1], rtol=1e-9)
    np.testing.assert_allclose(pm.accuracy, (pred == gt).mean())


def test_pack_metrics_single_class_nan():
    pm = PackMetrics(gt_arr_1d=np.zeros(10), scr_arr_1d=np.random.rand(10), threshold=0.5)
    assert np.isnan(pm.roc_auc) and np.isnan(pm.ap)


def test_cluster():
    idx = np.array([0, 1, 2, 10, 11, 30])
    cl = _cluster(idx, gap=3)
    assert [list(c) for c in cl] == [[0, 1, 2], [10, 11], [30]]
    assert _cluster(np.array([]), 5) == []


def test_event_metrics_matching():
    # GT event at [10..12], pred clusters at [11] (TP) and [40] (FA)
    n = 60
    gt = np.zeros(n)
    gt[10:13] = 1
    scores = np.zeros(n)
    scores[11] = 0.9
    scores[40] = 0.8
    em = EventMetrics(
        sim_duration_s=60, threshold=0.5, gt_arr_1d=gt, scr_arr_1d=scores,
        gap_pred=5, gap_gt=20, match_tol=10,
    )
    assert em.n_gtevents == 1
    assert em.n_pred_clusters == 2
    assert em.n_detected_gte == 1
    assert em.n_false_alarms == 1
    assert em.far_h == pytest.approx(1 / 60 * 3600)
    assert em.event_precision == 0.5
    assert em.event_recall == 1.0


def test_event_metrics_tolerance_matching():
    # pred cluster 15 samples before the GT event start; tol 20 matches it
    n = 100
    gt = np.zeros(n)
    gt[50:55] = 1
    scores = np.zeros(n)
    scores[35] = 0.9
    em = EventMetrics(sim_duration_s=10, threshold=0.5, gt_arr_1d=gt, scr_arr_1d=scores, match_tol=20)
    assert em.n_detected_gte == 1
    em2 = EventMetrics(sim_duration_s=10, threshold=0.5, gt_arr_1d=gt, scr_arr_1d=scores, match_tol=10)
    assert em2.n_detected_gte == 0 and em2.n_false_alarms == 1


def test_event_metrics_no_gt_events():
    em = EventMetrics(
        sim_duration_s=10, threshold=0.5, gt_arr_1d=np.zeros(20), scr_arr_1d=np.ones(20) * 0.9
    )
    assert em.n_gtevents == 0 and em.n_pred_clusters == 0


def test_bayes_prior_shift():
    scores = np.array([0.99, 0.5, 0.1])
    cal, ratio = bayes_prior_shift(scores, train_prior=0.4, test_prior=0.01)
    expected_ratio = (0.01 / 0.99) / (0.4 / 0.6)
    np.testing.assert_allclose(ratio, expected_ratio)
    np.testing.assert_allclose(
        cal, scores * ratio / (scores * ratio + 1 - scores)
    )


def test_csv_and_plot_outputs(tmp_path, rng):
    gt = rng.integers(0, 2, 50)
    scores = rng.random(50)
    pm = PackMetrics(gt_arr_1d=gt, scr_arr_1d=scores, threshold=0.5)
    p = pm.save_csv(tmp_path, 2)
    assert p.is_file()
    em = EventMetrics(sim_duration_s=60, threshold=0.5, gt_arr_1d=gt, scr_arr_1d=scores)
    p2 = em.save_csv(tmp_path, 2)
    assert p2.is_file()
    em.plot_temporal_comparison(tmp_path / "plot.png")
    assert (tmp_path / "plot.png").is_file()
