"""Evaluation: pack-level and event-level metrics, calibration, plots."""

from .metrics import PackMetrics, EventMetrics, roc_auc_score, average_precision_score  # noqa: F401
