"""Pack-level and event-level evaluation metrics.

Parity: /root/reference/src/metrics.py —
  * ``PackMetrics`` (:206-264): threshold → predictions; confusion matrix,
    binary precision/recall/F1 (zero-division → 0), accuracy, ROC-AUC and
    average precision (NaN when the ground truth is single-class);
  * ``EventMetrics`` (:12-204): clusters positive GT indices (gap<=gap_gt)
    and positive prediction indices (gap<=gap_pred) into events;
    interval-overlap matching with ±match_tol; detected/missed events,
    TP/false-alarm clusters, event precision/recall, and false-alarm rate
    per hour = false_alarms / sim_seconds * 3600 (:92-93).

Implemented in pure numpy (no sklearn dependency at runtime); the test
suite cross-checks ROC-AUC/AP/PRF against sklearn.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


def roc_auc_score(gt: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based ROC-AUC with tie averaging (== sklearn.roc_auc_score)."""
    gt = np.asarray(gt).ravel()
    scores = np.asarray(scores).ravel().astype(np.float64)
    pos = gt == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    sorted_scores = scores[order]
    i = 0
    base = np.arange(1, len(scores) + 1, dtype=np.float64)
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        base[i : j + 1] = (i + 1 + j + 1) / 2.0
        i = j + 1
    ranks[order] = base
    rank_pos = ranks[pos].sum()
    return float((rank_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def average_precision_score(gt: np.ndarray, scores: np.ndarray) -> float:
    """AP = sum_n (R_n - R_{n-1}) * P_n (== sklearn.average_precision_score)."""
    gt = np.asarray(gt).ravel().astype(np.int64)
    scores = np.asarray(scores).ravel().astype(np.float64)
    n_pos = int((gt == 1).sum())
    if n_pos == 0 or n_pos == len(gt):
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    gt_sorted = gt[order]
    s_sorted = scores[order]
    tp_cum = np.cumsum(gt_sorted == 1)
    fp_cum = np.cumsum(gt_sorted == 0)
    # thresholds at distinct score boundaries
    distinct = np.r_[np.nonzero(np.diff(s_sorted))[0], len(s_sorted) - 1]
    tp = tp_cum[distinct].astype(np.float64)
    fp = fp_cum[distinct].astype(np.float64)
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / n_pos
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def _cluster(idx_array: np.ndarray, gap: int) -> list[np.ndarray]:
    """Group sorted indices into clusters where consecutive gaps <= gap."""
    if len(idx_array) == 0:
        return []
    breaks = np.nonzero(np.diff(idx_array) > gap)[0] + 1
    return np.split(idx_array, breaks)


@dataclass
class PackMetrics:
    gt_arr_1d: np.ndarray
    scr_arr_1d: np.ndarray
    threshold: float

    pred_arr_1d: np.ndarray = field(init=False)
    conf_matrix: np.ndarray = field(init=False)
    precision: float = field(init=False)
    recall: float = field(init=False)
    f1_score: float = field(init=False)
    accuracy: float = field(init=False)
    roc_auc: float = field(init=False)
    ap: float = field(init=False)

    def __post_init__(self):
        gt = np.asarray(self.gt_arr_1d).astype(np.int64)
        scr = np.asarray(self.scr_arr_1d)
        pred = (scr >= self.threshold).astype(np.int32)
        self.pred_arr_1d = pred
        tn = int(((pred == 0) & (gt == 0)).sum())
        fp = int(((pred == 1) & (gt == 0)).sum())
        fn = int(((pred == 0) & (gt == 1)).sum())
        tp = int(((pred == 1) & (gt == 1)).sum())
        self.conf_matrix = np.array([[tn, fp], [fn, tp]])
        self.precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        self.recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        pr = self.precision + self.recall
        self.f1_score = 2 * self.precision * self.recall / pr if pr > 0 else 0.0
        self.accuracy = float((pred == gt).mean()) if len(gt) else float("nan")
        single_class = np.unique(gt).size <= 1
        self.roc_auc = float("nan") if single_class else roc_auc_score(gt, scr)
        self.ap = float("nan") if single_class else average_precision_score(gt, scr)

    def printout(self):
        from ..labels import label_name

        print("\nPACK-LEVEL METRICS:")
        print(f"  Threshold: {self.threshold}")
        print(f"  Accuracy: {self.accuracy:.4f}")
        print(f"  Precision: {self.precision:.4f}")
        print(f"  Recall: {self.recall:.4f}")
        print(f"  F1 Score: {self.f1_score:.4f}")
        print(f"  ROC AUC: {self.roc_auc:.4f}")
        print(f"  Average Precision: {self.ap:.4f}")
        print(f"  Confusion Matrix (TN, FP, FN, TP): {self.conf_matrix.ravel().tolist()}")
        print(f"  Num Samples: {self.gt_arr_1d.size}")

    def to_row(self, lb_value) -> dict:
        from ..labels import label_name

        return {
            "label": lb_value,
            "label_name": label_name(lb_value) if lb_value is not None else "ALL",
            "threshold": self.threshold,
            "accuracy": self.accuracy,
            "precision": self.precision,
            "recall": self.recall,
            "f1_score": self.f1_score,
            "roc_auc": self.roc_auc,
            "average_precision": self.ap,
            "tn": int(self.conf_matrix[0, 0]),
            "fp": int(self.conf_matrix[0, 1]),
            "fn": int(self.conf_matrix[1, 0]),
            "tp": int(self.conf_matrix[1, 1]),
            "num_samples": int(self.gt_arr_1d.size),
        }

    def save_csv(self, outdir: Path | str, lb_value) -> Path:
        import pandas as pd

        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        p = outdir / "test_pack_metrics.csv"
        pd.DataFrame([self.to_row(lb_value)]).to_csv(p, index=False)
        return p


@dataclass
class EventMetrics:
    sim_duration_s: int
    threshold: float
    gt_arr_1d: np.ndarray
    scr_arr_1d: np.ndarray
    gap_pred: int = 5
    gap_gt: int = 20
    match_tol: int = 20

    preds_arr_1d: np.ndarray = field(init=False)
    gt_events: list = field(init=False, default_factory=list)
    pred_clusters: list = field(init=False, default_factory=list)
    gtec_tp_ids: set = field(init=False, default_factory=set)
    pec_tp_ids: set = field(init=False, default_factory=set)

    def __post_init__(self):
        self.preds_arr_1d = (np.asarray(self.scr_arr_1d) >= self.threshold).astype(np.int32)
        gt_idx = np.where(np.asarray(self.gt_arr_1d) == 1)[0]
        self.gt_events = _cluster(gt_idx, self.gap_gt)
        self.pred_clusters = []
        self.gtec_tp_ids = set()
        self.pec_tp_ids = set()
        if not self.gt_events:
            return
        pred_idx = np.where(self.preds_arr_1d == 1)[0]
        self.pred_clusters = _cluster(pred_idx, self.gap_pred)
        for ci, pc in enumerate(self.pred_clusters):
            pc_start, pc_end = pc[0], pc[-1]
            for ei, ge in enumerate(self.gt_events):
                gs, ge_end = ge[0], ge[-1]
                if pc_start <= ge_end + self.match_tol and pc_end >= gs - self.match_tol:
                    self.gtec_tp_ids.add(ei)
                    self.pec_tp_ids.add(ci)

    @property
    def n_gtevents(self) -> int:
        return len(self.gt_events)

    @property
    def n_pred_clusters(self) -> int:
        return len(self.pred_clusters)

    @property
    def n_detected_gte(self) -> int:
        return len(self.gtec_tp_ids)

    @property
    def n_missed_gte(self) -> int:
        return self.n_gtevents - self.n_detected_gte

    @property
    def n_tp_pred_clusters(self) -> int:
        return len(self.pec_tp_ids)

    @property
    def n_false_alarms(self) -> int:
        return self.n_pred_clusters - self.n_tp_pred_clusters

    @property
    def far_h(self) -> float:
        return (self.n_false_alarms / self.sim_duration_s) * 3600

    @property
    def event_precision(self) -> float:
        return self.n_tp_pred_clusters / self.n_pred_clusters if self.n_pred_clusters else 0.0

    @property
    def event_recall(self) -> float:
        return self.n_detected_gte / self.n_gtevents if self.n_gtevents else 0.0

    def printout(self):
        print("\nEVENT LEVEL METRICS:")
        print(f"   Simulation duration (s): {self.sim_duration_s}")
        print(f"   Threshold: {self.threshold}")
        print(f"   Gaps pred/gt: {self.gap_pred}/{self.gap_gt}, match tol: {self.match_tol}")
        print(f"   Detected GT events: {self.n_detected_gte}/{self.n_gtevents}")
        print(f"   Missed GT events: {self.n_missed_gte}/{self.n_gtevents}")
        print(f"   TP clusters: {self.n_tp_pred_clusters}/{self.n_pred_clusters}")
        print(f"   False alarm clusters: {self.n_false_alarms}/{self.n_pred_clusters}")
        print(f"   False alarm rate per hour: {self.far_h:.4f}")
        print(f"   Event precision: {self.event_precision:.4f}")
        print(f"   Event recall: {self.event_recall:.4f}")

    def to_row(self, lb_value) -> dict:
        from ..labels import label_name

        return {
            "label": lb_value,
            "label_name": label_name(lb_value) if lb_value is not None else "ALL",
            "threshold": self.threshold,
            "sim_duration_s": self.sim_duration_s,
            "n_gt_events": self.n_gtevents,
            "n_detected_gt_events": self.n_detected_gte,
            "n_missed_gt_events": self.n_missed_gte,
            "n_pred_clusters": self.n_pred_clusters,
            "n_tp_pred_clusters": self.n_tp_pred_clusters,
            "n_false_alarm_clusters": self.n_false_alarms,
            "far_per_hour": self.far_h,
            "event_precision": self.event_precision,
            "event_recall": self.event_recall,
        }

    def save_csv(self, outdir: Path | str, lb_value) -> Path:
        import pandas as pd

        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        p = outdir / "test_event_metrics.csv"
        pd.DataFrame([self.to_row(lb_value)]).to_csv(p, index=False)
        return p

    def plot_temporal_comparison(self, outpath: Path | str):
        """Score-vs-GT dual-panel plot (reference: metrics.py:140-204)."""
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, (ax, ax_detail) = plt.subplots(
            2, 1, figsize=(16, 8), gridspec_kw={"height_ratios": [3, 1]}
        )
        x_axis = np.arange(len(self.scr_arr_1d))
        ax.plot(x_axis, self.scr_arr_1d, linewidth=1.2, alpha=0.85, label="Score")
        for idx in np.where(np.asarray(self.gt_arr_1d) == 1)[0]:
            ax.axvline(x=idx, color="red", alpha=0.4, linewidth=1.7)
        ax.axhline(y=self.threshold, color="green", linewidth=1.5, linestyle="--", alpha=0.9)
        for idx, p in enumerate(self.pred_clusters):
            tp = idx in self.pec_tp_ids
            ax.axvspan(p[0], p[-1], alpha=0.2 if tp else 0.15,
                       color="#22aa44" if tp else "#dd6622", linewidth=0)
        ax.set_title("Score vs Ground Truth Events", loc="left", fontsize=11, fontweight="bold")
        ax.set_ylabel("Score")
        ax.set_ylim(bottom=-0.05, top=1.05)
        ax.grid(True, alpha=0.25)
        ax.legend(loc="upper right", fontsize=8)

        gt = np.asarray(self.gt_arr_1d)
        ax_detail.bar(
            x_axis,
            self.preds_arr_1d,
            color=["#22aa44" if gt[i] else "#dd6622" for i in range(len(self.preds_arr_1d))],
            width=1.0,
            linewidth=0,
        )
        ax_detail.set_xlabel("Sample Index")
        ax_detail.set_ylabel("Prediction")
        ax_detail.set_yticks([0, 1])
        ax_detail.set_ylim(bottom=-0.1, top=1.1)
        plt.tight_layout()
        fig.savefig(outpath, dpi=150)
        plt.close(fig)
