"""Stream-vs-ground-truth scorer CLI
(parity: /root/reference/compare_predictions_gt.py).

Aligns ``rcv`` CSV scores with a label-parquet bitmask, applies empty-sample
("." rows) and NaN policies, optional prior-shift calibration, then emits
pack-level + event-level metrics.
"""

from __future__ import annotations

import csv
from pathlib import Path

import click
import numpy as np
import pandas as pd

from ..evals.metrics import EventMetrics, PackMetrics
from ..utils.calibration import bayes_prior_shift


def load_gt_events(gt_parquet: Path, active_label: int | None) -> np.ndarray:
    gt_df = pd.read_parquet(gt_parquet)
    missing = {"PackId", "MLBEncoded"} - set(gt_df.columns)
    if missing:
        raise click.ClickException(f"invalid GT parquet: missing columns {sorted(missing)}")
    out = []
    for value in gt_df["MLBEncoded"].tolist():
        mlb = int(value)
        if active_label is not None:
            out.append(1 if (mlb & (1 << active_label)) else 0)
        else:
            out.append(1 if mlb > 0 else 0)
    return np.array(out, np.int32)


def load_prediction_scores(pred_csv: Path, on_empty: str = "drop") -> np.ndarray:
    scores: list[float] = []
    with pred_csv.open("r", newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        if not reader.fieldnames:
            raise click.ClickException("prediction CSV has no header")
        if "Scores" in reader.fieldnames:
            field = "Scores"
        elif "Score" in reader.fieldnames:
            field = "Score"
        else:
            raise click.ClickException("prediction CSV missing Scores/Score column")
        for row in reader:
            raw = (row.get(field) or "").strip()
            if raw in {".", ""}:
                if on_empty == "drop":
                    continue
                elif on_empty == "zero":
                    scores.append(0.0)
                else:
                    raise ValueError(f"invalid on_empty: {on_empty}")
            else:
                try:
                    scores.append(float(raw))
                except ValueError:
                    scores.append(np.nan)
    return np.array(scores, np.float32)


@click.command()
@click.option("--gt-parquet", required=True, type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.option("--pred-csv", required=True, type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.option("--threshold", type=click.FloatRange(0.0, 1.0), default=0.5, show_default=True)
@click.option("--outdir", type=click.Path(file_okay=False, path_type=Path), default=None)
@click.option("-e", "--event-metrics", "with_events", is_flag=True, default=False)
@click.option("--sim-duration", type=int, default=60, show_default=True)
@click.option("--active-label", type=int, default=None)
@click.option("--calibrate-priors", is_flag=True, default=False)
@click.option("--train-prior", type=float, default=None)
@click.option("--test-prior", type=float, default=None)
@click.option("--nan-policy", type=click.Choice(["drop", "zero"]), default="zero", show_default=True)
@click.option("--gap-pred", type=int, default=5, show_default=True)
@click.option("--gap-gt", type=int, default=20, show_default=True)
@click.option("--match-tol", type=int, default=10, show_default=True)
@click.option("--on-empty", type=click.Choice(["drop", "zero"]), default="drop", show_default=True)
def main(gt_parquet, pred_csv, threshold, outdir, with_events, sim_duration, active_label,
         calibrate_priors, train_prior, test_prior, nan_policy, gap_pred, gap_gt, match_tol,
         on_empty):
    if calibrate_priors and (train_prior is None or test_prior is None):
        raise click.ClickException("--calibrate-priors requires --train-prior and --test-prior")

    outdir = outdir or Path.cwd()
    outdir.mkdir(parents=True, exist_ok=True)

    gts = load_gt_events(gt_parquet, active_label)
    scores = load_prediction_scores(pred_csv, on_empty=on_empty)

    if gts.size > scores.size:
        raise click.ClickException(
            f"GT longer than predictions (gt={gts.size}, pred={scores.size})"
        )
    if gts.size < scores.size:
        click.echo(
            f"Warning: more predictions ({scores.size}) than GT ({gts.size}); truncating."
        )
        scores = scores[: gts.size]
    click.echo(f"Loaded GT and predictions: {gts.size} samples.")

    invalid = np.isnan(scores)
    if invalid.any():
        if nan_policy == "zero":
            click.echo(f"Replacing {int(invalid.sum())} invalid scores with 0.0")
            scores = np.nan_to_num(scores, nan=0.0)
        else:
            raise click.ClickException("NaN scores present; use --nan-policy zero")

    if calibrate_priors:
        scores, ratio = bayes_prior_shift(scores, train_prior, test_prior)
        click.echo(f"Prior-shift calibration ratio: {ratio:.6f}")

    pm = PackMetrics(gt_arr_1d=gts, scr_arr_1d=scores, threshold=threshold)
    pm.printout()
    pm.save_csv(outdir, active_label)

    if with_events:
        em = EventMetrics(
            sim_duration_s=sim_duration, threshold=threshold, gt_arr_1d=gts,
            scr_arr_1d=scores, gap_pred=gap_pred, gap_gt=gap_gt, match_tol=match_tol,
        )
        em.printout()
        em.save_csv(outdir, active_label)
        em.plot_temporal_comparison(outdir / f"test_temporal_plot_lb{active_label}.png")


if __name__ == "__main__":
    main()
