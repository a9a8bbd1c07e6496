"""Offline evaluation CLI (parity: /root/reference/test.py).

Loads a snapshot, rebuilds the model with baked map embeddings, runs batched
inference over a built test split with the snapshot's normalization stats,
optionally applies Bayes prior-shift calibration, and emits per-label
pack-level + event-level metrics (stdout, CSV, temporal PNG).
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from ..data.dataset import GraphDataset
from ..data.loader import GraphLoader
from ..data.transforms import Compose, CutFrames
from ..evals.metrics import EventMetrics, PackMetrics
from ..models.grusage import GruSage
from ..train.snapshot import load_snapshot
from ..utils.calibration import bayes_prior_shift
from ..utils.metadata import MetaData


def run_inference(
    snapshot: dict, gpath: Path, *, batch_size: int = 64, cut: int | None = None
) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Batched scoring of a built split. Returns (scores [N, L], gt [N, L],
    pack_ids), rows aligned with the sorted shard order (test.py:125-151)."""
    import jax
    import jax.numpy as jnp

    metadata = MetaData.load_json(gpath / "metadata.json")
    norm_stats = snapshot.get("norm_stat_dict")
    transform = Compose([CutFrames(cut)]) if cut is not None else None
    ds = GraphDataset(
        gpath,
        transform=transform,
        normalize_zscore=norm_stats is not None,
        metadata=metadata,
        zscore_mu_sigma=(norm_stats["mu"], norm_stats["sigma"]) if norm_stats else None,
    )
    if len(ds) == 0:
        raise click.ClickException(f"no graphs found in {gpath}")

    cfg = snapshot["config"]
    model = GruSage(cfg)
    map_emb = snapshot.get("map_embeddings")
    map_cent = snapshot.get("map_centroids")
    map_emb = jnp.asarray(map_emb) if map_emb is not None else None
    map_cent = jnp.asarray(map_cent) if map_cent is not None else None

    @jax.jit
    def fwd(params, batch):
        return jax.nn.sigmoid(
            model.apply(
                {"params": params},
                batch,
                map_embeddings=map_emb,
                map_centroids=map_cent,
                train=False,
            )
        )

    loader = GraphLoader(ds, batch_size, shuffle=False)
    L = cfg.out_dim
    scores_all = np.zeros((len(ds), L), np.float32)
    gt_all = np.full((len(ds), L), -1, np.int32)
    # padded batches zero-fill missing labels, so labeled-ness must be read
    # from the raw graphs: unlabeled rows stay at -1 for the caller's check
    has_label = np.array([ds.get_raw(i).y is not None for i in range(len(ds))])
    cursor = 0
    params = snapshot["params"]
    for batch in loader:
        bj = jax.tree.map(jnp.asarray, batch)
        scores = np.asarray(fwd(params, bj))
        gm = np.asarray(batch.graph_mask)
        n = int(gm.sum())
        scores_all[cursor : cursor + n] = scores[gm]
        gt_all[cursor : cursor + n] = np.asarray(batch.y)[gm].astype(np.int32)
        cursor += n
    gt_all[~has_label] = -1
    return scores_all, gt_all, ds.pack_ids


@click.command()
@click.argument("inputdir", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.argument("outdir", type=click.Path(file_okay=False, path_type=Path))
@click.option("-w", "--weights", "weights_path", required=True,
              type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.option("-b", "--batch-size", type=int, default=64, show_default=True)
@click.option("--threshold", type=float, default=0.5, show_default=True)
@click.option("--cut", type=int, default=None)
@click.option("-e", "--event-metrics", "with_events", is_flag=True, default=False)
@click.option("--sim-duration", type=int, default=60, show_default=True)
@click.option("--calibrate-priors", is_flag=True, default=False)
@click.option("--test-prior", type=float, default=None)
@click.option("--gap-pred", type=int, default=5, show_default=True)
@click.option("--gap-gt", type=int, default=20, show_default=True)
@click.option("--match-tol", type=int, default=10, show_default=True)
def main(inputdir, outdir, weights_path, batch_size, threshold, cut, with_events,
         sim_duration, calibrate_priors, test_prior, gap_pred, gap_gt, match_tol):
    if not 0.0 <= threshold <= 1.0:
        raise click.ClickException("--threshold must be in [0, 1]")
    gpath = inputdir / ".graphs"
    if not gpath.is_dir():
        raise click.ClickException(f"invalid input dir {inputdir}: missing '.graphs'")

    outdir = outdir.resolve()
    outdir.mkdir(parents=True, exist_ok=True)

    snapshot = load_snapshot(weights_path)
    metadata = MetaData.load_json(gpath / "metadata.json")
    active_labels = metadata.active_labels
    click.echo(f"Test samples dir: {inputdir}; active labels: {active_labels}")

    scores_all, gt_all, _ = run_inference(snapshot, gpath, batch_size=batch_size, cut=cut)
    if not (gt_all >= 0).all():
        raise click.ClickException("some samples lack GT labels in their graphs")

    if calibrate_priors:
        train_prior = snapshot.get("train_prior")
        if train_prior is None:
            raise click.ClickException("snapshot lacks 'train_prior' needed for calibration")
        if test_prior is None:
            pos = int((gt_all[:, 0] == 1).sum())
            neg = int((gt_all[:, 0] == 0).sum())
            test_prior = pos / (pos + neg) if pos + neg else 0.0
        click.echo(f"Calibrating priors: train={train_prior:.6f}, test={test_prior:.6f}")
        scores_all, ratio = bayes_prior_shift(scores_all, train_prior, test_prior)
        click.echo(f"  Prior ratio: {ratio:.6f}")

    for li, lb_value in enumerate(active_labels):
        gt = gt_all[:, li]
        scr = scores_all[:, li].astype(np.float32)
        pm = PackMetrics(gt_arr_1d=gt, scr_arr_1d=scr, threshold=threshold)
        pm.printout()
        pm.save_csv(outdir, lb_value)
        if with_events:
            em = EventMetrics(
                gt_arr_1d=gt, scr_arr_1d=scr, threshold=threshold,
                sim_duration_s=sim_duration, gap_pred=gap_pred, gap_gt=gap_gt,
                match_tol=match_tol,
            )
            em.printout()
            em.save_csv(outdir, lb_value)
            em.plot_temporal_comparison(outdir / f"test_temporal_plot_lb{lb_value}.png")


if __name__ == "__main__":
    main()
