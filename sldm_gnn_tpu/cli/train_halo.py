"""Multi-chip (node-sharded) training CLI — the config-4/5 driver.

Trains :class:`~sldm_gnn_tpu.parallel.halo_model.HaloSageClassifier` on one
large node-classification graph sharded over an ep-axis mesh, with the full
engine surface: orbax checkpoint/preemption resume, best-snapshot saving,
held-out eval split, JSONL metrics. Single-class (softmax CE) and
multi-label (BCE pos_weight / focal, micro-F1) losses.

INPUTDIR must contain ``graph.npz`` with arrays ``src, dst, x [N, D]`` and
``y`` ([N] int classes, or [N, L] multi-hot float for --loss bce/focal).

Usage:
    python -m sldm_gnn_tpu.cli.train_halo IN OUT --ep 8 --hidden 96,96 \
        --epochs 50 [--loss bce --pos-weight 3.0] [--fused-ln] [--resume]
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import numpy as np


@click.command()
@click.argument("inputdir", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.argument("outdir", type=click.Path(file_okay=False, path_type=Path))
@click.option("--ep", type=int, default=0,
              help="Mesh size (devices); 0 = all visible devices.")
@click.option("--hidden", default="96,96", show_default=True)
@click.option("--epochs", type=int, default=50, show_default=True)
@click.option("--lr", type=float, default=1e-3, show_default=True)
@click.option("--weight-decay", type=float, default=0.0, show_default=True)
@click.option("--loss", "loss_type",
              type=click.Choice(["softmax_ce", "bce", "focal"]),
              default="softmax_ce", show_default=True)
@click.option("--pos-weight", type=float, default=1.0, show_default=True)
@click.option("--focal-alpha", type=float, default=0.75, show_default=True)
@click.option("--focal-gamma", type=float, default=2.0, show_default=True)
@click.option("--dropout", type=float, default=None)
@click.option("--val-frac", type=float, default=0.1, show_default=True,
              help="Held-out node fraction for the eval split.")
@click.option("--overlap/--no-overlap", default=True, show_default=True,
              help="With --fused-ln: collective/compute-overlap layer "
                   "variants (interior kernel independent of the halo "
                   "all-to-all; parallel/halo_fused.py *_ov).")
@click.option("--fused-ln", is_flag=True, default=False,
              help="Fused-kernel halo plan (parallel/halo_fused.py): "
                   "conv+LN+act as one kernel each way per shard.")
@click.option("--backend", default="banded", show_default=True,
              help="Unfused plan backend (banded|dense|onehot).")
@click.option("--banded-k", type=int, default=8, show_default=True)
@click.option("--checkpoint-every", type=int, default=0, show_default=True,
              help="Orbax checkpoint every N epochs (0 = final only); "
                   "re-running with --resume continues from the latest.")
@click.option("--resume", is_flag=True, default=False)
@click.option("--seed", type=int, default=0, show_default=True)
def main(inputdir, outdir, ep, hidden, epochs, lr, weight_decay, loss_type,
         pos_weight, focal_alpha, focal_gamma, dropout, val_frac, overlap,
         fused_ln, backend, banded_k, checkpoint_every, resume, seed):
    import jax

    from ..parallel.halo import plan_halo_blocked
    from ..parallel.halo_fused import plan_halo_fused
    from ..parallel.halo_model import (
        HaloDims, HaloSageClassifier, train_halo_classifier)
    from ..parallel.mesh import make_mesh
    from ..train.checkpoint import CheckpointManager
    from ..utils.logging import MetricsLogger

    gpath = inputdir.resolve() / "graph.npz"
    if not gpath.exists():
        raise click.ClickException(f"expected {gpath} (src, dst, x, y)")
    data = np.load(gpath)
    src, dst, x, y = (data[k] for k in ("src", "dst", "x", "y"))
    n = len(x)
    multilabel = loss_type in ("bce", "focal")
    if multilabel and y.ndim != 2:
        raise click.ClickException("--loss bce/focal needs y [N, L] multi-hot")
    ncls = y.shape[1] if multilabel else int(y.max()) + 1

    devices = jax.devices()
    ep = ep or len(devices)
    if len(devices) < ep:
        raise click.ClickException(
            f"--ep {ep} but only {len(devices)} device(s) visible")
    mesh = make_mesh(dp=1, ep=ep, devices=devices[:ep])

    use_pallas = jax.default_backend() not in ("cpu",)
    if fused_ln:
        plan = plan_halo_fused(src, dst, n, ep, banded_k=banded_k)
    else:
        plan = plan_halo_blocked(src, dst, n, ep, backend=backend,
                                 banded_k=banded_k)
    hidden_dims = tuple(int(h) for h in hidden.split(","))
    model = HaloSageClassifier(
        hidden_dims=hidden_dims, num_classes=ncls, dims=HaloDims.of(plan),
        dropout=dropout, negative_slope=0.1, use_pallas=use_pallas,
        fused_ln=fused_ln, overlap=fused_ln and overlap)

    rng = np.random.default_rng(seed)
    val = (rng.random(n) < val_frac).astype(np.float32)
    train_mask = 1.0 - val

    outdir.mkdir(parents=True, exist_ok=True)
    mgr = None
    if checkpoint_every or resume:
        mgr = CheckpointManager(outdir / "ckpt", save_every=checkpoint_every,
                                max_to_keep=2)
        if not resume and mgr.latest_step() is not None:
            raise click.ClickException(
                f"{outdir / 'ckpt'} has checkpoints; pass --resume to "
                "continue or remove the directory")

    mlog = MetricsLogger(outdir / "metrics.jsonl")
    metric_key = "micro_f1" if multilabel else "acc"

    import pickle

    def on_best(state, info):
        with open(outdir / "HALO_best_state.pkl", "wb") as fh:
            pickle.dump({
                "params": jax.device_get(state.params),
                "hidden_dims": list(hidden_dims), "num_classes": ncls,
                "loss_type": loss_type, "epoch": info["epoch"],
                metric_key: info[metric_key],
            }, fh)
        click.echo(f"new best {metric_key}={info[metric_key]:.4f} "
                   f"@ epoch {info['epoch'] + 1}")

    def on_epoch(epoch, m):
        mlog.log({"epoch": epoch + 1, **m})
        click.echo(
            f"epoch {epoch + 1}: " +
            " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    click.echo(f"halo training: N={n} E={len(src)} ep={ep} "
               f"loss={loss_type} fused_ln={fused_ln} pallas={use_pallas}")
    state, curves = train_halo_classifier(
        model, mesh, plan, x, y, mask=train_mask, val_mask=val,
        epochs=epochs, lr=lr, weight_decay=weight_decay, seed=seed,
        loss_type=loss_type, pos_weight=pos_weight,
        focal_alpha=focal_alpha, focal_gamma=focal_gamma,
        checkpoint_manager=mgr, best_state_callback=on_best,
        epoch_callback=on_epoch)
    if mgr is not None:
        mgr.close()
    (outdir / "curves.json").write_text(json.dumps(curves, indent=1))
    click.echo(f"final val_{metric_key}="
               f"{curves[f'val_{metric_key}'][-1]:.4f} -> {outdir}")


if __name__ == "__main__":
    main()
