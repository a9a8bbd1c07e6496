"""Param-sweep training driver CLI (parity: /root/reference/main.py).

Runs the cartesian grid of ``GRUSAGE_PARAMS_DICT`` combinations, each with:
transforms -> datasets (shared precomputed mu/sigma) -> loaders -> GruSage
-> jitted training with best-val-accuracy snapshotting -> accuracy plot.

The reference spawns process pools sharing one GPU (main.py:277-342); on
TPU, combinations run sequentially — each already saturates the chip with a
fully jitted step — so the sweep engine is the same but the scheduling is
simpler. Resumable config-dir numbering is preserved (main.py:240-250).
"""

from __future__ import annotations

import re
from pathlib import Path

import click
import numpy as np

from ..build.map_builder import load_map_data
from ..data.dataset import GraphDataset
from ..data.loader import GraphLoader
from ..data.transforms import AddNoise, Compose, CutFrames
from ..models.grusage import GruSage, GruSageConfig
from ..train.loop import train_model
from ..train.plots import plot_accuracies
from ..train.snapshot import save_snapshot
from ..train.sweep import ParamSweepContext
from ..utils.metadata import MetaData

GRUSAGE_PARAMS_DICT = {
    "epochs": [200],
    "batch_size": [32],
    "lr": [1e-3],
    "weight_decay": [5e-5],
    "tf_pos_noise": [True],
    "pos_noise_std": [0.2],
    "pos_noise_std_max": [0.2],
    "pos_noise_prop_to_speed": [True],
    "focal_gamma": [0.0],
    "focal_alpha": [None],
    "emb_dim": [8],
    "num_possible_station_types": [256],
    "gs_dropout": [0.25],
    "gs_neg_slope": [0.1],
    "gs_hidden_size": [96],
    "gs_gru_hidden_size": (lambda hs: hs, "gs_hidden_size"),
    "gs_gru_num_layers": [1],
    "gs_fc1_dims": (lambda hs: [hs], "gs_hidden_size"),
    "gs_sage_hidden_dims": (lambda hs: [hs, hs], "gs_hidden_size"),
    "gs_pooling": ["double"],
    "gs_fc2_dims": (lambda hs: [hs // 3], "gs_hidden_size"),
    "gs_map_hidden_size": [32],
    "gs_mapenc_lane_embdim": (lambda mhs: mhs // 4, "gs_map_hidden_size"),
    "gs_mapenc_sage_hdims": (lambda mhs: [mhs, mhs], "gs_map_hidden_size"),
    "gs_map_attention_topk": [5],
}


def config_from_combo(comb: dict, meta: MetaData, *, include_map: bool, num_lane_types: int) -> GruSageConfig:
    return GruSageConfig(
        dynamic_features_num=meta.n_node_temporal_features,
        frames_num=meta.frames_num,
        gru_hidden_size=comb["gs_gru_hidden_size"],
        gru_num_layers=comb["gs_gru_num_layers"],
        fc1dims=tuple(comb["gs_fc1_dims"]),
        sage_hidden_dims=tuple(comb["gs_sage_hidden_dims"]),
        fc2dims=tuple(comb["gs_fc2_dims"]),
        out_dim=len(meta.active_labels),
        num_st_types=comb["num_possible_station_types"],
        emb_dim=comb["emb_dim"],
        dropout=comb["gs_dropout"],
        negative_slope=comb["gs_neg_slope"],
        global_pooling=comb["gs_pooling"],
        map_included=include_map,
        num_lane_types=num_lane_types,
        mapenc_sage_hdims=tuple(comb["gs_mapenc_sage_hdims"]),
        mapenc_lane_embdim=comb["gs_mapenc_lane_embdim"],
        map_attention_topk=comb["gs_map_attention_topk"],
        # optional fast-path knobs (absent from the reference grid; the
        # parity defaults apply when a combo dict omits them)
        gru_impl=comb.get("gs_gru_impl", "scan"),
        knn_impl=comb.get("gs_knn_impl", "topk"),
    )


def _build_data_pipeline(comb: dict, *, inputdir: Path, cut: int | None,
                         include_map: bool, mu_sigma, seed: int = 0,
                         dense_adj: bool = False):
    """Shared transforms/datasets/loaders/map setup for sequential and
    vmapped sweep paths."""
    inpath = inputdir.resolve()
    tr_gpath = inpath / "train" / ".graphs"
    ev_gpath = inpath / "eval" / ".graphs"
    tr_meta = MetaData.load_json(tr_gpath / "metadata.json")
    ev_meta = MetaData.load_json(ev_gpath / "metadata.json")

    tfs = []
    if comb.get("tf_pos_noise"):
        prop = comb.get("pos_noise_prop_to_speed")
        std = comb["pos_noise_std_max"] if prop else comb["pos_noise_std"]
        tfs.append(AddNoise("pos", std, tr_meta, prop_to_speed=prop))
    if cut is not None:
        tfs.append(CutFrames(cut))
    transform = Compose(tfs) if tfs else None

    d_train = GraphDataset(tr_gpath, transform=transform, normalize_zscore=True,
                           metadata=tr_meta, zscore_mu_sigma=mu_sigma)
    d_eval = GraphDataset(ev_gpath, transform=transform, normalize_zscore=True,
                          metadata=ev_meta, zscore_mu_sigma=mu_sigma)
    lt = GraphLoader(d_train, comb["batch_size"], shuffle=True, seed=seed,
                     dense_adj=dense_adj)
    le = GraphLoader(d_eval, comb["batch_size"], shuffle=True, seed=seed,
                     dense_adj=dense_adj)

    map_data = None
    num_lane_types = 8
    if include_map:
        map_data = load_map_data(inpath / ".map" / "vmap.npz")
        num_lane_types = int(np.asarray(map_data.lane_type_cats).max()) + 1
        if dense_adj:
            # --dense-batches extends to the map encoder: scatter-free
            # SAGE over the [1, S, S] row-normalized map adjacency
            from dataclasses import replace

            import jax.numpy as jnp

            from ..models.map_modules import dense_map_adj

            map_data = replace(map_data, adj=jnp.asarray(dense_map_adj(map_data)))
    return tr_meta, lt, le, map_data, num_lane_types


def train_combination(
    i: int,
    comb: dict,
    *,
    inputdir: Path,
    cfgdir: Path,
    lbnum: int,
    cut: int | None,
    include_map: bool,
    mu_sigma,
    quiet: bool = False,
    epochs_override: int | None = None,
    checkpoints: bool = False,
    dp: int = 0,
    dense_adj: bool = False,
):
    tr_meta, lt, le, map_data, num_lane_types = _build_data_pipeline(
        comb, inputdir=inputdir, cut=cut, include_map=include_map,
        mu_sigma=mu_sigma, seed=i, dense_adj=dense_adj,
    )

    meta_for_cfg = tr_meta if cut is None else MetaData(
        n_samples=tr_meta.n_samples, n_positive=tr_meta.n_positive,
        n_edge_features=tr_meta.n_edge_features, frames_num=cut,
        m_radius=tr_meta.m_radius, active_labels=tr_meta.active_labels,
    )
    cfg = config_from_combo(comb, meta_for_cfg, include_map=include_map, num_lane_types=num_lane_types)
    model = GruSage(cfg)

    fbase = f"GRUSAGE_{'MAP_' if include_map else ''}"
    state_path = cfgdir / f"{fbase}_best_state.pkl"
    mu_sigma_dict = {"mu": mu_sigma[0], "sigma": mu_sigma[1]}
    train_prior = (tr_meta.n_positive or 0) / tr_meta.n_samples

    def on_best(state, info):
        baked_emb = baked_cent = None
        if include_map:
            baked_emb = np.asarray(
                model.apply({"params": state.params}, map_data, method=GruSage.encode_map)
            )
            baked_cent = np.asarray(map_data.centroids)
        save_snapshot(
            state_path,
            params=state.params,
            config=cfg,
            norm_stat_dict=mu_sigma_dict,
            train_prior=train_prior,
            loss_info=info.get("loss_info"),
            map_embeddings=baked_emb,
            map_centroids=baked_cent,
        )
        if not quiet:
            click.echo(f"New best snapshot @ val acc {info['val_acc']:.4f} -> {state_path}")

    from ..utils.logging import MetricsLogger

    mlog = MetricsLogger(cfgdir / "metrics.jsonl", context={"combo": i + 1})

    def on_epoch(epoch, m):
        mlog.log({"epoch": epoch + 1, **m})
        if not quiet:
            click.echo(
                f"[combo {i + 1}] epoch {epoch + 1}: tr_acc={m['train_acc']:.4f} "
                f"vl_acc={m['val_acc']:.4f} tr_loss={m['train_loss']:.4f} vl_loss={m['val_loss']:.4f}"
            )

    ckpt_mgr = None
    if checkpoints:
        from ..train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfgdir / "ckpt", save_every=0, max_to_keep=2)

    mesh = None
    if dp and dp > 1:
        import jax

        from ..parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < dp:
            raise click.ClickException(
                f"--dp {dp} requested but only {len(devices)} device(s) visible"
            )
        mesh = make_mesh(dp=dp, devices=devices[:dp])
        if not quiet:
            click.echo(f"Data-parallel SPMD over {dp} devices")

    state, result = train_model(
        model,
        lambda: iter(lt),
        lambda: iter(le),
        epochs=epochs_override or comb["epochs"],
        lr=comb["lr"],
        weight_decay=comb["weight_decay"],
        active_labels=tr_meta.active_labels,
        neg_over_pos_ratio=tr_meta.neg_over_pos_ratio(),
        focal_alpha=comb.get("focal_alpha"),
        focal_gamma=comb.get("focal_gamma") or 0.0,
        map_data=map_data,
        seed=i,
        best_state_callback=on_best,
        epoch_callback=on_epoch,
        checkpoint_manager=ckpt_mgr,
        mesh=mesh,
    )
    if ckpt_mgr is not None:
        ckpt_mgr.close()

    params_text = "\n".join(f"{k}: {v}" for k, v in sorted(comb.items()))
    plot_accuracies(result, cfgdir / f"{fbase}_trev_plot.png", label_num=lbnum, params_text=params_text)
    return state, result


@click.command()
@click.argument("inputdir", type=click.Path(exists=True, file_okay=False, path_type=Path))
@click.argument("outdir", type=click.Path(file_okay=False, path_type=Path))
@click.option("-l", "--label-num", "lbnum", type=int, required=True)
@click.option("--cut", type=int, default=None, help="Truncate frames for early prediction.")
@click.option("--include-map", is_flag=True, default=False)
@click.option("--epochs", "epochs_override", type=int, default=None,
              help="Override the grid's epoch count (smoke runs).")
@click.option("--vmap-sweep", is_flag=True, default=False,
              help="Train all combinations in lockstep with jax.vmap when they "
                   "share the architecture and differ only in lr/weight_decay "
                   "(the TPU replacement for the reference's process pools).")
@click.option("--checkpoints", is_flag=True, default=False,
              help="Per-epoch orbax TrainState checkpoints under each config "
                   "dir; re-running resumes from the latest step (crash "
                   "recovery for long runs).")
@click.option("--dp", type=int, default=0,
              help="Data-parallel SPMD training over N devices (shard_map "
                   "over a 'dp' mesh with AD-inserted gradient psums); "
                   "0/1 = single device.")
@click.option("--sampled", is_flag=True, default=False,
              help="Config-3 mode: neighbor-sampled mini-batch node "
                   "classification on ONE large graph (the PyG "
                   "NeighborLoader replacement, train/sampled_loop.py). "
                   "INPUTDIR must contain graph.npz with arrays src, dst, "
                   "x [N, D], y [N]; the sweep grid is bypassed.")
@click.option("--fanouts", default="25,10", show_default=True,
              help="Per-layer neighbor fanouts for --sampled (outermost "
                   "first, BASELINE config 3 default).")
@click.option("--sampled-batch-size", type=int, default=1024, show_default=True,
              help="Seed batch size for --sampled.")
@click.option("--sampled-hidden", default="96,96", show_default=True,
              help="Hidden dims for --sampled (matches the fanout depth).")
@click.option("--sampled-lr", type=float, default=1e-3, show_default=True,
              help="Learning rate for --sampled.")
@click.option("--sampled-wd", type=float, default=5e-5, show_default=True,
              help="Weight decay for --sampled.")
@click.option("--sampled-scan", type=int, default=0, show_default=True,
              help="Scan-batch H pre-sampled trees per jitted call "
                   "(lax.scan) — amortizes per-batch dispatch; 0 = off.")
@click.option("--sampled-device", is_flag=True, default=False,
              help="Sample the fanout tree ON DEVICE (CSR resident on "
                   "device; only seed ids cross the host boundary — 4.7x "
                   "measured over the host sampler on the remote chip).")
@click.option("--dense-batches", is_flag=True, default=False,
              help="Block-diagonal dense-adjacency batches: scatter-free "
                   "SAGE aggregation + pooling (3x faster flagship steps "
                   "on TPU at large batch; logits match the flat layout "
                   "to 2e-5). Applies to the full-batch sweep path.")
@click.option("--sampled-dense", is_flag=True, default=False,
              help="Dense [N, deg_cap+1] neighbor-table sampling (row "
                   "gathers + vectorized slot select; 3.9x the CSR "
                   "sampler's sample phase on TPU). Implies "
                   "--sampled-device.")
@click.option("--sampled-dp", type=int, default=0,
              help="Shard device-sampled seed batches over N devices "
                   "(dp mesh, psum'd grads, exact metrics); requires "
                   "--sampled-device and batch divisible by N.")
@click.option("--sample-mode", default="uniform", show_default=True,
              type=click.Choice(["uniform", "uniform_norep"]),
              help="Neighbor sampling semantics: uniform WITH replacement "
                   "(GraphSAGE default) or WITHOUT replacement (PyG "
                   "NeighborLoader parity: min(f, deg) distinct "
                   "neighbors, surplus slots masked).")
@click.option("-y", "--yes", is_flag=True, default=False, help="Skip the confirmation prompt.")
def main(inputdir, outdir, lbnum, cut, include_map, epochs_override, vmap_sweep,
         checkpoints, dp, dense_batches, sampled, fanouts,
         sampled_batch_size, sampled_hidden,
         sampled_lr, sampled_wd, sampled_scan, sampled_device,
         sampled_dense, sampled_dp, sample_mode, yes):
    if sampled:
        return _run_sampled(
            inputdir, outdir,
            fanouts=tuple(int(f) for f in fanouts.split(",")),
            batch_size=sampled_batch_size,
            hidden_dims=tuple(int(h) for h in sampled_hidden.split(",")),
            epochs=epochs_override or 5,
            lr=sampled_lr, weight_decay=sampled_wd,
            scan_batches=sampled_scan,
            device_sample=sampled_device or sampled_dense,
            sample_mode=sample_mode, dp=sampled_dp,
            dense_table=sampled_dense,
        )
    psc = ParamSweepContext(GRUSAGE_PARAMS_DICT)
    click.echo(f"TOT_COMBINATIONS={len(psc)}")
    if not yes and not click.confirm("Train all combinations?", default=True):
        return

    # resumable config-dir numbering
    max_idx = -1
    if outdir.exists():
        for sub in outdir.iterdir():
            m = re.match(r"config(\d+)", sub.name)
            if sub.is_dir() and m:
                max_idx = max(max_idx, int(m.group(1)))
    click.echo(f"Existing config dirs up to index {max_idx}; new configs start at {max_idx + 1}")

    # shared mu/sigma computed once on raw data (independent of swept params)
    tr_gpath = inputdir.resolve() / "train" / ".graphs"
    tr_meta = MetaData.load_json(tr_gpath / "metadata.json")
    click.echo("Precomputing dataset mu/sigma (shared across combinations)")
    mu_sigma = GraphDataset(tr_gpath, normalize_zscore=True, metadata=tr_meta).get_mu_sigma()

    combos = list(psc.combinations())

    if vmap_sweep and len(combos) > 1:
        arch_keys = [
            {k: v for k, v in c.items() if k not in ("lr", "weight_decay")} for c in combos
        ]
        if all(a == arch_keys[0] for a in arch_keys):
            return _run_vmap_sweep(
                combos, inputdir=inputdir, outdir=outdir, lbnum=lbnum, cut=cut,
                include_map=include_map, mu_sigma=mu_sigma, max_idx=max_idx,
                epochs_override=epochs_override,
            )
        click.echo("--vmap-sweep: combinations differ in architecture; falling back to sequential")

    for i, comb in enumerate(combos):
        cfgdir = outdir / f"config{i + max_idx + 1:02d}"
        cfgdir.mkdir(parents=True, exist_ok=True)
        click.echo(f"=== combination {i + 1}/{len(psc)} -> {cfgdir}")
        try:
            train_combination(
                i, comb, inputdir=inputdir, cfgdir=cfgdir, lbnum=lbnum, cut=cut,
                include_map=include_map, mu_sigma=mu_sigma, epochs_override=epochs_override,
                checkpoints=checkpoints, dp=dp, dense_adj=dense_batches,
            )
        except Exception as e:  # sweep continues on per-combination failure (main.py:217-222)
            import traceback

            click.echo(f"Combination {i + 1} FAILED: {e}")
            click.echo(traceback.format_exc())


def _run_sampled(inputdir: Path, outdir: Path, *, fanouts, batch_size,
                 hidden_dims, epochs, lr: float = 1e-3,
                 weight_decay: float = 5e-5, scan_batches: int = 0,
                 device_sample: bool = False, sample_mode: str = "uniform",
                 dp: int = 0, dense_table: bool = False):
    """Config-3 driver: fanout-sampled mini-batch training on one large
    node-classification graph (replaces the reference's PyG NeighborLoader
    native sampler, /root/reference/install_dependencies.sh:10)."""
    import json as _json
    import pickle

    import jax

    from ..train.sampled_loop import train_sampled_classifier

    gpath = inputdir.resolve() / "graph.npz"
    if not gpath.exists():
        raise click.ClickException(f"--sampled expects {gpath} (src, dst, x, y)")
    data = np.load(gpath)
    for key in ("src", "dst", "x", "y"):
        if key not in data:
            raise click.ClickException(f"graph.npz missing array {key!r}")
    src, dst, x, y = data["src"], data["dst"], data["x"], data["y"]
    if len(hidden_dims) != len(fanouts):
        raise click.ClickException(
            f"--sampled-hidden depth {len(hidden_dims)} must match "
            f"--fanouts depth {len(fanouts)}")
    click.echo(
        f"Sampled training: N={len(x)} E={len(src)} fanouts={list(fanouts)} "
        f"batch={batch_size} epochs={epochs}")
    state, res = train_sampled_classifier(
        src, dst, len(x), x, y, hidden_dims=hidden_dims, fanouts=fanouts,
        batch_size=batch_size, epochs=epochs, lr=lr,
        weight_decay=weight_decay, scan_batches=scan_batches,
        device_sample=device_sample, sample_mode=sample_mode, dp=dp,
        dense_table=dense_table)
    outdir.mkdir(parents=True, exist_ok=True)
    with open(outdir / "SAMPLED_state.pkl", "wb") as fh:
        pickle.dump({
            "params": jax.device_get(state.params),
            "fanouts": list(fanouts), "hidden_dims": list(hidden_dims),
            "num_classes": int(np.asarray(y).max()) + 1,
        }, fh)
    metrics = {
        "train_loss": res.train_loss.tolist(),
        "val_acc": res.val_acc.tolist(),
        "seeds_per_s": res.seeds_per_s,
        "sampled_edges_per_s": res.sampled_edges_per_s,
    }
    (outdir / "sampled_metrics.json").write_text(_json.dumps(metrics, indent=1))
    click.echo(
        f"val acc {res.val_acc[-1]:.4f}; {res.seeds_per_s:.1f} seeds/s "
        f"({res.sampled_edges_per_s:.3g} sampled edges/s) -> {outdir}")
    return state, res


def _run_vmap_sweep(combos, *, inputdir, outdir, lbnum, cut, include_map, mu_sigma,
                    max_idx, epochs_override):
    from .train import config_from_combo  # self-import safe under click
    from ..train.vmap_sweep import extract_combo_params, train_sweep_vmapped

    comb0 = combos[0]
    tr_meta, lt, le, map_data, num_lane_types = _build_data_pipeline(
        comb0, inputdir=inputdir, cut=cut, include_map=include_map, mu_sigma=mu_sigma
    )
    meta_for_cfg = tr_meta if cut is None else MetaData(
        n_samples=tr_meta.n_samples, n_positive=tr_meta.n_positive,
        n_edge_features=tr_meta.n_edge_features, frames_num=cut,
        m_radius=tr_meta.m_radius, active_labels=tr_meta.active_labels,
    )

    cfg = config_from_combo(comb0, meta_for_cfg, include_map=include_map,
                            num_lane_types=num_lane_types)
    model = GruSage(cfg)
    click.echo(f"vmap sweep over {len(combos)} combinations (lr/weight_decay axes)")
    params, res = train_sweep_vmapped(
        model,
        lambda: iter(lt),
        lambda: iter(le),
        lrs=[c["lr"] for c in combos],
        weight_decays=[c["weight_decay"] for c in combos],
        epochs=epochs_override or comb0["epochs"],
        pos_weight=float(tr_meta.neg_over_pos_ratio()),
        map_data=map_data,
    )
    train_prior = (tr_meta.n_positive or 0) / tr_meta.n_samples
    for i, comb in enumerate(combos):
        cfgdir = outdir / f"config{i + max_idx + 1:02d}"
        cfgdir.mkdir(parents=True, exist_ok=True)
        pk = extract_combo_params(params, i)
        baked_emb = baked_cent = None
        if include_map:
            baked_emb = np.asarray(model.apply({"params": pk}, map_data, method=GruSage.encode_map))
            baked_cent = np.asarray(map_data.centroids)
        save_snapshot(
            cfgdir / f"GRUSAGE_{'MAP_' if include_map else ''}_best_state.pkl",
            params=pk, config=cfg,
            norm_stat_dict={"mu": mu_sigma[0], "sigma": mu_sigma[1]},
            train_prior=train_prior,
            loss_info={"type": "BCEWithLogits", "pos_weight": float(tr_meta.neg_over_pos_ratio())},
            map_embeddings=baked_emb, map_centroids=baked_cent,
        )
        click.echo(
            f"combo {i + 1}: lr={comb['lr']} wd={comb['weight_decay']} "
            f"best val acc={res.best_val_acc[i]:.4f} -> {cfgdir}"
        )


if __name__ == "__main__":
    main()
