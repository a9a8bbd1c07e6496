"""End-to-end F1 parity (BASELINE config 2): the full eval pipeline —
built dataset -> snapshot normalization -> padded batched inference ->
PackMetrics — must produce the same scores and F1 as the torch reference
semantics applied to the same graphs."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sldm_gnn_tpu.build.vehicle import GraphsBuilder
from sldm_gnn_tpu.cli.test import run_inference
from sldm_gnn_tpu.data.dataset import GraphDataset
from sldm_gnn_tpu.data.synthetic import make_vehicle_split
from sldm_gnn_tpu.evals.metrics import PackMetrics
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.train.snapshot import save_snapshot, load_snapshot
from sldm_gnn_tpu.utils.metadata import MetaData

from tests.torch_ref import TorchGruSage
from tests.test_model_parity import transplant


def test_eval_pipeline_f1_matches_torch(tmp_path, rng):
    # 1. build a synthetic split with the real ETL
    split = make_vehicle_split(tmp_path / "test", n_packs=12, frames_num=10,
                               max_vehicles=5, seed=21)
    GraphsBuilder(split, frames_num=10, m_radius=30.0, active_labels=[1, 2]).save()
    gpath = split / ".graphs"
    meta = MetaData.load_json(gpath / "metadata.json")

    # 2. a torch reference model + transplanted flax weights
    torch.manual_seed(7)
    tm = TorchGruSage(
        gru_hidden=16, gru_layers=2, fc1dims=(16,), sage_hdims=(16, 16),
        fc2dims=(8,), out_dim=2, emb_dim=4, negative_slope=0.1,
        pooling="double", map_included=False,
    ).eval()
    cfg = GruSageConfig(
        frames_num=10, gru_hidden_size=16, gru_num_layers=2, fc1dims=(16,),
        sage_hidden_dims=(16, 16), fc2dims=(8,), out_dim=2, emb_dim=4,
        dropout=0.25, negative_slope=0.1, global_pooling="double",
        map_included=False,
    )
    params = transplant(tm, map_included=False)

    # 3. snapshot with real norm stats; framework eval pipeline
    ds_stats = GraphDataset(gpath, normalize_zscore=True)
    mu, sigma = ds_stats.get_mu_sigma()
    snap_path = tmp_path / "snap.pkl"
    save_snapshot(snap_path, params=params, config=cfg,
                  norm_stat_dict={"mu": mu, "sigma": sigma}, train_prior=0.4)
    snapshot = load_snapshot(snap_path)
    scores_ours, gt, pack_ids = run_inference(snapshot, gpath, batch_size=5)

    # 4. torch side over the identical normalized graphs
    scores_torch = np.zeros_like(scores_ours)
    for row, idx in enumerate(range(len(ds_stats))):
        g = ds_stats.get(idx)
        with torch.no_grad():
            logits = tm(
                torch.tensor(g.x),
                torch.tensor(g.xsttype.astype(np.int64)),
                torch.tensor(g.xdims),
                torch.tensor(g.pos_raw),
                torch.tensor(g.edge_index.astype(np.int64)),
                torch.zeros(g.num_nodes, dtype=torch.long),
                1,
                None,
            )
        scores_torch[row] = torch.sigmoid(logits)[0].numpy()

    np.testing.assert_allclose(scores_ours, scores_torch, rtol=5e-4, atol=5e-5)

    # 5. downstream F1 identical per label
    for li in range(2):
        pm_a = PackMetrics(gt_arr_1d=gt[:, li], scr_arr_1d=scores_ours[:, li], threshold=0.5)
        pm_b = PackMetrics(gt_arr_1d=gt[:, li], scr_arr_1d=scores_torch[:, li], threshold=0.5)
        assert pm_a.f1_score == pm_b.f1_score
        np.testing.assert_array_equal(pm_a.conf_matrix, pm_b.conf_matrix)


def test_four_label_end_to_end(tmp_path, rng):
    """Full 4-label pipeline: build -> train briefly -> batched inference ->
    per-label metrics (the reference's full label space)."""
    from sldm_gnn_tpu.data.loader import GraphLoader
    from sldm_gnn_tpu.train.loop import train_model

    split = make_vehicle_split(tmp_path / "train", n_packs=10, frames_num=8,
                               max_vehicles=4, seed=31)
    GraphsBuilder(split, frames_num=8, m_radius=30.0,
                  active_labels=[0, 1, 2, 3]).save()
    gpath = split / ".graphs"
    ds = GraphDataset(gpath, normalize_zscore=True)
    loader = GraphLoader(ds, 5, shuffle=True)

    cfg = GruSageConfig(
        frames_num=8, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=4, emb_dim=2, dropout=None, negative_slope=0.1,
    )
    model = GruSage(cfg)
    state, res = train_model(
        model, lambda: iter(loader), lambda: iter(loader), epochs=2,
        lr=1e-3, weight_decay=0.0, active_labels=[0, 1, 2, 3],
        neg_over_pos_ratio=1.5,
    )
    assert res.per_label_val_acc.shape == (4, 2)
    assert res.bin_cm is None  # binary-only stats absent for multi-label

    mu, sigma = ds.get_mu_sigma()
    p = tmp_path / "snap4.pkl"
    save_snapshot(p, params=state.params, config=cfg,
                  norm_stat_dict={"mu": mu, "sigma": sigma})
    scores, gt, _ = run_inference(load_snapshot(p), gpath, batch_size=4)
    assert scores.shape == (10, 4) and np.isfinite(scores).all()
    assert set(np.unique(gt)) <= {0, 1}
    for li in range(4):
        pm = PackMetrics(gt_arr_1d=gt[:, li], scr_arr_1d=scores[:, li], threshold=0.5)
        assert 0.0 <= pm.accuracy <= 1.0
