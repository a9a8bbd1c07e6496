"""Training-loop integration tests: optimizer parity with torch Adam,
overfitting a tiny synthetic dataset, snapshot round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import pytest

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.train.loop import make_optimizer, train_model
from sldm_gnn_tpu.train.snapshot import save_snapshot, load_snapshot


def test_optimizer_matches_torch_adam(rng):
    """optax chain == torch.optim.Adam(lr, weight_decay) on a quadratic."""
    w0 = rng.standard_normal(5).astype(np.float32)
    target = rng.standard_normal(5).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for _ in range(20):
        opt_t.zero_grad()
        ((wt - torch.tensor(target)) ** 2).sum().backward()
        opt_t.step()

    opt_j = make_optimizer(lr, wd)
    wj = jnp.array(w0.copy())
    state = opt_j.init(wj)
    gradf = jax.grad(lambda w: jnp.sum((w - jnp.array(target)) ** 2))
    for _ in range(20):
        g = gradf(wj)
        upd, state = opt_j.update(g, state, wj)
        wj = optax.apply_updates(wj, upd)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def _tiny_dataset(rng, n, F, L):
    gs = []
    for i in range(n):
        v = 4
        label = np.zeros(L, np.float32)
        label[i % L] = 1.0
        # make features correlated with label so the task is learnable
        x = rng.standard_normal((v, F, 6)).astype(np.float32) * 0.1
        x[:, :, 2] += float(i % L)  # speed channel encodes label
        src = np.array([0, 1, 2, 3], np.int32)
        dst = np.array([1, 2, 3, 0], np.int32)
        gs.append(
            GraphArrays(
                x=x,
                xsttype=np.zeros(v, np.int32),
                xdims=np.ones((v, 2), np.float32),
                edge_index=np.stack([src, dst]),
                edge_attr=np.zeros((4, 4), np.float32),
                y=label,
                pos_raw=x[:, :, :2],
            )
        )
    return gs


def test_overfit_tiny_dataset(rng):
    F, L = 6, 2
    gs = _tiny_dataset(rng, 8, F, L)
    dims = BatchDims(node_capacity=32, edge_capacity=32, graph_capacity=8, num_frames=F, num_labels=L)
    batch = pad_and_batch(gs, dims)

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=16, fc1dims=(16,), sage_hidden_dims=(16,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    model = GruSage(cfg)

    state, result = train_model(
        model,
        lambda: [batch],
        lambda: [batch],
        epochs=40,
        lr=5e-3,
        weight_decay=0.0,
        active_labels=[0, 1],
        neg_over_pos_ratio=1.0,
    )
    assert result.total_val_acc[0, -1] >= 0.9, result.total_val_acc
    assert result.train_loss[-1] < result.train_loss[0] * 0.5


def test_snapshot_roundtrip(tmp_path, rng):
    F, L = 4, 1
    gs = _tiny_dataset(rng, 2, F, L)
    dims = BatchDims(node_capacity=8, edge_capacity=8, graph_capacity=2, num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(4,), out_dim=L, emb_dim=2, dropout=None, map_included=False,
    )
    model = GruSage(cfg)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out1 = model.apply(vs, batch, train=False)

    p = tmp_path / "snap.pkl"
    save_snapshot(
        p,
        params=vs["params"],
        config=cfg,
        norm_stat_dict={"mu": {"x": np.zeros(5)}, "sigma": {"x": np.ones(5)}},
        train_prior=0.3,
        loss_info={"type": "BCEWithLogits", "pos_weight": 2.0},
    )
    snap = load_snapshot(p)
    assert snap["config"] == cfg
    assert snap["train_prior"] == 0.3
    model2 = GruSage(snap["config"])
    out2 = model2.apply({"params": snap["params"]}, batch, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
