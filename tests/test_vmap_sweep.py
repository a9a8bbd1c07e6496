"""Vmapped sweep: manual Adam parity with the optax chain, and lockstep
multi-combination training equivalence with independent runs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.train.loop import build_step_fns, make_optimizer
from sldm_gnn_tpu.train.vmap_sweep import (
    adam_update,
    extract_combo_params,
    train_sweep_vmapped,
)


def test_manual_adam_matches_optax_chain(rng):
    lr, wd = 3e-3, 1e-4
    w = jnp.array(rng.standard_normal(7).astype(np.float32))
    target = jnp.array(rng.standard_normal(7).astype(np.float32))
    opt = make_optimizer(lr, wd)
    st = opt.init(w)
    m = jnp.zeros_like(w)
    v = jnp.zeros_like(w)
    w2 = w
    gradf = jax.grad(lambda p: jnp.sum((p - target) ** 2))
    for count in range(1, 16):
        g = gradf(w)
        upd, st = opt.update(g, st, w)
        w = optax.apply_updates(w, upd)
        g2 = gradf(w2)
        m, v, w2 = adam_update(g2, m, v, count, w2, lr, wd)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), rtol=1e-5, atol=1e-6)


def _graphs(rng, n, F, L):
    gs = []
    for i in range(n):
        v = 4
        y = np.zeros(L, np.float32)
        y[i % L] = 1.0
        x = rng.standard_normal((v, F, 6)).astype(np.float32) * 0.1
        x[:, :, 1] += (i % L) * 1.5
        gs.append(
            GraphArrays(
                x=x,
                xsttype=np.zeros(v, np.int32),
                xdims=np.ones((v, 2), np.float32),
                edge_index=np.array([[0, 1, 2, 3], [1, 2, 3, 0]], np.int32),
                edge_attr=np.zeros((4, 4), np.float32),
                y=y,
            )
        )
    return gs


@pytest.mark.slow
def test_vmapped_sweep_trains_and_differentiates_combos(rng):
    F, L = 5, 2
    gs = _graphs(rng, 8, F, L)
    dims = BatchDims(node_capacity=32, edge_capacity=32, graph_capacity=8, num_frames=F, num_labels=L)
    batch = pad_and_batch(gs, dims)

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=2, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    model = GruSage(cfg)
    params, res = train_sweep_vmapped(
        model,
        lambda: [batch],
        lambda: [batch],
        lrs=[5e-3, 1e-5],  # fast learner vs near-frozen
        weight_decays=[0.0, 0.0],
        epochs=30,
        pos_weight=1.0,
    )
    # the fast-lr combo must learn; the tiny-lr combo must not reach it
    assert res.total_val_acc[0, -1] >= 0.9
    assert res.train_loss[0, -1] < res.train_loss[1, -1]
    p0 = extract_combo_params(params, 0)
    p1 = extract_combo_params(params, 1)
    # combos evolved differently
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), p0, p1)
    assert max(jax.tree.leaves(diffs)) > 1e-3


@pytest.mark.slow
def test_vmapped_combo_matches_sequential_step(rng):
    """One vmapped step for combo k == one optax-chain step with the same
    hyperparams, params and batch (dropout disabled)."""
    F, L = 4, 1
    gs = _graphs(rng, 4, F, L)
    dims = BatchDims(node_capacity=16, edge_capacity=16, graph_capacity=4, num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(4,), out_dim=L, emb_dim=2, dropout=None, map_included=False,
    )
    model = GruSage(cfg)
    lr, wd, pw = 2e-3, 1e-4, 1.7

    opt = make_optimizer(lr, wd)
    fns = build_step_fns(model, opt, loss_type="bce", pos_weight=pw)
    state = fns.init(jax.random.PRNGKey(0), batch)
    state2, _ = fns.train_step(state, batch, jax.random.PRNGKey(1))

    # single "vmapped" combo with identical init
    from sldm_gnn_tpu.train.vmap_sweep import adam_update
    from sldm_gnn_tpu.train.losses import masked_graph_loss

    p = state.params
    m = jax.tree.map(jnp.zeros_like, p)
    v = jax.tree.map(jnp.zeros_like, p)

    def loss_fn(p):
        logits = model.apply({"params": p}, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        return masked_graph_loss(logits, batch.y, batch.graph_mask, loss_type="bce", pos_weight=pw)

    grads = jax.grad(loss_fn)(p)
    _, _, p_new = adam_update(grads, m, v, 1, p, lr, wd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_new,
        state2.params,
    )


def test_vmap_sweep_focal_auto_alpha(rng):
    """Focal loss path with focal_alphas=None derives alpha from pos_weight."""
    F, L = 4, 1
    gs = _graphs(rng, 4, F, L)
    dims = BatchDims(node_capacity=16, edge_capacity=16, graph_capacity=4, num_frames=F, num_labels=L)
    batch = pad_and_batch(gs, dims)
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(4,), out_dim=L, emb_dim=2, dropout=None, map_included=False,
    )
    model = GruSage(cfg)
    params, res = train_sweep_vmapped(
        model, lambda: [batch], lambda: [batch],
        lrs=[1e-3, 5e-3], weight_decays=[0.0, 0.0], epochs=2,
        pos_weight=3.0, loss_type="focal", focal_alphas=None, focal_gamma=2.0,
    )
    assert np.isfinite(res.train_loss).all()
