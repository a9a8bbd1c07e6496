"""Multi-chip training of the REAL model family (parallel/halo_model.py):
per-step loss/grad/param parity between HaloSageClassifier on the 8-device
virtual mesh and the single-device BlockedSageClassifier — same flax param
names, same SAGE math (reference sageblock.py:4-20), node-sharded execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sldm_gnn_tpu.models.blocked_sage import BlockedSageClassifier
from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate
from sldm_gnn_tpu.parallel.halo import plan_halo_blocked
from sldm_gnn_tpu.parallel.halo_model import (
    HaloDims,
    HaloSageClassifier,
    build_halo_step_fns,
    shard_node_array,
    train_halo_classifier,
)
from sldm_gnn_tpu.parallel.mesh import make_mesh
from sldm_gnn_tpu.train.loop import TrainState, make_optimizer


def local_graph(n, deg, reach, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


def single_device_reference(src, dst, n, x, y, mask, hidden, ncls, steps, lr, seed):
    """Train BlockedSageClassifier on the full graph (XLA path) with the
    same masked-CE loss; return per-step losses, final params."""
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=8, k=2)
    fwd = jax.tree.map(jnp.asarray, fwd)
    rev = jax.tree.map(jnp.asarray, rev)
    xp = jnp.asarray(np.pad(x, ((0, n_pad - n), (0, 0))))
    yp = jnp.asarray(np.pad(y, (0, n_pad - n)).astype(np.int32))
    mp = jnp.asarray(np.pad(mask, (0, n_pad - n)).astype(np.float32))

    model = BlockedSageClassifier(hidden_dims=hidden, num_classes=ncls,
                                  negative_slope=0.1, use_pallas=False)
    params = model.init({"params": jax.random.PRNGKey(seed)}, xp, fwd, rev, n_pad)["params"]

    opt = make_optimizer(lr, 0.0)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, xp, fwd, rev, n_pad)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, yp[:, None], axis=1)[:, 0]
        return jnp.sum(nll * mp) / jnp.maximum(jnp.sum(mp), 1.0)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss, g

    losses, grads0 = [], None
    for i in range(steps):
        params, opt_state, loss, g = step(params, opt_state)
        if i == 0:
            grads0 = g
        losses.append(float(loss))
    return losses, params, grads0


def make_halo_setup(src, dst, n, hidden, ncls, ep=8, dropout=None):
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16,
                             backend="banded", banded_k=2)
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    model = HaloSageClassifier(
        hidden_dims=hidden, num_classes=ncls, dims=HaloDims.of(plan),
        negative_slope=0.1, dropout=dropout, use_pallas=False,
    )
    return plan, mesh, model


@pytest.mark.slow
def test_halo_classifier_matches_single_device():
    """Loss + grads + trained params parity: the halo-sharded model vs the
    single-device BlockedSageClassifier, identical initial params, 4 Adam
    steps of full-batch node classification."""
    n, deg, d, ncls = 96, 4, 12, 3
    hidden = (16, 16)
    src, dst = local_graph(n, deg, reach=10)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n)
    mask = (rng.random(n) < 0.9).astype(np.float32)

    ref_losses, ref_params, ref_grads = single_device_reference(
        src, dst, n, x, y, mask, hidden, ncls, steps=4, lr=1e-2, seed=0)

    plan, mesh, model = make_halo_setup(src, dst, n, hidden, ncls)
    opt = make_optimizer(1e-2, 0.0)
    fns = build_halo_step_fns(model, opt, mesh, plan)
    ep = plan.send_idx.shape[0]
    x_stack = jax.device_put(shard_node_array(x, ep, plan.n_local), fns.node_sharding)
    y_stack = jax.device_put(
        shard_node_array(y.astype(np.int32), ep, plan.n_local), fns.node_sharding)
    m_stack = jax.device_put(shard_node_array(mask, ep, plan.n_local), fns.node_sharding)

    # start from the SAME initial params as the reference run (name-
    # compatible trees; steps=0 returns the untouched init)
    _, init_params, _ = single_device_reference(
        src, dst, n, x, y, mask, hidden, ncls, steps=0, lr=1e-2, seed=0)

    state = TrainState(
        params=jax.device_put(init_params, fns.repl_sharding),
        opt_state=jax.device_put(opt.init(init_params), fns.repl_sharding),
        step=jnp.zeros((), jnp.int32),
    )
    losses = []
    for i in range(4):
        state, m = fns.train_step(state, x_stack, y_stack, m_stack, jax.random.PRNGKey(9))
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    # trained params agree leaf-wise
    flat_h = jax.tree.leaves(jax.device_get(state.params))
    flat_r = jax.tree.leaves(jax.device_get(ref_params))
    for a, b in zip(flat_h, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_halo_classifier_grad_parity_first_step():
    """First-step gradients match leaf-for-leaf (tight tolerance — same f32
    math, different reduction orders across shards)."""
    n, deg, d, ncls = 64, 3, 8, 2
    hidden = (8,)
    src, dst = local_graph(n, deg, reach=8, seed=3)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n)
    mask = np.ones(n, np.float32)

    _, init_params, ref_grads = single_device_reference(
        src, dst, n, x, y, mask, hidden, ncls, steps=1, lr=1e-2, seed=0)

    plan, mesh, model = make_halo_setup(src, dst, n, hidden, ncls)
    send_idx = jnp.asarray(plan.send_idx)
    layouts = jax.tree.map(
        jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev))
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ep = plan.send_idx.shape[0]
    x_stack = jnp.asarray(shard_node_array(x, ep, plan.n_local))
    y_stack = jnp.asarray(shard_node_array(y.astype(np.int32), ep, plan.n_local))
    m_stack = jnp.asarray(shard_node_array(mask, ep, plan.n_local))

    # recover the reference's INITIAL params (steps=1 returned grads at init)
    _, init_params0, _ = single_device_reference(
        src, dst, n, x, y, mask, hidden, ncls, steps=0, lr=1e-2, seed=0)

    l_specs = jax.tree.map(lambda _: P("ep"), layouts)

    def body(params, xs, ys, ms, send, lts):
        logits = model.apply({"params": params}, xs[0], send, lts, train=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, ys[0][:, None], axis=1)[:, 0]
        num = jax.lax.psum(jnp.sum(nll * ms[0]), "ep")
        den = jax.lax.psum(jnp.sum(ms[0]), "ep")
        return num / jnp.maximum(den, 1.0)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("ep"), P("ep"), P("ep"), P("ep"), l_specs),
        out_specs=P(),
    )
    grads = jax.jit(jax.grad(lambda p: sharded(p, x_stack, y_stack, m_stack,
                                               send_idx, layouts)))(init_params0)
    for a, b in zip(jax.tree.leaves(jax.device_get(grads)),
                    jax.tree.leaves(jax.device_get(ref_grads))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_halo_classifier_loss_decreases_with_dropout():
    """End-to-end driver: training with dropout + LayerNorm + head over the
    virtual mesh runs, loss decreases, accuracy climbs above chance."""
    n, deg, d, ncls = 128, 4, 8, 2
    src, dst = local_graph(n, deg, reach=12, seed=7)
    rng = np.random.default_rng(11)
    # learnable signal: class = sign of the first feature's neighborhood mean
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64)

    plan, mesh, model = make_halo_setup(src, dst, n, (16,), ncls, dropout=0.1)
    state, curves = train_halo_classifier(
        model, mesh, plan, x, y, epochs=30, lr=5e-2, seed=0)
    assert curves["loss"][-1] < curves["loss"][0]
    assert curves["acc"][-1] > 0.8
    assert np.isfinite(curves["loss"]).all()


@pytest.mark.slow
def test_halo_classifier_checkpoint_roundtrip_to_blocked():
    """A state trained multi-chip loads into the single-device classifier
    (same param tree) and produces the same logits on the full graph."""
    n, deg, d, ncls = 64, 3, 8, 2
    src, dst = local_graph(n, deg, reach=8, seed=13)
    rng = np.random.default_rng(17)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n)

    plan, mesh, model = make_halo_setup(src, dst, n, (8,), ncls)
    state, _ = train_halo_classifier(model, mesh, plan, x, y, epochs=2, lr=1e-2)

    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=8, k=2)
    single = BlockedSageClassifier(hidden_dims=(8,), num_classes=ncls,
                                   negative_slope=0.1, use_pallas=False)
    xp = jnp.asarray(np.pad(x, ((0, n_pad - n), (0, 0))))
    logits_single = single.apply(
        {"params": jax.device_get(state.params)}, xp,
        jax.tree.map(jnp.asarray, fwd), jax.tree.map(jnp.asarray, rev), n_pad)

    # halo logits, gathered back to global order
    fns = build_halo_step_fns(model, make_optimizer(1e-3, 0.0), mesh, plan)
    ep = plan.send_idx.shape[0]
    x_stack = jnp.asarray(shard_node_array(x, ep, plan.n_local))
    send_idx = jnp.asarray(plan.send_idx)
    layouts = jax.tree.map(
        jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev))
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    l_specs = jax.tree.map(lambda _: P("ep"), layouts)
    logits_stack = shard_map(
        lambda p, xs, send, lts: model.apply({"params": p}, xs[0], send, lts)[None],
        mesh=mesh,
        in_specs=(P(), P("ep"), P("ep"), l_specs),
        out_specs=P("ep"),
    )(state.params, x_stack, send_idx, layouts)
    logits_halo = np.asarray(logits_stack).reshape(-1, ncls)[:n]
    np.testing.assert_allclose(logits_halo, np.asarray(logits_single)[:n],
                               rtol=2e-5, atol=2e-6)


def test_halo_multilabel_bce_matches_single_device():
    """Multi-label BCE(pos_weight) on the sharded trainer: first-step loss
    and grads match a single-device BlockedSageClassifier with the same
    masked BCE loss (reference loss semantics, utils.py:180-196)."""
    from sldm_gnn_tpu.train.losses import bce_with_logits_pos_weight

    n, deg, d, L = 64, 3, 8, 4
    hidden = (8,)
    src, dst = local_graph(n, deg, reach=8, seed=23)
    rng = np.random.default_rng(29)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (rng.random((n, L)) < 0.3).astype(np.float32)
    mask = np.ones(n, np.float32)
    pw = 2.5

    # single-device reference grads
    from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate

    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=8, k=2)
    fwd = jax.tree.map(jnp.asarray, fwd)
    rev = jax.tree.map(jnp.asarray, rev)
    xp = jnp.asarray(np.pad(x, ((0, n_pad - n), (0, 0))))
    yp = jnp.asarray(np.pad(y, ((0, n_pad - n), (0, 0))))
    mp = jnp.asarray(np.pad(mask, (0, n_pad - n)))
    single = BlockedSageClassifier(hidden_dims=hidden, num_classes=L,
                                   negative_slope=0.1, use_pallas=False)
    params0 = single.init({"params": jax.random.PRNGKey(0)}, xp, fwd, rev,
                          n_pad)["params"]

    def ref_loss(p):
        logits = single.apply({"params": p}, xp, fwd, rev, n_pad)
        return bce_with_logits_pos_weight(
            logits.astype(jnp.float32), yp, pw, mask=mp)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params0)

    plan, mesh, model = make_halo_setup(src, dst, n, hidden, L)
    fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan,
                              loss_type="bce", pos_weight=pw)
    ep = plan.send_idx.shape[0]
    x_stack = jnp.asarray(shard_node_array(x, ep, plan.n_local))
    y_stack = jnp.asarray(shard_node_array(y, ep, plan.n_local))
    m_stack = jnp.asarray(shard_node_array(mask, ep, plan.n_local))
    state = TrainState(params=params0,
                       opt_state=make_optimizer(1e-2, 0.0).init(params0),
                       step=jnp.zeros((), jnp.int32))
    _, m = fns.train_step(state, x_stack, y_stack, m_stack,
                          jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m["loss"]), float(ref_l),
                               rtol=1e-5, atol=1e-6)
    assert 0.0 <= float(m["micro_f1"]) <= 1.0
    assert float(m["tp"]) + float(m["fn"]) == float(y.sum())


@pytest.mark.slow
def test_halo_multilabel_trains_micro_f1():
    """End-to-end multi-label training on the sharded path: focal loss,
    held-out val split, micro-F1 climbs to reference-matching levels on a
    separable task; best-snapshot callback fires."""
    n, deg, d, L = 128, 4, 8, 3
    src, dst = local_graph(n, deg, reach=12, seed=31)
    rng = np.random.default_rng(37)
    x = rng.standard_normal((n, d)).astype(np.float32) * 0.3
    y = np.zeros((n, L), np.float32)
    for l in range(L):
        y[:, l] = (x[:, l] > 0).astype(np.float32)
    val = (np.arange(n) % 5 == 0).astype(np.float32)
    train_mask = 1.0 - val

    plan, mesh, model = make_halo_setup(src, dst, n, (16,), L)
    best = []
    state, curves = train_halo_classifier(
        model, mesh, plan, x, y, mask=train_mask, val_mask=val,
        epochs=40, lr=3e-2, loss_type="bce", pos_weight=1.0,
        best_state_callback=lambda s, info: best.append(info))
    assert curves["micro_f1"][-1] > 0.9, curves["micro_f1"][-5:]
    assert curves["val_micro_f1"][-1] > 0.85, curves["val_micro_f1"][-5:]
    assert best and best[-1]["micro_f1"] == max(b["micro_f1"] for b in best)


@pytest.mark.slow
def test_halo_trainer_checkpoint_resume(tmp_path):
    """Engine surface: an interrupted halo training run resumes from the
    orbax checkpoint and reproduces the uninterrupted run's curves."""
    from sldm_gnn_tpu.train.checkpoint import CheckpointManager

    n, deg, d = 96, 4, 8
    src, dst = local_graph(n, deg, reach=10, seed=41)
    rng = np.random.default_rng(43)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64)

    plan, mesh, model = make_halo_setup(src, dst, n, (8,), 2)
    # uninterrupted 6-epoch run
    _, full = train_halo_classifier(model, mesh, plan, x, y, epochs=6,
                                    lr=1e-2, seed=5)

    # interrupted: 3 epochs with checkpointing, then resume to 6
    mgr = CheckpointManager(tmp_path / "ck", save_every=1, async_save=False,
                            handle_signals=False)
    train_halo_classifier(model, mesh, plan, x, y, epochs=3, lr=1e-2, seed=5,
                          checkpoint_manager=mgr)
    mgr.close()
    mgr2 = CheckpointManager(tmp_path / "ck", save_every=1, async_save=False,
                             handle_signals=False)
    _, resumed = train_halo_classifier(model, mesh, plan, x, y, epochs=6,
                                       lr=1e-2, seed=5,
                                       checkpoint_manager=mgr2)
    mgr2.close()
    np.testing.assert_allclose(resumed["loss"], full["loss"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(resumed["acc"], full["acc"], rtol=1e-5)
