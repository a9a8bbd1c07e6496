"""Multi-device SPMD tests on the 8-device virtual CPU mesh: the dp train
step and the ep-sharded aggregation must match single-device references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.models import GruSage, GruSageConfig, MapData
from sldm_gnn_tpu.parallel.mesh import make_mesh
from sldm_gnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batch, shard_map_data
from sldm_gnn_tpu.parallel.edge_partition import partition_edges, make_sharded_sage_step
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.graph.csr import mean_weights, pad_nodes
from sldm_gnn_tpu.train.loop import build_step_fns, make_optimizer, TrainState


def _graphs(rng, n, F, L):
    gs = []
    for _ in range(n):
        v = int(rng.integers(3, 6))
        e = v * 2
        src = rng.integers(0, v, e).astype(np.int32)
        dst = (src + 1) % v
        gs.append(
            GraphArrays(
                x=rng.standard_normal((v, F, 6)).astype(np.float32),
                xsttype=rng.integers(0, 4, v).astype(np.int32),
                xdims=rng.standard_normal((v, 2)).astype(np.float32),
                edge_index=np.stack([src, dst]),
                edge_attr=np.zeros((e, 4), np.float32),
                y=rng.integers(0, 2, L).astype(np.float32),
                pos_raw=rng.standard_normal((v, F, 2)).astype(np.float32),
            )
        )
    return gs


@pytest.mark.parametrize(
    "with_map", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_dp_step_matches_single_device(rng, with_map):
    # The map variant runs in float64: in fp32, (Leaky)ReLU branch flips from
    # psum reorder noise produce discretely different tiny grads, which Adam's
    # normalization then amplifies — an ill-conditioned comparison, not a
    # semantics difference (verified to 1e-8 agreement in f64).
    if with_map:
        jax.config.update("jax_enable_x64", True)
    try:
        _run_dp_step_check(rng, with_map)
    finally:
        jax.config.update("jax_enable_x64", False)


def _upcast(tree):
    def f(a):
        a = np.asarray(a)
        if a.dtype == np.float32 and jax.config.jax_enable_x64:
            a = a.astype(np.float64)
        return jnp.asarray(a)

    return jax.tree.map(f, tree)


def _run_dp_step_check(rng, with_map):
    assert len(jax.devices()) == 8
    F, L, DP, EP = 6, 2, 4, 2
    mesh = make_mesh(dp=DP, ep=EP)

    dims = BatchDims(node_capacity=24, edge_capacity=48, graph_capacity=2, num_frames=F, num_labels=L)
    per_dev = [pad_and_batch(_graphs(rng, 2, F, L), dims) for _ in range(DP)]
    stacked = shard_batch(per_dev)

    S = 10
    md = MapData(
        feats=_upcast(rng.standard_normal((S, 8)).astype(np.float32)),
        lane_type_cats=jnp.asarray(rng.integers(0, 3, S).astype(np.int32)),
        edge_src=jnp.asarray(rng.integers(0, S, 21).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, S, 21).astype(np.int32)),
        centroids=_upcast(rng.standard_normal((S, 2)).astype(np.float32)),
    ) if with_map else None

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=with_map, num_lane_types=3,
        map_edge_axis="ep" if with_map else None,
    )
    model = GruSage(cfg)
    # reference single-device model: same config but no edge axis
    cfg_ref = GruSageConfig(**{**cfg.to_dict(), "map_edge_axis": None})
    model_ref = GruSage(cfg_ref)

    opt = make_optimizer(1e-3, 0.0)
    fns = build_step_fns(model_ref, opt, loss_type="bce", pos_weight=1.0, map_data=md)
    combined_dims = BatchDims(
        node_capacity=24 * DP, edge_capacity=48 * DP, graph_capacity=2 * DP,
        num_frames=F, num_labels=L,
    )
    all_graphs = []
    # rebuild the same graphs batch-by-batch for the single-device reference
    rng2 = np.random.default_rng(42)
    # instead: concatenate per-dev batches into one big batch via their arrays
    # (simpler: run the reference per dev batch and average grads)

    state = fns.init(jax.random.PRNGKey(0), _upcast(per_dev[0]))

    # single-device: mean of per-batch element-sums / total elements
    def ref_loss(params):
        total = 0.0
        n = 0.0
        for b in per_dev:
            bj = _upcast(b)
            logits = model_ref.apply({"params": params}, bj, map_data=md, train=False)
            from sldm_gnn_tpu.train.losses import bce_with_logits_pos_weight

            nb = jnp.sum(bj.graph_mask)
            lb = bce_with_logits_pos_weight(logits, bj.y, 1.0, mask=bj.graph_mask)
            total = total + lb * nb
            n = n + nb
        return total / n

    ref_grads = jax.grad(ref_loss)(state.params)

    # SPMD step with dropout disabled (cfg dropout=None) and lr tiny: check grads via loss value + one update
    step = make_dp_train_step(model, opt, mesh, loss_type="bce", pos_weight=1.0, map_data=md)
    new_state, metrics = step(state, _upcast(stacked), jax.random.PRNGKey(1))

    ref_loss_val = float(ref_loss(state.params))
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss_val, rtol=1e-5)

    # one optimizer step with the reference grads must equal the SPMD update
    import optax

    upd, _ = opt.update(ref_grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, upd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        ref_params,
        new_state.params,
    )
    assert int(metrics["n_graphs"]) == 2 * DP


def test_ep_sharded_aggregate_matches_xla(rng):
    mesh = make_mesh(dp=1, ep=8)
    n, e, d = 500, 4000, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    sf, sr, n_pad = partition_edges(src, dst, n, 8)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_sharded_sage_step(
        mesh, jax.tree.map(jnp.asarray, sf), jax.tree.map(jnp.asarray, sr),
        n_pad, use_pallas=False)
    grads_sharded, gx_sharded = step(params, x)

    w = jnp.asarray(mean_weights(dst, n_pad))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

    def ref(params, x):
        a1 = spmm_xla(x, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + x @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, gx_ref = jax.grad(ref, argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        (grads_sharded, gx_sharded),
        (grads_ref, gx_ref),
    )


def test_prefetch_to_device_sharded(rng):
    """Worker-thread device_put delivers dp-sharded, value-identical batches."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sldm_gnn_tpu.data.prefetch import prefetch_to_device

    F, L, DP = 4, 2, 8
    mesh = make_mesh(dp=DP)
    dims = BatchDims(node_capacity=8, edge_capacity=16, graph_capacity=1,
                     num_frames=F, num_labels=L)
    stacked_batches = [
        shard_batch([pad_and_batch(_graphs(rng, 1, F, L), dims) for _ in range(DP)])
        for _ in range(3)
    ]
    sh = NamedSharding(mesh, P("dp"))
    out = list(prefetch_to_device(iter(stacked_batches), depth=2, sharding=sh))
    assert len(out) == 3
    for got, want in zip(out, stacked_batches):
        leaves_g = jax.tree.leaves(got)
        leaves_w = jax.tree.leaves(want)
        for g, w in zip(leaves_g, leaves_w):
            assert g.sharding == sh
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_dp_group_prefetch_loader(rng):
    """dp_batch_groups + prefetch_to_device: a flat batch stream becomes
    mesh-sharded stacked groups (remainder padded with masked-out batches);
    driving the SPMD step from the prefetcher gives finite, identical-shape
    steps and the padded group's loss ignores the dummy batches."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sldm_gnn_tpu.data.prefetch import dp_batch_groups, prefetch_to_device

    F, L, DP = 6, 2, 4
    mesh = make_mesh(dp=DP, ep=2)
    dims = BatchDims(node_capacity=24, edge_capacity=48, graph_capacity=2,
                     num_frames=F, num_labels=L)
    # 6 batches -> one full group of 4 + one padded group (2 real + 2 dummy)
    flat = [pad_and_batch(_graphs(rng, 2, F, L), dims) for _ in range(6)]

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    model = GruSage(cfg)
    opt = make_optimizer(1e-3, 0.0)
    fns = build_step_fns(model, opt, loss_type="bce", pos_weight=1.0, map_data=None)
    state = fns.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, flat[0]))
    step = make_dp_train_step(model, opt, mesh, loss_type="bce", pos_weight=1.0)

    sharding = NamedSharding(mesh, P("dp"))
    groups = list(prefetch_to_device(dp_batch_groups(flat, DP), depth=2, sharding=sharding))
    assert len(groups) == 2
    for g in groups:
        assert g.x.shape[0] == DP
        assert g.x.sharding.is_equivalent_to(sharding, g.x.ndim)

    # padded group: dummy batches carry all-False graph_mask
    assert not np.asarray(groups[1].graph_mask[2:]).any()
    state, m0 = step(state, groups[0], jax.random.PRNGKey(1))
    assert np.isfinite(float(m0["loss"]))

    # the dp step's loss is the EXACT mean over real graphs
    # (psum(loss*n)/psum(n)) — the all-masked dummy batches contribute
    # n=0 and so don't dilute it; with equal graph counts per real shard
    # that's just the mean of the real shards' losses. The step reports
    # loss at its INCOMING params, so compute the expectation with the
    # post-step-1 params.
    from sldm_gnn_tpu.train.losses import masked_graph_loss

    per_shard = []
    for b in flat[4:6]:
        bj = jax.tree.map(jnp.asarray, b)
        logits = model.apply({"params": state.params}, bj, train=False)
        per_shard.append(float(masked_graph_loss(logits, bj.y, bj.graph_mask,
                                                 loss_type="bce", pos_weight=1.0)))
    want_padded_loss = sum(per_shard) / len(per_shard)

    state, m1 = step(state, groups[1], jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), want_padded_loss, rtol=1e-5)


def test_train_model_dp_mesh(rng, tmp_path):
    """train_model(mesh=...) runs the full loop (train/eval/best-snapshot/
    curves) through the SPMD dp step on the virtual mesh, with a batch
    count that doesn't divide dp (exercising the padded tail group)."""
    from sldm_gnn_tpu.train.loop import train_model

    F, L, DP = 6, 2, 4
    mesh = make_mesh(dp=DP, ep=2)
    dims = BatchDims(node_capacity=24, edge_capacity=48, graph_capacity=2,
                     num_frames=F, num_labels=L)
    # label-correlated features so accuracy actually moves
    gs = _graphs(rng, 12, F, L)
    gs = [GraphArrays(x=g.x + 2.0 * (g.y[0] - g.y[1]), xsttype=g.xsttype,
                      xdims=g.xdims, edge_index=g.edge_index,
                      edge_attr=g.edge_attr, y=g.y, pos_raw=g.pos_raw)
          for g in gs]
    batches = [pad_and_batch(gs[i:i + 2], dims) for i in range(0, 12, 2)]

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    model = GruSage(cfg)
    snaps = []
    state, res = train_model(
        model, lambda: iter(batches), lambda: iter(batches),
        epochs=10, lr=1e-2, weight_decay=0.0, active_labels=(0, 1),
        best_state_callback=lambda s, info: snaps.append(info["val_acc"]),
        mesh=mesh,
    )
    assert np.isfinite(res.train_loss).all() and np.isfinite(res.val_loss).all()
    assert res.total_val_acc.shape == (1, 10)
    assert snaps, "best-snapshot callback never fired"
    assert res.best_val_acc >= 0.5
    # params came back replicated over the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    # dp training must beat chance on the separable toy task
    assert res.total_val_acc[0, -1] > 0.6


def test_ep_sharded_pallas_path_traces_under_grad(rng):
    """Regression: the ep-sharded aggregation must ride spmm_apply's custom
    VJP — jax.grad through the raw pallas_call has no AD rule and failed at
    TRACE time (backend-independent). eval_shape exercises exactly that."""
    from sldm_gnn_tpu.parallel.edge_partition import sharded_mean_aggregate
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=1, ep=8)
    n, e, d = 300, 2000, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    sf, sr, n_pad = partition_edges(src, dst, n, 8)
    sf, sr = jax.tree.map(jnp.asarray, (sf, sr))
    x = jnp.zeros((n_pad, d), jnp.float32)

    specs = jax.tree.map(lambda _: P("ep"), (sf, sr))
    f = shard_map(
        lambda xx, bf, br: jnp.sum(
            sharded_mean_aggregate(xx, bf, br, n_pad, use_pallas=True)),
        mesh=mesh, in_specs=(P(), *specs), out_specs=P(),
    )
    out = jax.eval_shape(jax.grad(lambda xx: f(xx, sf, sr)), x)
    assert out.shape == (n_pad, d)


def test_dp_eval_step_matches_replicated(rng):
    """make_dp_eval_step == per-batch replicated eval: valid-graph-weighted
    loss, correct counts, n, and the dp-stacked scores/preds match the
    single-device eval_step's on the same params (incl. a padded tail
    group with all-masked dummy batches)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sldm_gnn_tpu.data.prefetch import dp_batch_groups, prefetch_to_device
    from sldm_gnn_tpu.parallel.data_parallel import make_dp_eval_step

    F, L, DP = 6, 1, 4
    mesh = make_mesh(dp=DP, ep=2)
    dims = BatchDims(node_capacity=24, edge_capacity=48, graph_capacity=2,
                     num_frames=F, num_labels=L)
    gs = _graphs(rng, 12, F, L)
    flat = [pad_and_batch(gs[i:i + 2], dims) for i in range(0, 12, 2)]

    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    model = GruSage(cfg)
    opt = make_optimizer(1e-3, 0.0)
    fns = build_step_fns(model, opt, loss_type="bce", pos_weight=1.0,
                         eval_scores=True)
    state = fns.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, flat[0]))
    dp_eval = make_dp_eval_step(model, mesh, loss_type="bce", pos_weight=1.0,
                                eval_scores=True)

    sharding = NamedSharding(mesh, P("dp"))
    params = jax.device_put(state.params, NamedSharding(mesh, P()))
    groups = list(prefetch_to_device(dp_batch_groups(iter(flat + flat[:1]), DP),
                                     depth=2, sharding=sharding))
    assert len(groups) == 2  # 7 batches -> group of 4 + padded group
    for g in groups:
        m = dp_eval(params, g)
        # reference: per-sub-batch replicated eval, weighted by n_graphs
        num = den = 0.0
        correct = np.zeros(L, np.int64)
        for i in range(DP):
            b = jax.tree.map(lambda a: np.asarray(a)[i], g)
            mr = fns.eval_step(state.params, jax.tree.map(jnp.asarray, b))
            nb = int(mr["n_graphs"])
            num += float(mr["loss"]) * nb
            den += nb
            correct += np.asarray(mr["correct"])
            np.testing.assert_allclose(np.asarray(m["scores"])[i],
                                       np.asarray(mr["scores"]),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m["loss"]), num / max(den, 1.0),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(m["correct"]), correct)
        assert int(m["n_graphs"]) == int(den)


def test_train_model_dp_mesh_single_label(rng):
    """train_model(mesh=...) with L=1: the dp-sharded eval phase feeds the
    CM/ROC-AUC stats (scores path) and the loop completes with finite
    curves."""
    from sldm_gnn_tpu.train.loop import train_model

    F, L, DP = 6, 1, 4
    mesh = make_mesh(dp=DP, ep=2)
    dims = BatchDims(node_capacity=24, edge_capacity=48, graph_capacity=2,
                     num_frames=F, num_labels=L)
    gs = _graphs(rng, 10, F, L)
    gs = [GraphArrays(x=g.x + 2.0 * (g.y[0] - 0.5), xsttype=g.xsttype,
                      xdims=g.xdims, edge_index=g.edge_index,
                      edge_attr=g.edge_attr, y=g.y, pos_raw=g.pos_raw)
          for g in gs]
    batches = [pad_and_batch(gs[i:i + 2], dims) for i in range(0, 10, 2)]
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    state, res = train_model(
        GruSage(cfg), lambda: iter(batches), lambda: iter(batches),
        epochs=6, lr=1e-2, weight_decay=0.0, active_labels=(0,), mesh=mesh,
    )
    assert np.isfinite(res.train_loss).all() and np.isfinite(res.val_loss).all()
    assert res.bin_cm is not None and res.bin_cm.sum(axis=0)[-1] == 10
    assert res.bin_rocauc is not None and np.isfinite(res.bin_rocauc).all()
    assert res.total_val_acc[0, -1] > 0.6
