"""Fully-sharded map branch (GruSageConfig.map_segment_axis): the segment-
sharded encoder (halo-exchange aggregation, local [S/P, H] rows only) +
k-way-merge KNN attention reproduce the replicated model's logits/loss on
a dp×ep mesh — the flagship wiring of SURVEY.md §7 hard part 5."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays, PaddedGraphBatch
from sldm_gnn_tpu.models.grusage import GruSage, GruSageConfig
from sldm_gnn_tpu.models.map_modules import MapData, shard_map_data_segments
from sldm_gnn_tpu.parallel.data_parallel import make_dp_train_step, shard_batch
from sldm_gnn_tpu.parallel.mesh import make_mesh
from sldm_gnn_tpu.train.loop import TrainState, make_optimizer


def _graphs(rng, n, F, L):
    gs = []
    for _ in range(n):
        v = int(rng.integers(2, 5))
        e = 2 * v
        gs.append(GraphArrays(
            x=rng.standard_normal((v, F, 6)).astype(np.float32),
            xsttype=rng.integers(0, 4, v).astype(np.int64),
            xdims=np.abs(rng.standard_normal((v, 2))).astype(np.float32),
            edge_index=np.stack([rng.integers(0, v, e), rng.integers(0, v, e)]).astype(np.int64),
            edge_attr=np.zeros((e, 4), np.float32),
            y=rng.integers(0, 2, L).astype(np.float32),
            pos_raw=rng.standard_normal((v, F, 2)).astype(np.float32) * 3,
        ))
    return gs


def _map_data(rng, S=12):
    return MapData(
        feats=rng.standard_normal((S, 8)).astype(np.float32),
        lane_type_cats=rng.integers(0, 3, S).astype(np.int32),
        edge_src=rng.integers(0, S, 25).astype(np.int32),
        edge_dst=rng.integers(0, S, 25).astype(np.int32),
        centroids=(rng.standard_normal((S, 2)) * 4).astype(np.float32),
    )


def _cfg(F, L, segment_axis):
    return GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=True, num_lane_types=3, mapenc_sage_hdims=(6, 6),
        map_attention_topk=3, map_segment_axis=segment_axis,
    )


@pytest.mark.slow
def test_segment_sharded_logits_match_replicated(rng):
    """Same params, same batch: logits from the fully-sharded map branch
    (dp=4 × ep=2 mesh) equal the replicated single-device model's."""
    F, L, DP, EP = 4, 2, 4, 2
    mesh = make_mesh(dp=DP, ep=EP)
    md = _map_data(rng)
    dims = BatchDims(node_capacity=16, edge_capacity=32, graph_capacity=2,
                     num_frames=F, num_labels=L)
    per_dev = [pad_and_batch(_graphs(rng, 2, F, L), dims) for _ in range(DP)]
    stacked = shard_batch(per_dev)

    model_ref = GruSage(_cfg(F, L, None))
    md_j = jax.tree.map(jnp.asarray, md)
    params = model_ref.init({"params": jax.random.PRNGKey(0)},
                            per_dev[0], map_data=md_j)["params"]
    ref_logits = [np.asarray(model_ref.apply({"params": params}, b,
                                             map_data=md_j)) for b in per_dev]

    model = GruSage(_cfg(F, L, "ep"))
    smd = jax.tree.map(jnp.asarray, shard_map_data_segments(md, EP))
    batch_specs = jax.tree.map(lambda _: P("dp"), PaddedGraphBatch(*([0] * 12)))
    smd_specs = jax.tree.map(lambda _: P("ep"), smd)

    def body(p, bs, smd_l):
        b = jax.tree.map(lambda a: a[0], bs)
        return model.apply({"params": p}, b, map_data=smd_l)[None]

    logits_stack = shard_map(
        body, mesh=mesh,
        in_specs=(P(), batch_specs, smd_specs),
        out_specs=P("dp"),
    )(params, stacked, smd)
    got = np.asarray(logits_stack)
    for i in range(DP):
        np.testing.assert_allclose(got[i], ref_logits[i], rtol=2e-5, atol=2e-6)


def test_segment_sharded_train_step(rng):
    """make_dp_train_step with map_segment_axis: loss matches the
    replicated model's loss on identical params; one Adam step runs and
    stays finite."""
    from sldm_gnn_tpu.train.losses import masked_graph_loss

    F, L, DP, EP = 4, 2, 4, 2
    mesh = make_mesh(dp=DP, ep=EP)
    md = _map_data(rng)
    dims = BatchDims(node_capacity=16, edge_capacity=32, graph_capacity=2,
                     num_frames=F, num_labels=L)
    per_dev = [pad_and_batch(_graphs(rng, 2, F, L), dims) for _ in range(DP)]
    stacked = jax.tree.map(jnp.asarray, shard_batch(per_dev))

    model_ref = GruSage(_cfg(F, L, None))
    md_j = jax.tree.map(jnp.asarray, md)
    params = model_ref.init({"params": jax.random.PRNGKey(0)},
                            per_dev[0], map_data=md_j)["params"]

    # replicated reference loss: graph-count-weighted mean over dev batches
    tot, n = 0.0, 0.0
    for b in per_dev:
        logits = model_ref.apply({"params": params}, b, map_data=md_j)
        nb = float(np.asarray(b.graph_mask).sum())
        lb = float(masked_graph_loss(logits, b.y, jnp.asarray(b.graph_mask),
                                     loss_type="bce", pos_weight=1.0))
        tot += lb * nb
        n += nb
    ref_loss = tot / n

    model = GruSage(_cfg(F, L, "ep"))
    opt = make_optimizer(1e-3, 0.0)
    step = make_dp_train_step(model, opt, mesh, loss_type="bce",
                              pos_weight=1.0, map_data=md)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    new_state, metrics = step(state, stacked, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-5)
    for leaf in jax.tree.leaves(jax.device_get(new_state.params)):
        assert np.isfinite(leaf).all()


def test_sharded_map_data_padding_never_wins_knn(rng):
    """Padded segments (S not divisible by ep) get far centroids: the
    sharded KNN can never select them."""
    md = _map_data(rng, S=11)  # pads to 12 over ep=2
    smd = shard_map_data_segments(md, 2)
    assert smd.feats.shape == (2, 6, 8)
    cents = np.asarray(smd.centroids).reshape(-1, 2)
    assert (np.abs(cents[11]) >= 1e9).all()
