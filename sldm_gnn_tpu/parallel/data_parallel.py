"""Data-parallel (+ optional edge-parallel map branch) SPMD training step.

Structure: ``jax.value_and_grad`` is taken OUTSIDE a ``shard_map``'d loss so
JAX's shard_map autodiff inserts the correct collectives automatically —
replicated parameters enter as implicit pbroadcasts whose transpose is a
psum, which is exactly the cross-shard gradient reduction; no manual grad
recombination (and none of its partial-vs-complete double-counting traps).

Per step:
  * the loader's per-device batches are stacked along a leading axis and
    sharded over mesh axis ``dp``;
  * map-graph edges (when the model's ``map_edge_axis`` is set) are padded
    and sharded over mesh axis ``ep`` — the map encoder's aggregation psums
    partial segment sums over ``ep`` (ops/segment.py);
  * each shard computes its local loss; ``pmean`` over the mesh gives the
    replicated scalar; grads/optimizer update run on replicated params.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph.containers import PaddedGraphBatch
from ..models.grusage import GruSage
from ..models.map_modules import MapData
from ..train.loop import TrainState
from ..train.losses import masked_graph_loss


def shard_batch(batches: Sequence[PaddedGraphBatch]):
    """Stack per-device batches along a new leading axis (to shard over dp)."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def shard_map_data(map_data: MapData, ep: int) -> MapData:
    """Pad + reshape the map edge arrays to [ep, Em/ep] for ep-sharding.

    Padding edges carry src=dst=S (dropped by segment ops) and mask=False.
    """
    src = np.asarray(map_data.edge_src)
    dst = np.asarray(map_data.edge_dst)
    mask = np.asarray(map_data.mask())
    S = map_data.num_segments
    em = len(src)
    em_pad = ((em + ep - 1) // ep) * ep
    pad = em_pad - em
    src = np.concatenate([src, np.full(pad, S, np.int32)])
    dst = np.concatenate([dst, np.full(pad, S, np.int32)])
    mask = np.concatenate([mask, np.zeros(pad, bool)])
    return MapData(
        feats=map_data.feats,
        lane_type_cats=map_data.lane_type_cats,
        edge_src=src.reshape(ep, -1),
        edge_dst=dst.reshape(ep, -1),
        centroids=map_data.centroids,
        edge_mask=mask.reshape(ep, -1),
    )


def _map_operands(model: GruSage, map_data: MapData | None, ep: int):
    """Shared map-branch operand prep for the dp train/eval steps:
    returns (map_shards, md_specs, edge_sharded)."""
    edge_sharded = model.cfg.map_included and model.cfg.map_edge_axis is not None
    segment_sharded = model.cfg.map_included and model.cfg.map_segment_axis is not None
    if segment_sharded:
        # fully-sharded map branch: every ShardedMapData leaf is stacked
        # over ep (segments, centroids, halo plan) — the encoder and
        # attention only ever touch their local [S/P, ...] slice
        from ..models.map_modules import ShardedMapData, shard_map_data_segments

        assert map_data is not None
        if not isinstance(map_data, ShardedMapData):
            map_data = shard_map_data_segments(map_data, ep)
        map_shards = jax.tree.map(jnp.asarray, map_data)
        md_specs = jax.tree.map(lambda _: P("ep"), map_shards)
    elif edge_sharded:
        assert map_data is not None
        map_shards = jax.tree.map(jnp.asarray, shard_map_data(map_data, ep))
        md_specs = MapData(
            feats=P(),
            lane_type_cats=P(),
            edge_src=P("ep"),
            edge_dst=P("ep"),
            centroids=P(),
            edge_mask=P("ep"),
        )
    else:
        map_shards = jax.tree.map(jnp.asarray, map_data) if map_data is not None else None
        md_specs = jax.tree.map(lambda _: P(), map_shards) if map_shards is not None else None
    return map_shards, md_specs, edge_sharded


def _local_map_slice(md, edge_sharded):
    """Per-shard view of the edge-sharded map operands (no-op otherwise)."""
    if md is None or not edge_sharded:
        return md
    return MapData(
        feats=md.feats,
        lane_type_cats=md.lane_type_cats,
        edge_src=md.edge_src[0],
        edge_dst=md.edge_dst[0],
        centroids=md.centroids,
        edge_mask=md.edge_mask[0],
    )


def make_dp_train_step(
    model: GruSage,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    loss_type: str = "bce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
    map_data: MapData | None = None,
):
    """Build a jitted SPMD train step over ``mesh`` (axes 'dp'[, 'ep']).

    Returns ``step(state, stacked_batch, rng) -> (state, metrics)`` where
    ``stacked_batch`` has a leading dp-axis (see :func:`shard_batch`).
    """
    ep = mesh.shape.get("ep", 1)
    map_shards, md_specs, edge_sharded = _map_operands(model, map_data, ep)
    batch_specs = jax.tree.map(lambda _: P("dp"), PaddedGraphBatch(*([0] * 12)))

    def per_shard_loss(params, batch_stacked, md, rng):
        batch = jax.tree.map(lambda a: a[0], batch_stacked)  # local shard
        md = _local_map_slice(md, edge_sharded)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        logits = model.apply(
            {"params": params}, batch, map_data=md, train=True, rngs={"dropout": rng}
        )
        loss = masked_graph_loss(
            logits, batch.y, batch.graph_mask,
            loss_type=loss_type, pos_weight=pos_weight,
            focal_alpha=focal_alpha, focal_gamma=focal_gamma,
        )
        # weight each shard's loss by its valid-graph count for an exact
        # global mean over real graphs; values are ep-replicated (the map
        # branch already psummed over 'ep'), so reduce over 'dp' only
        n_local = jnp.sum(batch.graph_mask.astype(jnp.float32))
        loss_sum = jax.lax.psum(loss * n_local, "dp") / jnp.maximum(
            jax.lax.psum(n_local, "dp"), 1.0
        )
        scores = jax.nn.sigmoid(logits)
        correct = jnp.sum(
            ((scores >= 0.5) == (batch.y >= 0.5)).astype(jnp.int32)
            * batch.graph_mask[:, None].astype(jnp.int32),
            axis=0,
        )
        correct = jax.lax.psum(correct, "dp")
        n = jax.lax.psum(jnp.sum(batch.graph_mask.astype(jnp.int32)), "dp")
        return loss_sum, (correct, n)

    sharded_loss = shard_map(
        per_shard_loss,
        mesh=mesh,
        in_specs=(P(), batch_specs, md_specs, P()),
        out_specs=(P(), (P(), P())),
    )

    @jax.jit
    def step(state: TrainState, batch_stacked, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: sharded_loss(p, batch_stacked, map_shards, rng), has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        correct, n = aux
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "correct": correct, "n_graphs": n},
        )

    return step


def make_dp_eval_step(
    model: GruSage,
    mesh: Mesh,
    *,
    loss_type: str = "bce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
    map_data: MapData | None = None,
    eval_scores: bool = True,
):
    """SPMD eval step over the dp mesh: each shard evaluates ONE batch of
    a dp-stacked group (same :func:`~sldm_gnn_tpu.data.prefetch.
    dp_batch_groups` layout as training, dummy tail batches all-masked),
    so eval wall-clock scales with dp instead of running replicated.

    Returns ``eval(params, stacked_batch) -> metrics`` with
    ``loss``/``correct``/``n_graphs`` as EXACT valid-graph-weighted global
    reductions (identical semantics to the train metrics) and, when
    ``eval_scores``, dp-stacked per-graph ``scores``/``preds``
    [dp, G, L] for the single-label CM/ROC-AUC curves."""
    ep = mesh.shape.get("ep", 1)
    map_shards, md_specs, edge_sharded = _map_operands(model, map_data, ep)
    batch_specs = jax.tree.map(lambda _: P("dp"), PaddedGraphBatch(*([0] * 12)))

    def per_shard_eval(params, batch_stacked, md):
        batch = jax.tree.map(lambda a: a[0], batch_stacked)
        md = _local_map_slice(md, edge_sharded)
        logits = model.apply({"params": params}, batch, map_data=md,
                             train=False)
        loss = masked_graph_loss(
            logits, batch.y, batch.graph_mask,
            loss_type=loss_type, pos_weight=pos_weight,
            focal_alpha=focal_alpha, focal_gamma=focal_gamma,
        )
        n_local = jnp.sum(batch.graph_mask.astype(jnp.float32))
        loss_g = jax.lax.psum(loss * n_local, "dp") / jnp.maximum(
            jax.lax.psum(n_local, "dp"), 1.0)
        scores = jax.nn.sigmoid(logits)
        preds = (scores >= 0.5).astype(jnp.float32)
        correct = jax.lax.psum(jnp.sum(
            (preds == batch.y).astype(jnp.int32)
            * batch.graph_mask[:, None].astype(jnp.int32), axis=0), "dp")
        n = jax.lax.psum(jnp.sum(batch.graph_mask.astype(jnp.int32)), "dp")
        if eval_scores:
            return loss_g, correct, n, scores[None], preds[None]
        return loss_g, correct, n

    out_specs = ((P(), P(), P(), P("dp"), P("dp")) if eval_scores
                 else (P(), P(), P()))
    sharded_eval = shard_map(
        per_shard_eval, mesh=mesh,
        in_specs=(P(), batch_specs, md_specs),
        out_specs=out_specs)

    @jax.jit
    def eval_step(params, batch_stacked):
        outs = sharded_eval(params, batch_stacked, map_shards)
        m = {"loss": outs[0], "correct": outs[1], "n_graphs": outs[2]}
        if eval_scores:
            m["scores"], m["preds"] = outs[3], outs[4]
        return m

    return eval_step
