"""Map-context modules: static map GNN encoder + KNN spatial attention.

Parity targets:
  * ``map_zscore_norm`` == MapZscoreNorm (population std over segments,
    sigma clamped >= 1e-8; /root/reference/src/models/map/mapInputNorm.py:12-18).
  * ``MapEncoder`` == lane-type embedding + SageBlock over the full map graph
    (mapencoder.py:6-38). The reference recomputes the map GNN every forward
    call during training; here the encoder is a pure function of (params,
    MapData) so XLA hoists it out of the per-step graph when inputs are
    constant, and it can be run once and "baked" for inference exactly like
    the reference's snapshot trick (grusage.py:144-149).
  * ``MapSpatialAttention`` == dense vehicle-to-centroid distances -> top-k
    nearest -> distance MLP -> softmax -> weighted sum (mapattention.py:21-56).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_topk, knn_topk_sharded
from .blocks import SageBlock


def map_zscore_norm(feats: jax.Array) -> jax.Array:
    """One-shot population z-score over segments, sigma clamped >= 1e-8."""
    mu = jnp.mean(feats, axis=0, keepdims=True)
    sigma = jnp.sqrt(jnp.mean((feats - mu) ** 2, axis=0, keepdims=True))
    sigma = jnp.maximum(sigma, 1e-8)
    return (feats - mu) / sigma


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MapData:
    """Static map graph tensors (the reference's ``vmap.pth`` payload,
    src/gbuilder.py:430), already preprocessed for the encoder:

      feats          [S, 9]  — z-scored float features (StartX, StartY, EndX,
                               EndY, SpeedLimit, Width, plus any extras)
                               concatenated with AllowLeft/AllowRight cast to
                               float (reference: mapencoder.py:9 + ctor call
                               at grusage.py:82-83).
      lane_type_cats [S] int32
      edge_src       [Em] int32
      edge_dst       [Em] int32
      edge_mask      [Em] bool — False on padding edges (edge arrays are
                     padded when sharded across an edge-parallel mesh axis)
      centroids      [S, 2]  — segment centroids for spatial attention.
      adj            [1, S, S] optional row-normalized mean-aggregation
                     adjacency (:func:`dense_map_adj`). When present the
                     encoder's SAGE aggregation runs as ONE matmul per
                     layer instead of edge scatters (the map graph is a
                     few thousand edges over S~1000 segments — the dense
                     matrix is ~4 MB and the scatter's backward is the
                     expensive part on TPU, exactly like the flagship's
                     block-diagonal batches).
    """

    feats: jax.Array
    lane_type_cats: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    centroids: jax.Array
    edge_mask: jax.Array | None = None
    adj: jax.Array | None = None

    @property
    def num_segments(self) -> int:
        return self.feats.shape[0]

    def mask(self) -> jax.Array:
        if self.edge_mask is not None:
            return self.edge_mask
        return jnp.ones(self.edge_src.shape[0], dtype=bool)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedMapData:
    """Segment-sharded map tensors + halo-exchange plan, stacked over a
    leading ep axis (built once by :func:`shard_map_data_segments`; every
    leaf is sharded with spec ``P(axis)`` so a shard_map body sees its own
    ``[1, ...]`` slice). The [S, D] embedding table, the [S, 2] centroids,
    and the [V, S] distance matrix are NEVER materialized on any device —
    the encoder aggregates with an O(boundary) halo all-to-all
    (parallel/halo.py) and the attention merges per-shard top-k candidates
    (ops/knn.knn_topk_sharded). SURVEY.md §7 hard part 5 (maps that do not
    fit replicated)."""

    feats: jax.Array           # [ep, s_local, F] z-scored local features
    lane_type_cats: jax.Array  # [ep, s_local]
    centroids: jax.Array       # [ep, s_local, 2] (padding rows pushed far)
    send_idx: jax.Array        # [ep, ep, H] halo plan (parallel/halo.py)
    src_local: jax.Array       # [ep, Em] edge sources (local + halo rows)
    dst_local: jax.Array       # [ep, Em] edge destinations (local rows)
    weight: jax.Array          # [ep, Em] 1/deg mean weights (0 on padding)

    @property
    def s_local(self) -> int:
        return self.feats.shape[-2]


def dense_map_adj(map_data: MapData) -> np.ndarray:
    """Row-normalized [1, S, S] mean-aggregation adjacency for the map
    graph (host-side, once) — multigraph edges accumulate multiplicity
    and rows divide by max(deg, 1), matching ``masked_mean_aggregate``
    and the flagship batch layout (graph/batching.pad_and_batch_aligned).
    Attach via ``replace(map_data, adj=jnp.asarray(dense_map_adj(md)))``."""
    s = map_data.num_segments
    src = np.asarray(map_data.edge_src)
    dst = np.asarray(map_data.edge_dst)
    mask = np.asarray(map_data.mask())
    src, dst = src[mask], dst[mask]
    adj = np.zeros((1, s, s), np.float32)
    np.add.at(adj, (0, dst, src), 1.0)
    deg = adj.sum(axis=2, keepdims=True)
    adj /= np.maximum(deg, 1.0)
    return adj


def shard_map_data_segments(map_data: MapData, ep: int) -> ShardedMapData:
    """Segment-shard a :class:`MapData` over ``ep`` contiguous ranges and
    build the halo-exchange plan for its edges (host-side, once). Padding
    segments (S -> ep*s_local) get far-away centroids so they never enter
    any vehicle's top-k."""
    from ..parallel.halo import plan_halo_partition

    s = map_data.num_segments
    mask = np.asarray(map_data.mask())
    src = np.asarray(map_data.edge_src)[mask].astype(np.int64)
    dst = np.asarray(map_data.edge_dst)[mask].astype(np.int64)
    plan, s_local = plan_halo_partition(src, dst, s, ep, mean=True)
    s_pad = ep * s_local

    def pad_rows(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((s_pad,) + a.shape[1:], fill, a.dtype)
        out[:s] = a
        return out.reshape((ep, s_local) + a.shape[1:])

    return ShardedMapData(
        feats=pad_rows(map_data.feats),
        lane_type_cats=pad_rows(np.asarray(map_data.lane_type_cats), 0),
        centroids=pad_rows(map_data.centroids, 1e9),
        send_idx=np.asarray(plan.send_idx),
        src_local=np.asarray(plan.src_local),
        dst_local=np.asarray(plan.dst_local),
        weight=np.asarray(plan.weight),
    )


class _HaloSageConv(nn.Module):
    """SageConv (lin_l on the mean aggregate + lin_r skip) whose mean
    aggregation is the halo-exchange path — same param names/shapes as
    :class:`~sldm_gnn_tpu.models.blocks.SageConv`, so checkpoints move
    between replicated and segment-sharded execution."""

    out_dim: int
    axis_name: str

    @nn.compact
    def __call__(self, x_local, smd: ShardedMapData):
        from ..parallel.halo import HaloPlan, halo_aggregate

        plan = HaloPlan(send_idx=smd.send_idx, src_local=smd.src_local,
                        dst_local=smd.dst_local, weight=smd.weight)
        agg = halo_aggregate(x_local, plan, smd.s_local,
                             axis_name=self.axis_name)
        out = nn.Dense(self.out_dim, use_bias=True, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, name="lin_r")(x_local)


class _HaloSageStack(nn.Module):
    """SageBlock twin over the segment-sharded map graph (conv{i} ->
    LayerNorm(1e-5) -> act -> dropout; param tree equals SageBlock's)."""

    hidden_dims: Sequence[int]
    axis_name: str
    dropout: float | None = None
    negative_slope: float | None = None

    @nn.compact
    def __call__(self, x_local, smd: ShardedMapData, *, train: bool = False):
        from .blocks import _activation

        for i, h in enumerate(self.hidden_dims):
            x_local = _HaloSageConv(h, axis_name=self.axis_name,
                                    name=f"conv{i}")(x_local, smd)
            x_local = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x_local)
            x_local = _activation(x_local, self.negative_slope)
            if self.dropout is not None:
                x_local = nn.Dropout(rate=self.dropout,
                                     deterministic=not train)(x_local)
        return x_local


class MapEncoder(nn.Module):
    num_lane_types: int
    lane_embed_dim: int = 2
    sage_hidden_dims: Sequence[int] = (8, 8)
    dropout: float | None = None
    negative_slope: float | None = None
    edge_axis: str | None = None
    # segment sharding (under shard_map): __call__ takes a ShardedMapData
    # slice and returns the LOCAL [s_local, H] embedding rows — the full
    # table never materializes. Mutually exclusive with edge_axis.
    segment_axis: str | None = None

    @property
    def out_dim(self) -> int:
        return self.sage_hidden_dims[-1]

    @nn.compact
    def __call__(self, map_data, *, train: bool = False):
        if self.segment_axis is not None:
            smd: ShardedMapData = map_data
            lane_emb = nn.Embed(self.num_lane_types, self.lane_embed_dim,
                                name="lane_embedding")(smd.lane_type_cats[0])
            x = jnp.concatenate([smd.feats[0], lane_emb], axis=1)
            return _HaloSageStack(
                self.sage_hidden_dims, axis_name=self.segment_axis,
                dropout=self.dropout, negative_slope=self.negative_slope,
                name="sage",
            )(x, map_data, train=train)
        lane_emb = nn.Embed(self.num_lane_types, self.lane_embed_dim, name="lane_embedding")(
            map_data.lane_type_cats
        )
        x = jnp.concatenate([map_data.feats, lane_emb], axis=1)
        return SageBlock(
            self.sage_hidden_dims,
            dropout=self.dropout,
            negative_slope=self.negative_slope,
            edge_axis=self.edge_axis,
            name="sage",
        )(x, map_data.edge_src, map_data.edge_dst, map_data.mask(),
          map_data.num_segments,
          # dense aggregation only in the replicated single-device form
          # (an edge-sharded mesh partitions the edge lists, not adj)
          adj=None if self.edge_axis is not None
          else getattr(map_data, "adj", None),
          train=train)


class MapSpatialAttention(nn.Module):
    """Distance-based attention over the K nearest map segments per vehicle.

    ``segment_axis``: when set (under shard_map), ``centroids`` and
    ``map_embeddings`` are the device's CONTIGUOUS segment shard and the
    KNN runs as local-top-k + k-way merge (ops/knn.knn_topk_sharded) —
    the full [V, S] distance matrix and the [S, D] embedding table are
    never replicated; results match the dense call bit-for-bit. For maps
    that do not fit one device (SURVEY.md §7 hard part 5).

    ``knn_impl``: 'topk' (XLA ``lax.top_k`` + row gather, differentiable,
    parity default) or 'pallas' — the TPU fast path, two pieces:

      * selection through ops/knn_pallas.knn_topk_pallas (the fused
        distance+select kernel; the [V, S] distance tile never leaves
        VMEM and the per-row 1000-lane sort disappears). Forward-only:
        positions and centroids are input data in training, so no
        cotangent flows through the selection; k_dists feed the
        attention MLP as primal values either way.
      * a SCATTER-FREE context combine: instead of gather + weighted
        sum (whose backward is a [V·K]-row scatter-add into the [S, D]
        embedding table — measured 1.47 of the 1.6 ms epilogue at
        batch-2048 shapes), the weights are placed into a dense
        [V, S] one-hot-weighted matrix by K static compare-selects and
        ``ctx = Wsel @ emb`` runs on the MXU; the AD transpose
        ``demb = Wselᵀ @ dctx`` is a matmul too — zero scatters, exact
        (the extra terms in the reduction are structural zeros). The
        same dense-instead-of-scatter move as the block-diagonal
        flagship batches (graph/batching.pad_and_batch_aligned)."""

    k_neighbors: int = 5
    segment_axis: str | None = None
    knn_impl: str = "topk"

    @nn.compact
    def __call__(self, vehicle_positions, centroids, map_embeddings):
        if self.segment_axis is not None:
            k_dists, idx, (gathered,) = knn_topk_sharded(
                vehicle_positions, centroids, self.k_neighbors,
                self.segment_axis, map_embeddings, impl=self.knn_impl)
        elif self.knn_impl == "pallas":
            from ..ops.knn_pallas import knn_topk_pallas

            # CPU (tests / virtual mesh) runs the same kernel under the
            # Pallas interpreter, like the GRU path (grusage.py).
            k_dists, idx = knn_topk_pallas(
                vehicle_positions, centroids, self.k_neighbors,
                interpret=jax.default_backend() != "tpu")
            gathered = None  # scatter-free combine below
        else:
            # [V, K] distances + indices of nearest segments
            k_dists, idx = knn_topk(vehicle_positions, centroids, self.k_neighbors)
            # gather the K map embeddings per vehicle: [V, K, D]
            gathered = map_embeddings[idx]
        # learned distance -> score MLP (Linear(1,16) -> ReLU -> Linear(16,1))
        h = nn.Dense(16, name="attn_fc0")(k_dists[..., None])
        h = nn.relu(h)
        scores = nn.Dense(1, name="attn_fc1")(h)[..., 0]  # [V, K]
        weights = jax.nn.softmax(scores, axis=1)[..., None]  # [V, K, 1]
        if gathered is not None:
            return jnp.sum(gathered * weights, axis=1)  # [V, D]
        # scatter-free combine: K static compare-selects place the softmax
        # weights into a dense [V, S] matrix (never a [V, K, S] tensor),
        # then one MXU matmul; backward's demb is the transpose matmul
        s = map_embeddings.shape[0]
        lane = jnp.arange(s, dtype=idx.dtype)[None, :]
        w2 = weights[..., 0]  # [V, K]
        wsel = jnp.zeros((vehicle_positions.shape[0], s), w2.dtype)
        for j in range(self.k_neighbors):
            wsel = wsel + jnp.where(lane == idx[:, j:j + 1], w2[:, j:j + 1], 0.0)
        return jax.lax.dot(wsel, map_embeddings,
                           precision=jax.lax.Precision.HIGHEST)  # [V, D]
