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
    """

    feats: jax.Array
    lane_type_cats: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    centroids: jax.Array
    edge_mask: jax.Array | None = None

    @property
    def num_segments(self) -> int:
        return self.feats.shape[0]

    def mask(self) -> jax.Array:
        if self.edge_mask is not None:
            return self.edge_mask
        return jnp.ones(self.edge_src.shape[0], dtype=bool)


class MapEncoder(nn.Module):
    num_lane_types: int
    lane_embed_dim: int = 2
    sage_hidden_dims: Sequence[int] = (8, 8)
    dropout: float | None = None
    negative_slope: float | None = None
    edge_axis: str | None = None

    @property
    def out_dim(self) -> int:
        return self.sage_hidden_dims[-1]

    @nn.compact
    def __call__(self, map_data: MapData, *, train: bool = False):
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
        )(x, map_data.edge_src, map_data.edge_dst, map_data.mask(), map_data.num_segments, train=train)


class MapSpatialAttention(nn.Module):
    """Distance-based attention over the K nearest map segments per vehicle.

    ``segment_axis``: when set (under shard_map), ``centroids`` and
    ``map_embeddings`` are the device's CONTIGUOUS segment shard and the
    KNN runs as local-top-k + k-way merge (ops/knn.knn_topk_sharded) —
    the full [V, S] distance matrix and the [S, D] embedding table are
    never replicated; results match the dense call bit-for-bit. For maps
    that do not fit one device (SURVEY.md §7 hard part 5)."""

    k_neighbors: int = 5
    segment_axis: str | None = None

    @nn.compact
    def __call__(self, vehicle_positions, centroids, map_embeddings):
        if self.segment_axis is not None:
            k_dists, idx, (gathered,) = knn_topk_sharded(
                vehicle_positions, centroids, self.k_neighbors,
                self.segment_axis, map_embeddings)
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
        return jnp.sum(gathered * weights, axis=1)  # [V, D]
