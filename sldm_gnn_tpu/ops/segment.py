"""Segment reductions and masked neighborhood aggregation.

These are the XLA-native building blocks replacing the reference's
torch_scatter/PyG native kernels:

  * SAGEConv mean aggregation  (reference: src/models/blocks/sageblock.py:18,
    PyG ``SAGEConv(aggr='mean')`` — scatter-mean of source-node features
    into destination nodes).
  * ``global_mean_pool`` / ``global_max_pool`` graph readout
    (reference: src/models/grusage.py:113-122).

All functions take *static* segment counts so they are jit/pjit friendly:
out-of-range segment ids (used for padding) are dropped by XLA's
segment_sum semantics, which gives mask-free handling of padded nodes and
edges — padding rows simply carry segment id == num_segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -3.4e38  # large negative float32 sentinel for masked max


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets. Out-of-range ids drop."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Mean of ``data`` rows per segment; empty segments yield 0.

    ``weights`` (same length as data) lets callers mask padded rows.
    """
    if weights is not None:
        w = weights.astype(data.dtype)
        data = data * w[(...,) + (None,) * (data.ndim - 1)]
        counts = jax.ops.segment_sum(w, segment_ids, num_segments=num_segments)
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(data.shape[0], dtype=data.dtype), segment_ids, num_segments=num_segments
        )
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(counts, 1.0)
    return sums / denom[(...,) + (None,) * (data.ndim - 1)]


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-segment max; empty segments yield 0 (matching torch_scatter's
    ``global_max_pool`` on an empty segment never occurring in reference
    batches — we still define it as 0 for padded graphs)."""
    if mask is not None:
        data = jnp.where(mask[(...,) + (None,) * (data.ndim - 1)], data, _NEG_INF)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # segment_max returns -inf-ish for empty segments; clean up for padded graphs
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)


def masked_mean_aggregate(
    x: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    axis_name: str | None = None,
) -> jax.Array:
    """Mean-aggregate neighbor features along directed edges (SpMM).

    For each node ``i``: ``mean_{(j -> i) in E} x[j]``; nodes with no
    incoming edges get zeros. This is the exact semantics of PyG
    ``SAGEConv(aggr='mean')`` message passing used by the reference
    (src/models/blocks/sageblock.py:18: ``conv(x, edge_index)`` with
    edge_index[0]=source, edge_index[1]=destination).

    ``edge_mask`` zeroes padded edges; padded edges should also carry
    ``edge_dst == num_nodes`` so they are dropped by segment_sum, but the
    mask makes the gather side safe regardless of the padding index used.

    ``axis_name``: edge-partitioned SPMD — under ``shard_map``, each shard
    holds a slice of the edge set over replicated node features; partial
    sums and degrees are ``psum``'d over the named mesh axis before the
    divide, yielding the exact global mean (SURVEY.md §7 layer 7).
    """
    w = edge_mask.astype(x.dtype)
    msgs = x[edge_src] * w[:, None]
    sums = jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes)
    deg = jax.ops.segment_sum(w, edge_dst, num_segments=num_nodes)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        deg = jax.lax.psum(deg, axis_name)
    return sums / jnp.maximum(deg, 1.0)[:, None]


def global_mean_pool(
    x: jax.Array, node_graph: jax.Array, node_mask: jax.Array, num_graphs: int
) -> jax.Array:
    """Per-graph mean over valid nodes (reference: grusage.py:113-115)."""
    return segment_mean(x, node_graph, num_graphs, weights=node_mask.astype(x.dtype))


def global_max_pool(
    x: jax.Array, node_graph: jax.Array, node_mask: jax.Array, num_graphs: int
) -> jax.Array:
    """Per-graph max over valid nodes (reference: grusage.py:116-117)."""
    return segment_max(x, node_graph, num_graphs, mask=node_mask)


def dense_mean_pool(x: jax.Array, node_mask: jax.Array, num_graphs: int,
                    vmax: int) -> jax.Array:
    """:func:`global_mean_pool` for the block-diagonal aligned layout
    (graph g = rows [g*vmax, (g+1)*vmax)): a masked reshape-reduce with
    no scatter. Same empty-graph semantics (0)."""
    xg = x.reshape(num_graphs, vmax, x.shape[-1])
    m = node_mask.reshape(num_graphs, vmax, 1).astype(x.dtype)
    s = jnp.sum(xg * m, axis=1)
    c = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return s / c


def dense_max_pool(x: jax.Array, node_mask: jax.Array, num_graphs: int,
                   vmax: int) -> jax.Array:
    """:func:`global_max_pool` for the aligned layout; empty graphs 0."""
    xg = x.reshape(num_graphs, vmax, x.shape[-1])
    m = node_mask.reshape(num_graphs, vmax, 1)
    out = jnp.max(jnp.where(m, xg, _NEG_INF), axis=1)
    return jnp.where(out <= _NEG_INF / 2, 0.0, out)
