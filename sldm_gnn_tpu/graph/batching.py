"""Collation of ragged graphs into fixed-capacity :class:`PaddedGraphBatch`.

Replaces PyG's ``DataLoader`` batching (reference: main.py:166-167) with a
TPU-friendly scheme: node/edge capacities are chosen once per dataset (or
bucket) so every batch compiles to the same XLA program.

Capacity policy: ``compute_batch_dims`` scans the dataset's per-graph
(V, E) sizes and returns capacities for a given batch size, rounded up to
hardware-friendly multiples (8 sublanes) with a safety factor, so one
compilation serves the whole epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from .containers import GraphArrays, PaddedGraphBatch


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


@dataclass(frozen=True)
class BatchDims:
    node_capacity: int
    edge_capacity: int
    graph_capacity: int
    num_frames: int
    num_labels: int


def compute_batch_dims(
    graphs: Sequence[GraphArrays],
    batch_size: int,
    num_labels: int,
    *,
    align: int = 8,
) -> BatchDims:
    """Pick static capacities that fit any ``batch_size`` graphs of the dataset.

    Uses sum of the top-``batch_size`` node/edge counts: an upper bound on any
    batch the loader can produce (shuffled or not), so no batch ever overflows.
    """
    if not graphs:
        raise ValueError("empty dataset")
    v = np.sort(np.array([g.num_nodes for g in graphs]))[::-1]
    e = np.sort(np.array([g.num_edges for g in graphs]))[::-1]
    k = min(batch_size, len(graphs))
    node_cap = max(int(v[:k].sum()), 1)
    edge_cap = max(int(e[:k].sum()), 1)
    return BatchDims(
        node_capacity=_round_up(node_cap, align),
        edge_capacity=_round_up(edge_cap, align),
        graph_capacity=batch_size,
        num_frames=int(graphs[0].x.shape[1]),
        num_labels=num_labels,
    )


def pad_and_batch(graphs: Sequence[GraphArrays], dims: BatchDims) -> PaddedGraphBatch:
    """Concatenate up to ``dims.graph_capacity`` graphs and pad to capacity.

    Host-side numpy; the result is a pytree of numpy arrays ready for device
    put / donation. Raises if the graphs exceed the static capacities.
    """
    G, N, E = dims.graph_capacity, dims.node_capacity, dims.edge_capacity
    F, L = dims.num_frames, dims.num_labels
    if len(graphs) > G:
        raise ValueError(f"{len(graphs)} graphs > capacity {G}")

    x = np.zeros((N, F, 6), dtype=np.float32)
    xsttype = np.zeros((N,), dtype=np.int32)
    xdims = np.zeros((N, 2), dtype=np.float32)
    pos_raw = np.zeros((N, F, 2), dtype=np.float32)
    edge_src = np.zeros((E,), dtype=np.int32)
    edge_dst = np.full((E,), N, dtype=np.int32)  # out-of-range -> dropped by segment ops
    edge_attr = np.zeros((E, 4), dtype=np.float32)
    edge_mask = np.zeros((E,), dtype=bool)
    node_mask = np.zeros((N,), dtype=bool)
    node_graph = np.full((N,), G, dtype=np.int32)  # padding -> dropped at pooling
    y = np.zeros((G, L), dtype=np.float32)
    graph_mask = np.zeros((G,), dtype=bool)

    n_off = 0
    e_off = 0
    for gi, g in enumerate(graphs):
        v, ne = g.num_nodes, g.num_edges
        if n_off + v > N or e_off + ne > E:
            raise ValueError(
                f"batch overflow: nodes {n_off + v}/{N}, edges {e_off + ne}/{E}"
            )
        x[n_off : n_off + v] = g.x
        xsttype[n_off : n_off + v] = g.xsttype
        xdims[n_off : n_off + v] = g.xdims
        pr = g.pos_raw if g.pos_raw is not None else g.x[:, :, :2]
        pos_raw[n_off : n_off + v] = pr
        if ne:
            edge_src[e_off : e_off + ne] = g.edge_index[0] + n_off
            edge_dst[e_off : e_off + ne] = g.edge_index[1] + n_off
            edge_attr[e_off : e_off + ne] = g.edge_attr
            edge_mask[e_off : e_off + ne] = True
        node_mask[n_off : n_off + v] = True
        node_graph[n_off : n_off + v] = gi
        if g.y is not None:
            y[gi] = g.y
        graph_mask[gi] = True
        n_off += v
        e_off += ne

    return PaddedGraphBatch(
        x=x,
        xsttype=xsttype,
        xdims=xdims,
        pos_raw=pos_raw,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        node_mask=node_mask,
        node_graph=node_graph,
        y=y,
        graph_mask=graph_mask,
    )


def pad_and_batch_aligned(
    graphs: Sequence[GraphArrays],
    vmax: int,
    *,
    num_frames: int,
    num_labels: int,
    graph_capacity: int | None = None,
    edge_capacity: int | None = None,
) -> PaddedGraphBatch:
    """Block-diagonal dense batch layout: graph g's nodes live at rows
    ``[g*vmax, (g+1)*vmax)`` and the batch carries ``adj [G, vmax, vmax]``
    with row-normalized mean-aggregation weights — SAGE aggregation
    becomes one batched matmul and pooling a masked reshape-reduce,
    eliminating every TPU scatter from the flagship step (each scatter
    costs ~3.4 ms fwd+bwd at batch-2048 shapes while the whole matmul
    replacement is sub-ms; BASELINE.md round 5). Edge arrays are still
    populated, so segment-op consumers keep working on the same batch.

    Raises if any graph exceeds ``vmax`` nodes."""
    G = graph_capacity if graph_capacity is not None else len(graphs)
    if len(graphs) > G:
        raise ValueError(f"{len(graphs)} graphs > capacity {G}")
    for g in graphs:
        if g.num_nodes > vmax:
            raise ValueError(f"graph with {g.num_nodes} nodes > vmax {vmax}")
    total_e = sum(g.num_edges for g in graphs)
    E = edge_capacity if edge_capacity is not None else max(
        ((total_e + 127) // 128) * 128, 128)
    N = G * vmax
    F, L = num_frames, num_labels

    x = np.zeros((N, F, 6), dtype=np.float32)
    xsttype = np.zeros((N,), dtype=np.int32)
    xdims = np.zeros((N, 2), dtype=np.float32)
    pos_raw = np.zeros((N, F, 2), dtype=np.float32)
    edge_src = np.zeros((E,), dtype=np.int32)
    edge_dst = np.full((E,), N, dtype=np.int32)
    edge_attr = np.zeros((E, 4), dtype=np.float32)
    edge_mask = np.zeros((E,), dtype=bool)
    node_mask = np.zeros((N,), dtype=bool)
    node_graph = np.full((N,), G, dtype=np.int32)
    y = np.zeros((G, L), dtype=np.float32)
    graph_mask = np.zeros((G,), dtype=bool)
    adj = np.zeros((G, vmax, vmax), dtype=np.float32)

    e_off = 0
    for gi, g in enumerate(graphs):
        v, ne = g.num_nodes, g.num_edges
        n_off = gi * vmax
        if e_off + ne > E:
            raise ValueError(f"batch overflow: edges {e_off + ne}/{E}")
        x[n_off : n_off + v] = g.x
        xsttype[n_off : n_off + v] = g.xsttype
        xdims[n_off : n_off + v] = g.xdims
        pr = g.pos_raw if g.pos_raw is not None else g.x[:, :, :2]
        pos_raw[n_off : n_off + v] = pr
        if ne:
            src_l = g.edge_index[0].astype(np.int64)
            dst_l = g.edge_index[1].astype(np.int64)
            edge_src[e_off : e_off + ne] = src_l + n_off
            edge_dst[e_off : e_off + ne] = dst_l + n_off
            edge_attr[e_off : e_off + ne] = g.edge_attr
            edge_mask[e_off : e_off + ne] = True
            np.add.at(adj, (gi, dst_l, src_l), 1.0)
        node_mask[n_off : n_off + v] = True
        node_graph[n_off : n_off + v] = gi
        if g.y is not None:
            y[gi] = g.y
        graph_mask[gi] = True
        e_off += ne
    deg = adj.sum(axis=2, keepdims=True)
    adj /= np.maximum(deg, 1.0)

    return PaddedGraphBatch(
        x=x, xsttype=xsttype, xdims=xdims, pos_raw=pos_raw,
        edge_src=edge_src, edge_dst=edge_dst, edge_attr=edge_attr,
        edge_mask=edge_mask, node_mask=node_mask, node_graph=node_graph,
        y=y, graph_mask=graph_mask, adj=adj,
    )
