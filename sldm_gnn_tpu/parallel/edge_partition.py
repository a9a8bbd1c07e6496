"""Edge-partitioned SPMD aggregation for large graphs (BASELINE configs 4-5).

The scale-out story of the framework: one big graph's edge set is split
across the ``ep`` mesh axis; each device runs the blocked Pallas SpMM over
its local chunks (node features replicated), and a single ``psum`` over ICI
combines the partial segment sums — mathematically exact for sum/mean
aggregation. Edges are partitioned by contiguous dst-block ranges so each
device writes a disjoint row range (the psum then mostly moves zeros and
XLA can elide work; a reduce-scatter layout is the natural next step).

``jax.grad`` through the shard_map'd aggregate is exact: the backward of
psum + the implicit pbroadcast transpose of replicated inputs reproduce the
reverse-edge aggregation across shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph.csr import BlockedEdges, TILE, block_edges, mean_weights, pad_nodes
from ..ops.spmm import spmm_pallas, _spmm_dispatch


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    ep: int,
    *,
    weight: np.ndarray | None = None,
    mean: bool = True,
) -> tuple[BlockedEdges, int]:
    """Split an edge list into ``ep`` blocked shards (stacked leading axis).

    Returns (stacked BlockedEdges with arrays [ep, W_max, ...], padded N).
    Partitioning is by contiguous dst ranges (locality-preserving); mean
    weights use the *global* degree so the psum of partials is the exact
    global mean.
    """
    n_pad = pad_nodes(num_nodes)
    if weight is None:
        weight = (
            mean_weights(dst, n_pad) if mean else np.ones(len(src), np.float32)
        )

    # contiguous dst ranges per shard
    order = np.argsort(dst, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], weight[order]
    bounds = np.linspace(0, len(src), ep + 1).astype(np.int64)

    shards = []
    for p in range(ep):
        sl = slice(bounds[p], bounds[p + 1])
        shards.append(block_edges(src_s[sl], dst_s[sl], n_pad, weight=w_s[sl]))

    w_max = max(s.num_chunks for s in shards)

    def pad_shard(s: BlockedEdges) -> BlockedEdges:
        padn = w_max - s.num_chunks
        if padn == 0:
            return s
        last_dst = int(np.asarray(s.block_meta)[-1, 0])
        ec = s.src_local.shape[1]
        return BlockedEdges(
            block_meta=np.concatenate(
                [s.block_meta, np.tile([[last_dst, 0]], (padn, 1)).astype(np.int32)]
            ),
            src_local=np.concatenate([s.src_local, np.zeros((padn, ec), np.int32)]),
            dst_local=np.concatenate([s.dst_local, np.zeros((padn, ec), np.int32)]),
            weight=np.concatenate([s.weight, np.zeros((padn, ec), np.float32)]),
            edge_id=np.concatenate([s.edge_id, np.zeros((padn, ec), np.int32)])
            if s.edge_id is not None
            else None,
            tile=s.tile,
        )

    padded = [pad_shard(s) for s in shards]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *padded)
    return stacked, n_pad


def sharded_mean_aggregate(
    x: jax.Array,
    blocked_stack: BlockedEdges,
    num_nodes: int,
    *,
    axis_name: str = "ep",
    use_pallas: bool = True,
):
    """Per-shard blocked SpMM + psum. Call inside shard_map; ``blocked_stack``
    arrives with local leading dim 1 (sharded over ``axis_name``)."""
    local = jax.tree.map(lambda a: a[0], blocked_stack)
    partial_sums = _spmm_dispatch(x, local, num_nodes, use_pallas)
    return jax.lax.psum(partial_sums, axis_name)


def make_sharded_sage_step(
    mesh: Mesh,
    blocked_stack: BlockedEdges,
    num_nodes: int,
    *,
    use_pallas: bool = True,
    axis_name: str = "ep",
):
    """Jitted fwd+bwd of a 2-layer GraphSAGE over the ep-sharded graph.

    Returns ``step(params, x) -> grads`` — the scaling-study workload
    (edges/s at 1 chip vs N chips rides this function).
    """
    blocked_specs = jax.tree.map(lambda _: P(axis_name), blocked_stack)

    def fwd(params, x, blocked):
        agg1 = sharded_mean_aggregate(
            x, blocked, num_nodes, axis_name=axis_name, use_pallas=use_pallas
        )
        h = jnp.maximum(agg1 @ params["w0a"] + x @ params["w0b"], 0.0)
        agg2 = sharded_mean_aggregate(
            h, blocked, num_nodes, axis_name=axis_name, use_pallas=use_pallas
        )
        h2 = jnp.maximum(agg2 @ params["w1a"] + h @ params["w1b"], 0.0)
        return jnp.sum(h2)

    sharded = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(), blocked_specs),
        out_specs=P(),
    )

    @jax.jit
    def step(params, x):
        return jax.grad(lambda p, xx: sharded(p, xx, blocked_stack), argnums=(0, 1))(params, x)

    return step
