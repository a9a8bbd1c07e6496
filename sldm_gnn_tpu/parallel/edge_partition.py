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

from ..graph.csr import BlockedEdges, TILE, auto_edge_chunk, block_edges, mean_weights, pad_nodes
from ..ops.spmm import spmm_apply


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    ep: int,
    *,
    weight: np.ndarray | None = None,
    mean: bool = True,
) -> tuple[BlockedEdges, BlockedEdges, int]:
    """Split an edge list into ``ep`` blocked shards (stacked leading axis).

    Returns (stacked forward layouts [ep, W_max, ...], stacked REVERSE
    layouts for the aggregation's custom VJP, padded N). Partitioning is by
    contiguous dst ranges (locality-preserving); mean weights use the
    *global* degree so the psum of partials is the exact global mean. The
    chunk width scales up with the per-shard edge count
    (:func:`~sldm_gnn_tpu.graph.csr.auto_edge_chunk`) so huge shards keep
    their scalar-prefetch metadata inside SMEM.
    """
    from .halo import _pad_chunks

    n_pad = pad_nodes(num_nodes)
    if weight is None:
        weight = (
            mean_weights(dst, n_pad) if mean else np.ones(len(src), np.float32)
        )

    # contiguous dst ranges per shard
    order = np.argsort(dst, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], weight[order]
    bounds = np.linspace(0, len(src), ep + 1).astype(np.int64)
    ec = auto_edge_chunk(int(np.diff(bounds).max()) if len(src) else 1)

    fwd_shards, rev_shards = [], []
    for p in range(ep):
        sl = slice(bounds[p], bounds[p + 1])
        fwd_shards.append(block_edges(src_s[sl], dst_s[sl], n_pad, weight=w_s[sl],
                                      edge_chunk=ec))
        rev_shards.append(block_edges(dst_s[sl], src_s[sl], n_pad, weight=w_s[sl],
                                      edge_chunk=ec))

    def stack(shards):
        w_max = max(s.num_chunks for s in shards)
        padded = [
            _pad_chunks(
                BlockedEdges(block_meta=s.block_meta, src_local=s.src_local,
                             dst_local=s.dst_local, weight=s.weight, edge_id=None,
                             tile=s.tile, step_chunks=s.step_chunks),
                w_max,
            )
            for s in shards
        ]
        return jax.tree.map(lambda *xs: np.stack(xs), *padded)

    return stack(fwd_shards), stack(rev_shards), n_pad


def sharded_mean_aggregate(
    x: jax.Array,
    blocked_fwd: BlockedEdges,
    blocked_rev: BlockedEdges,
    num_nodes: int,
    *,
    axis_name: str = "ep",
    use_pallas: bool = True,
):
    """Per-shard blocked SpMM + psum. Call inside shard_map; the stacked
    layouts arrive with local leading dim 1 (sharded over ``axis_name``).
    Rides :func:`~sldm_gnn_tpu.ops.spmm.spmm_apply`'s custom VJP (the raw
    pallas_call has no AD rule), so ``jax.grad`` works on the Pallas path;
    the transpose of the replicated x reproduces the reverse-edge
    aggregation psum'd across shards."""
    unstack = lambda t: jax.tree.map(lambda a: a[0], t)
    if axis_name not in jax.typeof(x).vma:
        # promote the replicated x to ep-varying before the custom-VJP call:
        # mixed-vma operands trip the auto-pvary insertion under check_vma,
        # and the cast's transpose (psum) is exactly the cross-shard dx sum
        x = jax.lax.pcast(x, axis_name, to="varying")
    partial_sums = spmm_apply(
        x, unstack(blocked_fwd), unstack(blocked_rev), num_nodes, use_pallas, 1
    )
    return jax.lax.psum(partial_sums, axis_name)


def make_sharded_sage_step(
    mesh: Mesh,
    blocked_fwd: BlockedEdges,
    blocked_rev: BlockedEdges,
    num_nodes: int,
    *,
    use_pallas: bool = True,
    axis_name: str = "ep",
):
    """Jitted fwd+bwd of a 2-layer GraphSAGE over the ep-sharded graph.

    Returns ``step(params, x) -> grads`` — the scaling-study workload
    (edges/s at 1 chip vs N chips rides this function).
    """
    layouts = (blocked_fwd, blocked_rev)
    blocked_specs = jax.tree.map(lambda _: P(axis_name), layouts)

    def fwd(params, x, blocked):
        bf, br = blocked
        agg1 = sharded_mean_aggregate(
            x, bf, br, num_nodes, axis_name=axis_name, use_pallas=use_pallas
        )
        h = jnp.maximum(agg1 @ params["w0a"] + x @ params["w0b"], 0.0)
        agg2 = sharded_mean_aggregate(
            h, bf, br, num_nodes, axis_name=axis_name, use_pallas=use_pallas
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
        return jax.grad(lambda p, xx: sharded(p, xx, layouts), argnums=(0, 1))(params, x)

    return step
