"""Node-sharded edge partitioning with boundary-feature all-to-all
(the north-star's "context parallelism" for graphs — BASELINE.json:
"edge-partitioning the map graph, exchanging boundary node features
all-to-all over ICI and overlapping the exchange with local aggregation").

Unlike :mod:`edge_partition` (features replicated, partial sums psum'd),
here **node features are sharded**: each device owns a contiguous node
range plus the edges whose destinations it owns. Sources living on other
shards ("halo" nodes) are fetched with a single static-shape
``jax.lax.all_to_all`` of exactly the boundary rows each pair of shards
exchanges — O(boundary) communication instead of O(N) replication:

  1. host planner computes, per ordered shard pair (q -> p), the unique
     source rows p needs from q, padded to the max pair size H;
  2. on device, each shard gathers its outgoing rows [ep, H, D] and one
     all_to_all delivers the incoming halo [ep, H, D];
  3. local aggregation runs over a concatenated feature table
     [n_local + ep*H, D] with pre-remapped edge indices — no psum at all,
     outputs land already node-sharded. XLA's async collective scheduling
     overlaps the exchange with the interior-edge aggregation.

Fully differentiable under shard_map (all_to_all transposes to the
reverse exchange).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloPlan:
    """Stacked per-shard arrays (leading dim = ep):

    send_idx  [ep, ep, H] int32 — rows shard p sends to shard q (local row
                                  indices into p's x shard; padded with 0).
    src_local [ep, E_max] int32 — edge source index into the concatenated
                                  feature table [n_local + ep*H].
    dst_local [ep, E_max] int32 — edge destination (local row); padding
                                  edges point at n_local (dropped).
    weight    [ep, E_max] float32 — per-edge weight (0 on padding).
    """

    send_idx: jax.Array
    src_local: jax.Array
    dst_local: jax.Array
    weight: jax.Array

    @property
    def ep(self) -> int:
        return self.send_idx.shape[0]

    @property
    def halo_size(self) -> int:
        return self.send_idx.shape[2]


def plan_halo_partition(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    ep: int,
    *,
    weight: np.ndarray | None = None,
    mean: bool = True,
) -> tuple[HaloPlan, int]:
    """Build the halo-exchange plan. Returns (plan, n_local) where
    n_local = padded per-shard node count (num_nodes padded to ep*n_local)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    n_local = (num_nodes + ep - 1) // ep
    if weight is None:
        if mean:
            deg = np.bincount(dst, minlength=num_nodes)
            weight = (1.0 / np.maximum(deg, 1))[dst].astype(np.float32)
        else:
            weight = np.ones(len(src), np.float32)

    owner_dst = dst // n_local
    owner_src = src // n_local

    # per-shard edge lists
    edges_p = [np.nonzero(owner_dst == p)[0] for p in range(ep)]
    e_max = max((len(e) for e in edges_p), default=1)
    e_max = max(e_max, 1)

    # halo requests: need[p][q] = sorted unique global src ids p needs from q
    need = [[None] * ep for _ in range(ep)]
    for p in range(ep):
        es = edges_p[p]
        for q in range(ep):
            if q == p:
                need[p][q] = np.zeros(0, np.int64)
            else:
                m = owner_src[es] == q
                need[p][q] = np.unique(src[es][m])
    h_max = max((len(need[p][q]) for p in range(ep) for q in range(ep)), default=1)
    h_max = max(h_max, 1)

    send_idx = np.zeros((ep, ep, h_max), np.int32)
    for q in range(ep):
        for p in range(ep):
            ids = need[p][q]
            send_idx[q, p, : len(ids)] = (ids - q * n_local).astype(np.int32)

    src_local = np.zeros((ep, e_max), np.int32)
    dst_local = np.full((ep, e_max), n_local, np.int32)  # padding -> dropped
    w_arr = np.zeros((ep, e_max), np.float32)
    for p in range(ep):
        es = edges_p[p]
        s = src[es]
        d = dst[es]
        w = weight[es]
        remapped = np.empty(len(es), np.int64)
        local_mask = owner_src[es] == p
        remapped[local_mask] = s[local_mask] - p * n_local
        for q in range(ep):
            if q == p:
                continue
            m = owner_src[es] == q
            if not m.any():
                continue
            pos = np.searchsorted(need[p][q], s[m])
            remapped[m] = n_local + q * h_max + pos
        src_local[p, : len(es)] = remapped
        dst_local[p, : len(es)] = d - p * n_local
        w_arr[p, : len(es)] = w

    plan = HaloPlan(
        send_idx=send_idx, src_local=src_local, dst_local=dst_local, weight=w_arr
    )
    return plan, n_local


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloPlanSplit:
    """Interior/boundary-split halo plan (stacked per-shard, leading dim ep).

    Interior edges (source owned by the same shard) carry no dependency on
    the all-to-all, so their aggregation is structurally overlappable with
    the boundary exchange — the scheduler can hide the collective behind
    the interior segment-sum instead of relying on it discovering the
    independence inside one fused gather (SURVEY.md §7 hard part 3).

    send_idx [ep, ep, H]     — as :class:`HaloPlan`.
    int_src  [ep, Ei] int32  — interior edge sources (local rows).
    int_dst  [ep, Ei] int32  — interior destinations; padding -> n_local.
    int_w    [ep, Ei] f32    — interior weights (0 on padding).
    hal_src  [ep, Eh] int32  — boundary sources, indexing the received halo
                               table [ep*H] (q * H + pos).
    hal_dst  [ep, Eh] int32  — boundary destinations; padding -> n_local.
    hal_w    [ep, Eh] f32    — boundary weights (0 on padding).
    """

    send_idx: jax.Array
    int_src: jax.Array
    int_dst: jax.Array
    int_w: jax.Array
    hal_src: jax.Array
    hal_dst: jax.Array
    hal_w: jax.Array

    @property
    def ep(self) -> int:
        return self.send_idx.shape[0]


def split_halo_plan(plan: HaloPlan, n_local: int) -> HaloPlanSplit:
    """Split a :class:`HaloPlan` into interior and boundary edge lists
    (host-side numpy; pads each list to its per-shard maximum)."""
    ep = plan.send_idx.shape[0]
    h_max = plan.send_idx.shape[2]
    src = np.asarray(plan.src_local)
    dst = np.asarray(plan.dst_local)
    w = np.asarray(plan.weight)

    interior = [np.nonzero((src[p] < n_local) & (dst[p] < n_local))[0] for p in range(ep)]
    boundary = [np.nonzero((src[p] >= n_local) & (dst[p] < n_local))[0] for p in range(ep)]
    ei = max(max((len(e) for e in interior), default=1), 1)
    eh = max(max((len(e) for e in boundary), default=1), 1)

    int_src = np.zeros((ep, ei), np.int32)
    int_dst = np.full((ep, ei), n_local, np.int32)
    int_w = np.zeros((ep, ei), np.float32)
    hal_src = np.zeros((ep, eh), np.int32)
    hal_dst = np.full((ep, eh), n_local, np.int32)
    hal_w = np.zeros((ep, eh), np.float32)
    for p in range(ep):
        ii, bb = interior[p], boundary[p]
        int_src[p, : len(ii)] = src[p][ii]
        int_dst[p, : len(ii)] = dst[p][ii]
        int_w[p, : len(ii)] = w[p][ii]
        hal_src[p, : len(bb)] = src[p][bb] - n_local  # index into [ep*H] halo table
        hal_dst[p, : len(bb)] = dst[p][bb]
        hal_w[p, : len(bb)] = w[p][bb]

    return HaloPlanSplit(
        send_idx=plan.send_idx, int_src=int_src, int_dst=int_dst, int_w=int_w,
        hal_src=hal_src, hal_dst=hal_dst, hal_w=hal_w,
    )


def halo_aggregate_overlapped(
    x_local, plan_local: HaloPlanSplit, n_local: int, *, axis_name: str = "ep"
):
    """Inside shard_map: boundary all-to-all overlapped with interior
    aggregation. The interior segment-sum has no data dependency on the
    collective, so the latency-hiding scheduler runs them concurrently;
    only the (much smaller) boundary segment-sum waits on the halo."""
    send_idx = plan_local.send_idx[0]  # [ep, H]
    d = x_local.shape[1]

    outgoing = x_local[send_idx]  # [ep, H, D]
    halo = jax.lax.all_to_all(outgoing, axis_name, split_axis=0, concat_axis=0)

    # interior: depends only on x_local — overlaps the exchange
    msgs_i = x_local[plan_local.int_src[0]] * plan_local.int_w[0][:, None].astype(x_local.dtype)
    acc = jax.ops.segment_sum(msgs_i, plan_local.int_dst[0], num_segments=n_local + 1)

    # boundary: waits on the halo table
    table = halo.reshape(-1, d)
    msgs_h = table[plan_local.hal_src[0]] * plan_local.hal_w[0][:, None].astype(x_local.dtype)
    acc = acc + jax.ops.segment_sum(msgs_h, plan_local.hal_dst[0], num_segments=n_local + 1)
    return acc[:n_local]


def halo_aggregate(x_local, plan_local: HaloPlan, n_local: int, *, axis_name: str = "ep"):
    """Inside shard_map: x_local [n_local, D] (this shard's rows); plan
    arrays arrive with local leading dim 1. Returns [n_local, D] sums."""
    send_idx = plan_local.send_idx[0]  # [ep, H]
    src_local = plan_local.src_local[0]
    dst_local = plan_local.dst_local[0]
    w = plan_local.weight[0]

    outgoing = x_local[send_idx]  # [ep, H, D]
    halo = jax.lax.all_to_all(outgoing, axis_name, split_axis=0, concat_axis=0)
    table = jnp.concatenate([x_local, halo.reshape(-1, x_local.shape[1])], axis=0)
    msgs = table[src_local] * w[:, None].astype(x_local.dtype)
    return jax.ops.segment_sum(msgs, dst_local, num_segments=n_local)


def make_halo_sage_step(
    mesh: Mesh,
    plan: HaloPlan | HaloPlanSplit,
    n_local: int,
    *,
    axis_name: str = "ep",
    overlap: bool = False,
):
    """Jitted fwd+bwd of a 2-layer GraphSAGE with halo-exchange aggregation.

    ``step(params, x_stack) -> (grads, dx)`` where x_stack is [ep, n_local, D]
    sharded over the ep axis. The comparison workload for the replicated
    edge_partition path (same math, O(boundary) instead of O(N) comms).
    ``overlap=True`` takes a :class:`HaloPlanSplit` and aggregates interior
    edges concurrently with the boundary all-to-all.
    """
    plan_specs = jax.tree.map(lambda _: P(axis_name), plan)
    aggregate = halo_aggregate_overlapped if overlap else halo_aggregate

    def fwd(params, x_stack, plan_l):
        xl = x_stack[0]
        a1 = aggregate(xl, plan_l, n_local, axis_name=axis_name)
        h = jnp.maximum(a1 @ params["w0a"] + xl @ params["w0b"], 0.0)
        a2 = aggregate(h, plan_l, n_local, axis_name=axis_name)
        h2 = jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0)
        return jax.lax.psum(jnp.sum(h2), axis_name)

    sharded = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(axis_name), plan_specs),
        out_specs=P(),
    )

    @jax.jit
    def step(params, x_stack):
        return jax.grad(lambda p, xs: sharded(p, xs, plan), argnums=(0, 1))(params, x_stack)

    return step


# ------------------------------------------------- blocked-kernel halo path


@dataclass(frozen=True)
class HaloBlockedPlan:
    """Halo exchange + per-shard Pallas blocked SpMM layouts.

    The interior layout lives in the local node space (depends only on
    x_local — overlaps the boundary all-to-all); the boundary layout lives
    in the received-halo row space. Both come with reverse layouts so the
    aggregation is differentiable through :func:`sldm_gnn_tpu.ops.spmm.
    spmm_apply` (collective transposes are inserted by JAX for the gather
    and all_to_all outside the kernels).

    send_idx [ep, ep, H]; the four BlockedEdges pytrees are stacked over a
    leading ep axis (chunk counts padded to the per-group max).
    """

    send_idx: np.ndarray
    int_fwd: "BlockedEdges"
    int_rev: "BlockedEdges"
    bnd_fwd: "BlockedEdges"
    bnd_rev: "BlockedEdges"
    n_local: int
    n_pad_local: int
    n_pad_bnd: int
    k_per_step: int


def _stack_blocked(group, step_chunks: int):
    """Stack per-shard one-hot BlockedEdges layouts over a leading ep axis:
    drop edge_id (not needed for aggregation) so every shard's layout has
    an identical pytree structure, pad chunk counts to the group max
    (rounded to the step_chunks multiple), then stack leaf-wise."""
    from ..graph.csr import BlockedEdges

    w_max = max(b.num_chunks for b in group)
    w_max = ((w_max + step_chunks - 1) // step_chunks) * step_chunks
    padded = [
        _pad_chunks(
            BlockedEdges(
                block_meta=b.block_meta, src_local=b.src_local,
                dst_local=b.dst_local, weight=b.weight, edge_id=None, tile=b.tile,
                step_chunks=b.step_chunks,
            ),
            w_max,
        )
        for b in group
    ]
    return jax.tree.map(lambda *xs: np.stack(xs), *padded)


def _pad_chunks(blocked, w_target: int):
    """Append all-dummy chunks (weight 0, last dst block) so stacked
    per-shard layouts share a chunk count; keeps dst-block contiguity and
    per-block step_chunks multiples."""
    from ..graph.csr import BlockedEdges

    w = blocked.num_chunks
    if w == w_target:
        return blocked
    pad = w_target - w
    ec = blocked.src_local.shape[1]
    last_dblk = int(blocked.block_meta[-1, 0])
    meta = np.concatenate(
        [np.asarray(blocked.block_meta),
         np.stack([np.full(pad, last_dblk, np.int32), np.zeros(pad, np.int32)], 1)]
    )
    z = np.zeros((pad, ec), np.int32)
    zf = np.zeros((pad, ec), np.float32)
    return BlockedEdges(
        block_meta=meta,
        src_local=np.concatenate([np.asarray(blocked.src_local), z]),
        dst_local=np.concatenate([np.asarray(blocked.dst_local), z]),
        weight=np.concatenate([np.asarray(blocked.weight), zf]),
        edge_id=None,
        tile=blocked.tile,
        step_chunks=blocked.step_chunks,
    )


def plan_banded_interior(
    split: HaloPlanSplit,
    dst: np.ndarray,
    n_local: int,
    n_pad_local: int,
    *,
    mean: bool = True,
    tile: int,
    banded_k: int,
    banded_max_span: int,
    keep_masks=None,
):
    """Stacked per-shard banded layouts for the INTERIOR edges of a halo
    split (the per-shard node space inherits the global graph's bandedness
    under contiguous node-range sharding). Returns
    ``(int_fwd, int_rev, n_pad_local)`` — stacked
    :class:`~sldm_gnn_tpu.ops.spmm_banded.BandedBlocks` with FULL-degree
    row/col scales (interior + boundary edges sum to the exact mean).
    Raises ValueError when a shard's interior span exceeds
    ``banded_max_span``. ``keep_masks``: optional per-shard boolean masks
    over each shard's VALID interior edges (post int_w>0 filter) — edges
    masked out are excluded from the banded layouts (the fused planner
    spills them into its compact residual)."""
    from ..ops.spmm_banded import BandedBlocks, build_banded_counts

    ep = split.ep
    nbl = n_pad_local // tile
    nbl = ((nbl + banded_k - 1) // banded_k) * banded_k
    n_pad_local = nbl * tile
    deg = np.bincount(np.asarray(dst, np.int64), minlength=ep * n_local)
    inv = ((1.0 / np.maximum(deg, 1)) if mean else np.ones(ep * n_local)).astype(np.float32)

    # the common (s_span, wsz) the stacked per-shard layouts must share
    # are pure functions of per-block source-block bounds — one cheap
    # scatter-min/max pre-pass over each shard/direction, then every
    # O(E) adjacency fill runs exactly once with the forced floors
    edges = []
    for p in range(ep):
        mi = np.asarray(split.int_w[p]) > 0
        isrc = np.asarray(split.int_src[p])[mi].astype(np.int64)
        idst = np.asarray(split.int_dst[p])[mi].astype(np.int64)
        if keep_masks is not None:
            isrc = isrc[keep_masks[p]]
            idst = idst[keep_masks[p]]
        edges.append((isrc, idst))

    def span_bounds(s, d_):
        bo = np.arange(nbl, dtype=np.int64)
        hi = bo.copy()
        if len(s):
            np.minimum.at(bo, d_ // tile, s // tile)
            np.maximum.at(hi, d_ // tile, s // tile)
        return bo, hi

    bounds = [span_bounds(*pair) for p in range(ep)
              for pair in (edges[p], edges[p][::-1])]
    s_common = max(int((hi - bo + 1).max()) for bo, hi in bounds)
    if s_common > banded_max_span:
        raise ValueError(
            f"source span {s_common} tiles exceeds max_span="
            f"{banded_max_span}: shard interiors are not banded")
    w_common = 0
    for bo, _ in bounds:
        base = np.minimum(bo, max(nbl - s_common, 0)).reshape(-1, banded_k)
        spread = int((base.max(axis=1) - base.min(axis=1)).max()) if len(base) else 0
        w_common = max(w_common, spread + s_common)

    built = [
        tuple(
            build_banded_counts(s, d_, n_pad_local, tile=tile, k=banded_k,
                                max_span=banded_max_span,
                                s_span_min=s_common, wsz_min=w_common)
            for s, d_ in (pair, pair[::-1])
        )
        for pair in edges
    ]
    assert len({b.s_span for t in built for b in t}) == 1
    assert len({b.wsz for t in built for b in t}) == 1

    def stack_banded(blocks_list, *, row: bool):
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks_list)
        scale = np.zeros((ep, n_pad_local, 1), np.float32)
        for p in range(ep):
            scale[p, :n_local, 0] = inv[p * n_local : (p + 1) * n_local]
        return BandedBlocks(
            a=stacked.a, bo=stacked.bo, woff=stacked.woff, off=stacked.off,
            row_scale=scale if row else None,
            col_scale=None if row else scale,
            tile=tile, wsz=blocks_list[0].wsz, k=banded_k,
        )

    return (stack_banded([pair[0] for pair in built], row=True),
            stack_banded([pair[1] for pair in built], row=False),
            n_pad_local)


def plan_halo_blocked(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    ep: int,
    *,
    mean: bool = True,
    tile: int | None = None,
    edge_chunk: int | None = None,
    step_chunks: int = 1,
    backend: str = "onehot",
    banded_k: int = 4,
    banded_max_span: int = 16,
) -> HaloBlockedPlan:
    """Build the Pallas-kernel halo plan from a global edge list.

    ``backend='dense'`` builds :class:`~sldm_gnn_tpu.ops.spmm_dense.
    DenseBlocks` layouts instead (precomputed adjacency tiles — the
    fastest per-shard aggregation for locality graphs).

    ``backend='banded'`` builds the windowed-DMA banded layout
    (:mod:`sldm_gnn_tpu.ops.spmm_banded` — the single-chip headline
    kernel) for the INTERIOR edges, whose per-shard node space inherits
    the global graph's bandedness under contiguous node-range sharding;
    boundary edges index the compacted halo-row table (not banded) and
    stay on the one-hot kernel. Raises ValueError when a shard's interior
    span exceeds ``banded_max_span`` — fall back to ``'dense'``."""
    from ..graph.csr import EDGE_CHUNK, TILE, block_edges, pad_nodes
    from ..ops.spmm_dense import build_dense_blocks

    tile = tile or TILE
    edge_chunk = edge_chunk or EDGE_CHUNK
    plan, n_local = plan_halo_partition(src, dst, num_nodes, ep, mean=mean)
    split = split_halo_plan(plan, n_local)
    ep_, _, h = split.send_idx.shape
    assert ep_ == ep
    n_pad_local = pad_nodes(n_local, tile)
    n_pad_bnd = pad_nodes(max(ep * h, n_local), tile)

    if backend == "banded":
        int_fwd, int_rev, n_pad_local = plan_banded_interior(
            split, dst, n_local, n_pad_local, mean=mean, tile=tile,
            banded_k=banded_k, banded_max_span=banded_max_span)

        bnd = []
        for p in range(ep):
            mb = np.asarray(split.hal_w[p]) > 0
            bnd.append((
                block_edges(np.asarray(split.hal_src[p])[mb], np.asarray(split.hal_dst[p])[mb],
                            n_pad_bnd, weight=np.asarray(split.hal_w[p])[mb], tile=tile,
                            edge_chunk=edge_chunk, step_chunks=step_chunks),
                block_edges(np.asarray(split.hal_dst[p])[mb], np.asarray(split.hal_src[p])[mb],
                            n_pad_bnd, weight=np.asarray(split.hal_w[p])[mb], tile=tile,
                            edge_chunk=edge_chunk, step_chunks=step_chunks),
            ))

        return HaloBlockedPlan(
            send_idx=np.asarray(plan.send_idx),
            int_fwd=int_fwd,
            int_rev=int_rev,
            bnd_fwd=_stack_blocked([pair[0] for pair in bnd], step_chunks),
            bnd_rev=_stack_blocked([pair[1] for pair in bnd], step_chunks),
            n_local=n_local,
            n_pad_local=n_pad_local,
            n_pad_bnd=n_pad_bnd,
            k_per_step=step_chunks,
        )

    if backend == "dense":
        def make(s, d_, w_, npad):
            return build_dense_blocks(s, d_, npad, weight=w_, tile=tile)
    elif backend == "onehot":
        def make(s, d_, w_, npad):
            return block_edges(s, d_, npad, weight=w_, tile=tile,
                               edge_chunk=edge_chunk, step_chunks=step_chunks)
    else:
        raise ValueError(f"unknown halo backend {backend!r}")

    groups = {k: [] for k in ("if_", "ir", "bf", "br")}
    for p in range(ep):
        mi = np.asarray(split.int_w[p]) > 0
        isrc = np.asarray(split.int_src[p])[mi]
        idst = np.asarray(split.int_dst[p])[mi]
        iw = np.asarray(split.int_w[p])[mi]
        groups["if_"].append(make(isrc, idst, iw, n_pad_local))
        groups["ir"].append(make(idst, isrc, iw, n_pad_local))
        mb = np.asarray(split.hal_w[p]) > 0
        bsrc = np.asarray(split.hal_src[p])[mb]  # halo-row space
        bdst = np.asarray(split.hal_dst[p])[mb]  # local space
        bw = np.asarray(split.hal_w[p])[mb]
        groups["bf"].append(make(bsrc, bdst, bw, n_pad_bnd))
        groups["br"].append(make(bdst, bsrc, bw, n_pad_bnd))

    if backend == "dense":
        from ..ops.spmm_dense import DenseBlocks

        def stack_dense(group):
            s_max = max(b.s_max for b in group)
            padded = []
            for b in group:
                pad = s_max - b.s_max
                padded.append(DenseBlocks(
                    a=np.pad(np.asarray(b.a), ((0, 0), (0, pad), (0, 0), (0, 0))),
                    src_blk=np.pad(np.asarray(b.src_blk), ((0, 0), (0, pad))),
                    tile=b.tile,
                ))
            return jax.tree.map(lambda *xs: np.stack(xs), *padded)

        return HaloBlockedPlan(
            send_idx=np.asarray(plan.send_idx),
            int_fwd=stack_dense(groups["if_"]),
            int_rev=stack_dense(groups["ir"]),
            bnd_fwd=stack_dense(groups["bf"]),
            bnd_rev=stack_dense(groups["br"]),
            n_local=n_local,
            n_pad_local=n_pad_local,
            n_pad_bnd=n_pad_bnd,
            k_per_step=step_chunks,
        )

    return HaloBlockedPlan(
        send_idx=np.asarray(plan.send_idx),
        int_fwd=_stack_blocked(groups["if_"], step_chunks),
        int_rev=_stack_blocked(groups["ir"], step_chunks),
        bnd_fwd=_stack_blocked(groups["bf"], step_chunks),
        bnd_rev=_stack_blocked(groups["br"], step_chunks),
        n_local=n_local,
        n_pad_local=n_pad_local,
        n_pad_bnd=n_pad_bnd,
        k_per_step=step_chunks,
    )


def halo_aggregate_pallas(
    x_local,
    send_idx,
    int_fwd,
    int_rev,
    bnd_fwd,
    bnd_rev,
    plan: HaloBlockedPlan,
    *,
    use_pallas: bool = True,
    axis_name: str = "ep",
):
    """Inside shard_map: halo all-to-all + per-shard blocked-SpMM
    aggregation. The interior kernel reads only x_local, so it overlaps
    the collective; the boundary kernel waits on the halo rows. Fully
    differentiable (spmm_apply custom VJPs + collective transposes).
    Layout types may differ between interior and boundary (the banded
    backend keeps boundary edges on the one-hot kernel)."""
    from ..ops.spmm import spmm_apply
    from ..ops.spmm_banded import BandedBlocks, spmm_banded_apply
    from ..ops.spmm_dense import DenseBlocks, spmm_dense_apply

    d = x_local.shape[1]
    outgoing = x_local[send_idx[0]]  # [ep, H, D]
    halo = jax.lax.all_to_all(outgoing, axis_name, split_axis=0, concat_axis=0)

    unstack = lambda t: jax.tree.map(lambda a: a[0], t)

    def agg(x, fwd, rev, n_pad):
        fwd_l, rev_l = unstack(fwd), unstack(rev)
        if isinstance(fwd_l, DenseBlocks):
            return spmm_dense_apply(x, fwd_l, rev_l, use_pallas)
        if isinstance(fwd_l, BandedBlocks):
            return spmm_banded_apply(x, fwd_l, rev_l, use_pallas)
        return spmm_apply(x, fwd_l, rev_l, n_pad, use_pallas, plan.k_per_step)

    xl = jnp.pad(x_local, ((0, plan.n_pad_local - x_local.shape[0]), (0, 0)))
    out = agg(xl, int_fwd, int_rev, plan.n_pad_local)[: plan.n_local]

    hrows = halo.reshape(-1, d)
    hb = jnp.pad(hrows, ((0, plan.n_pad_bnd - hrows.shape[0]), (0, 0)))
    out = out + agg(hb, bnd_fwd, bnd_rev, plan.n_pad_bnd)[: plan.n_local]
    return out


def make_halo_pallas_sage_step(
    mesh: Mesh, plan: HaloBlockedPlan, *, use_pallas: bool = True, axis_name: str = "ep"
):
    """Jitted fwd+bwd of a 2-layer GraphSAGE whose local aggregation runs
    the blocked Pallas SpMM per shard (the multi-chip path with the
    single-chip kernel inside)."""
    send_idx = jnp.asarray(plan.send_idx)
    layouts = jax.tree.map(jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev))
    l_specs = jax.tree.map(lambda _: P(axis_name), layouts)

    def fwd(params, x_stack, send, lts):
        xl = x_stack[0]
        agg = lambda h: halo_aggregate_pallas(
            h, send, *lts, plan, use_pallas=use_pallas, axis_name=axis_name
        )
        a1 = agg(xl)
        h = jnp.maximum(a1 @ params["w0a"] + xl @ params["w0b"], 0.0)
        a2 = agg(h)
        h2 = jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0)
        return jax.lax.psum(jnp.sum(h2), axis_name)

    sharded = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), l_specs),
        out_specs=P(),
    )

    @jax.jit
    def step(params, x_stack):
        return jax.grad(
            lambda p, xs: sharded(p, xs, send_idx, layouts), argnums=(0, 1)
        )(params, x_stack)

    return step
