"""Hybrid SpMM backend — dense tiles where dense, one-hot chunks elsewhere.

The dense-block backend (ops/spmm_dense.py) is ~5x faster per aggregation
than the one-hot kernel (ops/spmm.py) but stores a full [T, T] tile per
non-empty (dst_block, src_block) pair — on big or density-skewed graphs the
A tiles outgrow HBM while most tiles are nearly empty. This module splits
the STATIC edge set once on the host:

  * (dst,src) block pairs carrying >= ``min_pair_edges`` edges (and within
    the per-block pair cap that bounds A storage) go to the dense backend —
    break-even is ~T/2 edges per pair by FLOP count, ~0.6*T measured;
  * all remaining "straggler" edges go to the one-hot blocked kernel.

An aggregation is then the SUM of the two linear operators, and the
backward pass composes automatically from their transpose-layout custom
VJPs. The per-block-pair cap is applied symmetrically (a pair must rank
within the cap both for its dst block and for its src block) so BOTH the
forward and the transposed reverse dense layout have bounded s_max, giving
a hard A-storage bound of ``2 * num_blocks * cap * T^2 * itemsize``.

Replaces nothing in the reference (its torch_scatter CSR path has no
analogue, SURVEY.md §2.3) — this is the TPU-first answer for graphs whose
block-density distribution is skewed, e.g. dense urban map cores with
sparse arterial stragglers.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import EDGE_CHUNK, TILE, BlockedEdges, auto_edge_chunk, block_edges, mean_weights
from .spmm import spmm_apply
from .spmm_dense import DenseBlocks, build_dense_blocks, spmm_dense_apply


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HybridLayout:
    """Edge set split into a dense-tile part and a one-hot straggler part.

    Either half may be None (degenerate pure-dense / pure-one-hot splits).
    ``n_pad`` (static) is the padded node count both halves agree on — pad
    x to this many rows.
    """

    dense_fwd: DenseBlocks | None
    dense_rev: DenseBlocks | None
    onehot_fwd: BlockedEdges | None
    onehot_rev: BlockedEdges | None
    n_pad: int = field(metadata=dict(static=True))
    dense_k: int = field(default=1, metadata=dict(static=True))
    k_per_step: int = field(default=1, metadata=dict(static=True))
    # informational: fraction of edges in the dense half. A STATIC field so
    # it survives pytree transforms (tree.map/jit/device_put) — a smuggled
    # non-field attribute would silently drop to NaN after the first one
    dense_frac: float = field(default=float("nan"), metadata=dict(static=True))

    @property
    def dense_edge_fraction(self) -> float:
        return self.dense_frac


def _rank_within_group(group: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Rank of each item within its group, by count descending."""
    order = np.lexsort((-counts, group))
    g_sorted = group[order]
    starts = np.r_[0, np.nonzero(np.diff(g_sorted))[0] + 1] if len(group) else np.zeros(1, np.int64)
    lens = np.diff(np.r_[starts, len(group)])
    group_start = np.repeat(starts, lens)
    rank = np.empty(len(group), np.int64)
    rank[order] = np.arange(len(group)) - group_start
    return rank


def select_dense_edges(
    src: np.ndarray,
    dst: np.ndarray,
    nb: int,
    *,
    tile: int = TILE,
    min_pair_edges: int | None = None,
    max_pairs_per_block: int | None = None,
) -> np.ndarray:
    """Boolean per-edge mask: True = the edge's (dst,src) block pair is
    dense enough for the dense-tile backend.

    A pair qualifies when it carries >= ``min_pair_edges`` edges AND ranks
    within ``max_pairs_per_block`` densest pairs of BOTH its dst block and
    its src block (the symmetric cap bounds the transposed layout too).
    """
    if min_pair_edges is None:
        min_pair_edges = tile // 2
    if len(src) == 0:
        return np.zeros(0, bool)
    db = np.asarray(dst, np.int64) // tile
    sb = np.asarray(src, np.int64) // tile
    key = db * nb + sb
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    sel = counts >= min_pair_edges
    if max_pairs_per_block is not None:
        pdb = uniq // nb
        psb = uniq % nb
        sel &= _rank_within_group(pdb, counts) < max_pairs_per_block
        sel &= _rank_within_group(psb, counts) < max_pairs_per_block
    return sel[inv]


def prepare_hybrid_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    dense_k: int = 1,
    k_per_step: int = 1,
    edge_chunk: int = EDGE_CHUNK,
    min_pair_edges: int | None = None,
    a_budget_bytes: float = 4e9,
    dense_dtype=np.float32,
) -> tuple[HybridLayout, int]:
    """Split + build both halves' fwd/rev layouts for mean aggregation.

    ``a_budget_bytes`` bounds the dense A-tile storage (fwd+rev combined)
    by deriving the per-block pair cap; ``dense_dtype`` int8 uses the
    factored count-tile form (exact for mean — see
    ops/spmm_dense.prepare_dense_mean_aggregate).

    Returns (layout, n_pad). Mean weights use the FULL degree regardless of
    which half an edge lands in.
    """
    from ..graph.csr import check_edge_range

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)  # native fills index raw buffers
    lcm = math.lcm(tile * dense_k, tile)
    n_pad = max(((num_nodes + lcm - 1) // lcm) * lcm, lcm)
    nb = n_pad // tile

    itemsize = np.dtype(dense_dtype).itemsize
    cap = max(int(a_budget_bytes // (2 * nb * tile * tile * itemsize)), 1)

    w = mean_weights(dst, n_pad)
    dense_mask = select_dense_edges(
        src, dst, nb, tile=tile, min_pair_edges=min_pair_edges, max_pairs_per_block=cap
    )

    dense_fwd = dense_rev = onehot_fwd = onehot_rev = None
    if dense_mask.any():
        sd, dd, wd = src[dense_mask], dst[dense_mask], w[dense_mask]
        if np.dtype(dense_dtype) == np.int8:
            fwd = rev = None
            if len(sd) >= 100_000:
                # native int8 count fill — skips the f32 tile transient
                # (GBs at config-4+ subsets); nb is already dense_k-padded
                # via the lcm rounding of n_pad above
                from ..build.native import native_dense_blocks_i8

                out_f = native_dense_blocks_i8(sd, dd, nb, tile)
                out_r = native_dense_blocks_i8(dd, sd, nb, tile)
                if out_f is not None and out_r is not None:
                    if max(out_f[2], out_r[2]) > 127:
                        raise ValueError(
                            "duplicate-edge multiplicity overflows int8 counts"
                        )
                    fwd = DenseBlocks(a=out_f[0], src_blk=out_f[1], tile=tile)
                    rev = DenseBlocks(a=out_r[0], src_blk=out_r[1], tile=tile)
            if fwd is None:
                fwd = build_dense_blocks(sd, dd, n_pad, tile=tile, pad_blocks_to=dense_k)
                rev = build_dense_blocks(dd, sd, n_pad, tile=tile, pad_blocks_to=dense_k)
                if fwd.a.size and fwd.a.max() > 127:
                    raise ValueError("duplicate-edge multiplicity overflows int8 counts")
            deg = np.bincount(dst, minlength=n_pad)  # FULL degree
            scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)
            dense_fwd = DenseBlocks(a=fwd.a.astype(np.int8, copy=False), src_blk=fwd.src_blk,
                                    row_scale=scale, tile=tile)
            dense_rev = DenseBlocks(a=rev.a.astype(np.int8, copy=False), src_blk=rev.src_blk,
                                    col_scale=scale, tile=tile)
        else:
            dense_fwd = build_dense_blocks(sd, dd, n_pad, weight=wd, tile=tile,
                                           dtype=dense_dtype, pad_blocks_to=dense_k)
            dense_rev = build_dense_blocks(dd, sd, n_pad, weight=wd, tile=tile,
                                           dtype=dense_dtype, pad_blocks_to=dense_k)
    sparse_mask = ~dense_mask
    if sparse_mask.any() or not dense_mask.any():
        ss, ds, ws = src[sparse_mask], dst[sparse_mask], w[sparse_mask]
        ec = auto_edge_chunk(len(ss), edge_chunk)
        onehot_fwd = block_edges(ss, ds, n_pad, weight=ws, tile=tile,
                                 edge_chunk=ec, step_chunks=k_per_step)
        onehot_rev = block_edges(ds, ss, n_pad, weight=ws, tile=tile,
                                 edge_chunk=ec, step_chunks=k_per_step)

    layout = HybridLayout(
        dense_fwd=dense_fwd, dense_rev=dense_rev,
        onehot_fwd=onehot_fwd, onehot_rev=onehot_rev,
        n_pad=n_pad, dense_k=dense_k, k_per_step=k_per_step,
        dense_frac=float(dense_mask.mean()) if len(src) else 0.0,
    )
    return layout, n_pad


def spmm_hybrid_apply(x: jax.Array, layout: HybridLayout, use_pallas: bool) -> jax.Array:
    """Aggregation as the sum of the two halves' linear operators; the
    backward composes from their transpose-layout custom VJPs."""
    out = None
    if layout.dense_fwd is not None:
        out = spmm_dense_apply(x, layout.dense_fwd, layout.dense_rev,
                               use_pallas, layout.dense_k)
    if layout.onehot_fwd is not None:
        o = spmm_apply(x, layout.onehot_fwd, layout.onehot_rev, layout.n_pad,
                       use_pallas, layout.k_per_step)
        out = o if out is None else out + o
    if out is None:
        out = jnp.zeros_like(x)
    return out


def dense_tile_bytes(src, dst, num_nodes, *, tile: int = TILE, dense_k: int = 1,
                     itemsize: int = 2) -> int:
    """Exact fwd+rev dense A-tile storage for this edge set (bytes).

    The dense layout is [nb, s_max, T, T] per direction where s_max is the
    max distinct src (resp. dst) blocks touching any dst (resp. src) block
    — computed from the real block-pair structure, not a locality
    heuristic."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    lcm = math.lcm(tile * dense_k, tile)
    n_pad = max(((num_nodes + lcm - 1) // lcm) * lcm, lcm)
    nb = n_pad // tile
    if not len(src):
        return 0
    pairs = np.unique(dst // tile * nb + src // tile)
    s_fwd = int(np.bincount(pairs // nb).max())
    s_rev = int(np.bincount(pairs % nb).max())
    return nb * (s_fwd + s_rev) * tile * tile * itemsize


def prepare_auto_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    dense_k: int = 1,
    k_per_step: int = 1,
    edge_chunk: int = EDGE_CHUNK,
    a_budget_bytes: float = 8e9,
    min_pair_edges: int | None = None,
    reorder: bool = False,
    coords: np.ndarray | None = None,
):
    """Pick the fastest SpMM layout for a static edge set under an A-tile
    HBM budget (the bench's selection policy, as a library surface):

      1. pure dense, int8-factored count tiles — the fastest mean
         aggregation measured (906M edges/s at the 3.2M-edge headline,
         tile 128 / 4 dst blocks per step: the kernel is A-streaming-
         bound, so int8's halved bytes beat bf16 outright) and EXACT
         (mean's 1/deg weight factors out of integer count tiles);
      2. hybrid density split — densest pairs on the dense path within
         budget, stragglers through the one-hot kernel;
      3. (degenerate hybrid) pure one-hot when no pair qualifies.

    Returns ``(layout_fwd, layout_rev, n_pad)`` ready for
    ``models.blocked_sage`` / ``spmm_*_apply`` — ``layout_rev`` is None for
    the hybrid case (the HybridLayout carries both directions). Duplicate
    edges with multiplicity > 127 fall back to bf16 weight tiles (the
    non-factorable general case).

    ``reorder=True`` returns ``(layout_fwd, layout_rev, n_pad, perm)``
    instead: before abandoning the banded tier, a bandwidth-reducing node
    permutation is tried (Hilbert on ``coords`` when given, else RCM —
    graph/reorder.py). ``perm`` (``perm[new]=old``) is non-None when the
    layouts live in the REORDERED id space: permute node features once on
    the host (``x[perm]``) and run in the new order; real builders emit
    FILE order (/root/reference/src/gbuilder.py:392-424), not spatial.
    """
    from .spmm_dense import prepare_dense_mean_aggregate

    if reorder:
        from ..graph.reorder import relabel_edges, reorder_for_banding

        try:
            perm = reorder_for_banding(src, dst, num_nodes, tile=tile,
                                       coords=coords)
        except ValueError:
            perm = None  # not bandable under any candidate order
        if perm is not None:
            src, dst = relabel_edges(src, dst, perm)
        out = prepare_auto_mean_aggregate(
            src, dst, num_nodes, tile=tile, dense_k=dense_k,
            k_per_step=k_per_step, edge_chunk=edge_chunk,
            a_budget_bytes=a_budget_bytes, min_pair_edges=min_pair_edges)
        return (*out, perm)

    if dense_tile_bytes(src, dst, num_nodes, tile=tile, dense_k=dense_k,
                        itemsize=1) <= a_budget_bytes:
        try:
            # banded first: windowed x streaming, 1.38x over compact dense
            # on locality graphs. The residual builder picks the TIGHTEST
            # span whose overflow stays under its threshold (a handful of
            # outlier blocks must not dictate every block's A bytes /
            # window size — ops/banded_residual.py); when the overflow is
            # empty the plain banded layout is the same kernel without the
            # residual bookkeeping. Raises when the graph is not (near-)
            # banded under this node order.
            from .banded_residual import prepare_banded_residual_mean_aggregate
            from .spmm_banded import prepare_banded_mean_aggregate

            layout, n_pad = prepare_banded_residual_mean_aggregate(
                src, dst, num_nodes, tile=tile, k=max(dense_k, 4))
            if len(layout.r_src) == 0:
                return prepare_banded_mean_aggregate(
                    src, dst, num_nodes, tile=tile, k=max(dense_k, 4),
                    dtype=np.int8)
            return layout, None, n_pad
        except ValueError:
            pass
        try:
            return prepare_dense_mean_aggregate(
                src, dst, num_nodes, tile=tile, pad_blocks_to=dense_k,
                dtype=np.int8)
        except ValueError:  # duplicate-edge multiplicity > 127
            if dense_tile_bytes(src, dst, num_nodes, tile=tile,
                                dense_k=dense_k, itemsize=2) <= a_budget_bytes:
                fwd, rev, n_pad = prepare_dense_mean_aggregate(
                    src, dst, num_nodes, tile=tile, pad_blocks_to=dense_k)
                bf16 = jnp.bfloat16.dtype  # numpy-compatible ml_dtypes bf16
                fwd = DenseBlocks(a=fwd.a.astype(bf16), src_blk=fwd.src_blk, tile=tile)
                rev = DenseBlocks(a=rev.a.astype(bf16), src_blk=rev.src_blk, tile=tile)
                return fwd, rev, n_pad
    layout, n_pad = prepare_hybrid_mean_aggregate(
        src, dst, num_nodes, tile=tile, dense_k=dense_k, k_per_step=k_per_step,
        edge_chunk=edge_chunk, min_pair_edges=min_pair_edges,
        a_budget_bytes=a_budget_bytes, dense_dtype=np.int8)
    return layout, None, n_pad
