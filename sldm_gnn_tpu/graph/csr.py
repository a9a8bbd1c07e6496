"""Blocked edge format for TPU SpMM.

Host-side preprocessing that turns an arbitrary edge list into the
MXU-friendly layout consumed by the Pallas SpMM kernel
(:mod:`sldm_gnn_tpu.ops.spmm`):

  * nodes are tiled into blocks of ``TILE`` (=128, the lane width);
  * edges are grouped by (dst_block, src_block) pairs and chunked into
    fixed-size chunks of ``EDGE_CHUNK`` edges (padded with weight-0 dummy
    edges);
  * chunks are sorted by dst_block so the kernel can accumulate a dst tile
    across consecutive grid steps and write it back exactly once
    (Pallas output-block revisiting);
  * every dst block gets at least one (possibly all-dummy) chunk so the
    output is fully initialized;
  * per-edge weights (e.g. 1/deg for mean aggregation) are folded into the
    chunk weight array, so inside the kernel gather+scatter collapse into
    two one-hot matmuls per chunk.

This format is the TPU answer to the reference's torch_scatter CSR kernels
(SURVEY.md §2.3): instead of random-access gather/scatter, all data motion
is dense 128-aligned tiles and all compute is MXU matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

TILE = 128
# 256 measured best on v5e: halves chunk count vs 128 (less grid overhead,
# bigger one-hot matmuls) while keeping padding waste moderate
EDGE_CHUNK = 256


def check_edge_range(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> None:
    """Raise ValueError on out-of-range edge endpoints. Every builder that
    hands edges to the native C++ fills MUST call this first — the C++
    paths index raw buffers and out-of-range endpoints are heap corruption
    there, not an exception."""
    if len(src) and (
        src.min() < 0 or dst.min() < 0 or src.max() >= num_nodes or dst.max() >= num_nodes
    ):
        raise ValueError(
            f"edge endpoints out of range [0, {num_nodes}): "
            f"src [{src.min()}, {src.max()}], dst [{dst.min()}, {dst.max()}]"
        )


def auto_edge_chunk(n_edges: int, edge_chunk: int = EDGE_CHUNK,
                    max_chunks: int = 65536) -> int:
    """Scale the chunk width up so the layout's chunk count stays under
    ``max_chunks``: the SpMM kernel scalar-prefetches per-chunk (dst_block,
    src_block) metadata into SMEM (~1 MB on v5e), so ~100M-edge layouts at
    the default width overflow it (observed at 140k chunks: 2 x 548 KB
    prefetched operands). Doubling keeps the width a power-of-two multiple
    of the tuned default."""
    ec = edge_chunk
    while n_edges > ec * max_chunks:
        ec *= 2
    return ec


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockedEdges:
    """Device arrays of the blocked layout.

    block_meta [W, 2] int32 — (dst_block, src_block) per work chunk,
                              sorted by dst_block.
    src_local  [W, EC] int32 — src index within the src block.
    dst_local  [W, EC] int32 — dst index within the dst block.
    weight     [W, EC] float32 — per-edge weight; 0 for padding edges.
    edge_id    [W, EC] int32 or None — original edge-list index per slot
                              (0 on padding slots; mask with weight != 0).
                              Lets chunk-layout values (e.g. SDDMM scores)
                              be mapped back to edge order.
    """

    block_meta: jax.Array
    src_local: jax.Array
    dst_local: jax.Array
    weight: jax.Array
    edge_id: jax.Array | None = None
    # node-tile height of the layout (static pytree metadata)
    tile: int = field(default=TILE, metadata=dict(static=True))
    # per-dst-block chunk-count multiple the layout was built with: the
    # kernel's k_per_step must divide it (grid steps must never straddle a
    # dst block), and spmm_pallas enforces that — W % K alone can pass by
    # coincidence and silently misroute edges
    step_chunks: int = field(default=1, metadata=dict(static=True))

    @property
    def num_chunks(self) -> int:
        return self.block_meta.shape[0]


def block_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    weight: np.ndarray | None = None,
    tile: int = TILE,
    edge_chunk: int = EDGE_CHUNK,
    step_chunks: int = 1,
) -> BlockedEdges:
    """Build the blocked layout from an edge list (host-side numpy).

    ``step_chunks`` > 1 pads every dst block's chunk count to a multiple of
    K so the kernel can process K chunks per grid step (amortizing per-step
    overhead); the dummy pad chunks carry weight 0.

    Large edge lists route through the native C++ builder
    (native/libgraphbuild.so) when built — the python group loop is the
    practical bottleneck at the ~50M-edge benchmark scale.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    check_edge_range(src, dst, num_nodes)
    if len(src) >= 100_000:
        from ..build.native import native_block_edges

        out = native_block_edges(
            src, dst, num_nodes, weight=weight, tile=tile,
            edge_chunk=edge_chunk, step_chunks=step_chunks,
        )
        if out is not None:
            meta, src_local, dst_local, w_arr, eid = out
            return BlockedEdges(
                block_meta=meta, src_local=src_local, dst_local=dst_local,
                weight=w_arr, edge_id=eid, tile=tile, step_chunks=step_chunks,
            )
    E = src.shape[0]
    if weight is None:
        weight = np.ones(E, dtype=np.float32)
    weight = np.asarray(weight, dtype=np.float32)

    num_blocks = max((num_nodes + tile - 1) // tile, 1)

    sb = src // tile
    db = dst // tile
    # sort edges by (dst_block, src_block)
    order = np.lexsort((sb, db))
    src_s, dst_s, w_s, sb_s, db_s = src[order], dst[order], weight[order], sb[order], db[order]
    eid_s = order.astype(np.int32)

    metas: list[tuple[int, int]] = []
    chunks_src: list[np.ndarray] = []
    chunks_dst: list[np.ndarray] = []
    chunks_w: list[np.ndarray] = []
    chunks_e: list[np.ndarray] = []

    def emit(dblk: int, sblk: int, sl: np.ndarray, dl: np.ndarray, wl: np.ndarray, el: np.ndarray):
        for off in range(0, len(sl), edge_chunk):
            s_pad = np.zeros(edge_chunk, np.int32)
            d_pad = np.zeros(edge_chunk, np.int32)
            w_pad = np.zeros(edge_chunk, np.float32)
            e_pad = np.zeros(edge_chunk, np.int32)
            n = min(edge_chunk, len(sl) - off)
            s_pad[:n] = sl[off : off + n]
            d_pad[:n] = dl[off : off + n]
            w_pad[:n] = wl[off : off + n]
            e_pad[:n] = el[off : off + n]
            metas.append((dblk, sblk))
            chunks_src.append(s_pad)
            chunks_dst.append(d_pad)
            chunks_w.append(w_pad)
            chunks_e.append(e_pad)

    if E:
        # group boundaries over the sorted (db, sb) pairs
        key = db_s * num_blocks + sb_s
        bounds = np.r_[0, np.nonzero(np.diff(key))[0] + 1, E]
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            dblk, sblk = int(db_s[b0]), int(sb_s[b0])
            emit(
                dblk,
                sblk,
                (src_s[b0:b1] - sblk * tile).astype(np.int32),
                (dst_s[b0:b1] - dblk * tile).astype(np.int32),
                w_s[b0:b1],
                eid_s[b0:b1],
            )

    def emit_dummy(dblk: int):
        metas.append((dblk, 0))
        chunks_src.append(np.zeros(edge_chunk, np.int32))
        chunks_dst.append(np.zeros(edge_chunk, np.int32))
        chunks_w.append(np.zeros(edge_chunk, np.float32))
        chunks_e.append(np.zeros(edge_chunk, np.int32))

    # ensure every dst block is visited at least once (all-dummy chunk)
    covered = {m[0] for m in metas}
    for dblk in range(num_blocks):
        if dblk not in covered:
            emit_dummy(dblk)

    # pad each dst block's chunk count to a multiple of step_chunks
    if step_chunks > 1:
        per_block: dict[int, int] = {}
        for m in metas:
            per_block[m[0]] = per_block.get(m[0], 0) + 1
        for dblk, cnt in per_block.items():
            for _ in range((-cnt) % step_chunks):
                emit_dummy(dblk)

    meta_arr = np.array(metas, np.int32).reshape(-1, 2)
    # keep dst blocks contiguous (required for output revisiting)
    order2 = np.argsort(meta_arr[:, 0], kind="stable")
    meta_arr = meta_arr[order2]
    src_arr = np.stack(chunks_src)[order2]
    dst_arr = np.stack(chunks_dst)[order2]
    w_arr = np.stack(chunks_w)[order2]
    e_arr = np.stack(chunks_e)[order2]

    return BlockedEdges(
        block_meta=meta_arr,
        src_local=src_arr,
        dst_local=dst_arr,
        weight=w_arr,
        edge_id=e_arr,
        tile=tile,
        step_chunks=step_chunks,
    )


def mean_weights(dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Per-edge 1/deg(dst) weights turning sum aggregation into mean."""
    deg = np.bincount(np.asarray(dst, np.int64), minlength=num_nodes)
    return (1.0 / np.maximum(deg, 1))[dst].astype(np.float32)


def pad_nodes(num_nodes: int, tile: int = TILE) -> int:
    return max(((num_nodes + tile - 1) // tile) * tile, tile)
