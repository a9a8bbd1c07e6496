"""SDDMM — sampled dense-dense matmul: per-edge dot products.

Computes ``score[e] = <x[dst_e], y[src_e]>`` for every edge — the second
hot op named by the north-star (BASELINE.json: "Pallas SpMM/SDDMM kernels
over padded CSR/COO edge blocks"), and the building block of edge-attention
GNN layers (scores -> per-destination softmax -> weighted SpMM).

Pallas design over the same blocked layout as SpMM: per (dst-tile,
src-tile) chunk the MXU computes the full dense tile product
``S = X_dst_tile @ Y_src_tile^T`` [TILE, TILE]; per-edge entries are then
extracted with the one-hot trick on the VPU:

    score[e] = rowsum( (onehot_dst @ S) * onehot_src )[e]

Outputs stay in chunk layout ``[W, EC]`` (mask = weight != 0);
:func:`chunk_scores_to_edge_order` maps them back to edge order via the
layout's ``edge_id`` slots.

Backward: d x = aggregate of g-weighted y over the edges (an SpMM with the
cotangent as per-edge weights), and symmetrically for d y over the reverse
layout — both reuse the Pallas SpMM with a swapped-in weight array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import auto_edge_chunk, TILE, BlockedEdges, block_edges, pad_nodes
from .spmm import spmm_pallas, spmm_xla, _spmm_dispatch, _operand_vma


# ---------------------------------------------------------------- XLA path


def sddmm_xla(x, y, src, dst):
    """Per-edge dot products (edge order)."""
    return jnp.sum(x[dst] * y[src], axis=-1)


# ------------------------------------------------------------- Pallas path


def _sddmm_kernel(dblk_ref, sblk_ref, src_ref, dst_ref, w_ref, x_ref, y_ref, out_ref):
    from jax.experimental import pallas as pl

    ec = src_ref.shape[-1]
    tile = x_ref.shape[0]
    s = jnp.dot(
        x_ref[:], y_ref[:].T, preferred_element_type=jnp.float32
    )  # [TILE_dst, TILE_src]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ec, tile), 1)
    oh_d = (dst_ref[0, 0][:, None] == lane).astype(jnp.float32)
    oh_s = (src_ref[0, 0][:, None] == lane).astype(jnp.float32)
    rows = jnp.dot(oh_d, s, preferred_element_type=jnp.float32)  # [EC, TILE_src]
    valid = (w_ref[0, 0] != 0.0).astype(jnp.float32)
    out_ref[0, 0, :] = jnp.sum(rows * oh_s, axis=1) * valid


def sddmm_pallas(x: jax.Array, y: jax.Array, blocked: BlockedEdges, *, interpret: bool = False):
    """Chunk-layout scores [W, EC]; padding slots are 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    tile = blocked.tile
    assert n_pad % tile == 0
    W = blocked.num_chunks
    ec = blocked.src_local.shape[1]

    src3 = blocked.src_local.reshape(W, 1, ec)
    dst3 = blocked.dst_local.reshape(W, 1, ec)
    w3 = blocked.weight.reshape(W, 1, ec)
    dblk = blocked.block_meta[:, 0]
    sblk = blocked.block_meta[:, 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 1, ec), lambda w, dblk, sblk: (w, 0, 0)),
            pl.BlockSpec((1, 1, ec), lambda w, dblk, sblk: (w, 0, 0)),
            pl.BlockSpec((1, 1, ec), lambda w, dblk, sblk: (w, 0, 0)),
            pl.BlockSpec((tile, d), lambda w, dblk, sblk: (dblk[w], 0)),
            pl.BlockSpec((tile, d), lambda w, dblk, sblk: (sblk[w], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ec), lambda w, dblk, sblk: (w, 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (W, 1, ec), jnp.float32,
            vma=_operand_vma(x, y, blocked.block_meta, blocked.weight)),
        cost_estimate=pl.CostEstimate(
            flops=W * (2 * tile * tile * d + 2 * ec * tile * tile),
            bytes_accessed=W * 2 * tile * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dblk, sblk, src3, dst3, w3, x, y)
    return out.reshape(W, ec)


def _sddmm_chunk_xla(x, y, blocked: BlockedEdges):
    src = blocked.block_meta[:, 1][:, None] * blocked.tile + blocked.src_local
    dst = blocked.block_meta[:, 0][:, None] * blocked.tile + blocked.dst_local
    valid = (blocked.weight != 0.0).astype(jnp.float32)
    return jnp.sum(x[dst] * y[src], axis=-1) * valid


def chunk_scores_to_edge_order(scores: jax.Array, blocked: BlockedEdges, num_edges: int):
    """Map chunk-layout scores [W, EC] back to edge-list order [E]."""
    valid = blocked.weight.reshape(-1) != 0.0
    eid = blocked.edge_id.reshape(-1)
    flat = scores.reshape(-1)
    out = jnp.zeros(num_edges, flat.dtype)
    return out.at[jnp.where(valid, eid, num_edges)].add(
        jnp.where(valid, flat, 0.0), mode="drop"
    )


# --------------------------------------------------- differentiable wrapper


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def sddmm_apply(x, y, blocked_fwd, blocked_rev, num_nodes: int, use_pallas: bool, num_edges: int):
    """Edge-order scores [E] with SpMM-based backward."""
    return _sddmm_forward(x, y, blocked_fwd, num_nodes, use_pallas, num_edges)


def _sddmm_forward(x, y, blocked, num_nodes, use_pallas, num_edges):
    chunks = (
        sddmm_pallas(x, y, blocked) if use_pallas else _sddmm_chunk_xla(x, y, blocked)
    )
    return chunk_scores_to_edge_order(chunks, blocked, num_edges)


def _sddmm_fwd(x, y, blocked_fwd, blocked_rev, num_nodes, use_pallas, num_edges):
    out = _sddmm_forward(x, y, blocked_fwd, num_nodes, use_pallas, num_edges)
    return out, (x, y, blocked_fwd, blocked_rev)


def _sddmm_bwd(num_nodes, use_pallas, num_edges, res, g):
    x, y, blocked_fwd, blocked_rev = res
    # per-edge cotangents -> chunk layouts of both edge orientations
    valid_f = blocked_fwd.weight != 0.0
    g_fwd = jnp.where(valid_f, g[blocked_fwd.edge_id], 0.0)
    valid_r = blocked_rev.weight != 0.0
    g_rev = jnp.where(valid_r, g[blocked_rev.edge_id], 0.0)
    # dx[d] = sum_e g_e * y[src_e]  — aggregate y along src->dst
    dx = _spmm_dispatch(
        y, _with_weight(blocked_fwd, g_fwd), num_nodes, use_pallas
    )
    # dy[s] = sum_e g_e * x[dst_e]  — aggregate x along dst->src (reverse)
    dy = _spmm_dispatch(
        x, _with_weight(blocked_rev, g_rev), num_nodes, use_pallas
    )
    return dx, dy, None, None


def _with_weight(blocked: BlockedEdges, w: jax.Array) -> BlockedEdges:
    return BlockedEdges(
        block_meta=blocked.block_meta,
        src_local=blocked.src_local,
        dst_local=blocked.dst_local,
        weight=w,
        edge_id=blocked.edge_id,
        tile=blocked.tile,
        step_chunks=blocked.step_chunks,
    )


sddmm_apply.defvjp(_sddmm_fwd, _sddmm_bwd)


def prepare_sddmm(src: np.ndarray, dst: np.ndarray, num_nodes: int):
    """Build (blocked_fwd, blocked_rev, n_pad) layouts for SDDMM.

    blocked_rev swaps roles: its "dst" is the original src (so aggregation
    over it lands cotangents on source nodes). Both carry unit weights
    (validity only) and edge ids into the *original* edge list.
    """
    n_pad = pad_nodes(num_nodes)
    # SMEM-safe chunk width at 10M+-edge scales (see graph.csr.auto_edge_chunk)
    ec = auto_edge_chunk(len(src))
    fwd = block_edges(src, dst, n_pad, edge_chunk=ec)
    rev = block_edges(dst, src, n_pad, edge_chunk=ec)
    return fwd, rev, n_pad
