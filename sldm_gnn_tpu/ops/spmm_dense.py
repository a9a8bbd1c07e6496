"""Dense-block SpMM — sparse aggregation as a blocked dense matmul.

For spatially-local graphs (the reference's lane-segment maps and
trajectory-proximity packs), nodes sorted by position give a block-banded
adjacency: each TILE-row destination block touches only a few TILE-column
source blocks. Since the edge set is static across a training run, the
per-(dst,src)-block dense adjacency tiles can be PRECOMPUTED once:

    A[b, s][i, j] = sum of w_e over edges (src_blocks[b,s]*T + j -> b*T + i)

and every aggregation becomes a completely regular blocked matmul

    out[b*T : b*T+T] = sum_s A[b, s] @ X[src_blocks[b, s]]

FLOP comparison with the one-hot-matmul kernel (ops/spmm.py): one-hot pays
4*E*T*D per aggregation (two [EC,T]x[T,D] products per edge chunk); this
kernel pays 2*pairs*T^2*D, where ``pairs`` is the number of non-empty
(dst,src) block pairs — on the 3.2M-edge headline graph that is ~10x fewer
FLOPs, all of them MXU-perfect dense tiles with zero gather/scatter work.
The trade is HBM: A blocks cost pairs*T^2*2 bytes (bf16), so this backend
suits graphs whose block density exceeds ~1/T (one-hot stays the choice
for very sparse/irregular or huge graphs).

Backward = the same kernel over transposed blocks (builder called with
src/dst swapped), wired as a custom VJP like ops/spmm.spmm_apply.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TILE, pad_nodes
from .spmm import _operand_vma


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DenseBlocks:
    """Precomputed block-sparse adjacency in dense-tile form.

    a        [B, S_max, T, T] — per dst block, its src-block adjacency
                                tiles (bf16 by default; weights folded in;
                                all-zero padding tiles). May be int8 when
                                the weights are factored out into
                                ``row_scale``/``col_scale`` (exact for mean
                                aggregation, whose 1/deg weight is constant
                                per dst row — A = diag(s) @ counts). int8
                                halves A's HBM storage AND streaming
                                bandwidth, the binding resource at the
                                ~50M-edge scale.
    src_blk  [B, S_max] int32 — source block index per tile (0 on padding;
                                the zero A tile makes it a no-op).
    row_scale [B*T, 1] f32 or None — per-OUTPUT-row scale applied after
                                the tile matmuls (fwd direction of the
                                factored mean layout).
    col_scale [B*T, 1] f32 or None — per-INPUT-row scale applied to x
                                before the tile matmuls (the transpose of a
                                row-scaled operator scales its input:
                                (diag(s)Q)^T = Q^T diag(s) — rev direction).
    tile: static tile height T.
    """

    a: jax.Array
    src_blk: jax.Array
    row_scale: jax.Array | None = None
    col_scale: jax.Array | None = None
    tile: int = field(default=TILE, metadata=dict(static=True))

    @property
    def num_dst_blocks(self) -> int:
        return self.a.shape[0]

    @property
    def s_max(self) -> int:
        return self.a.shape[1]


def build_dense_blocks(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    weight: np.ndarray | None = None,
    tile: int = TILE,
    dtype=np.float32,
    pad_blocks_to: int = 1,
) -> DenseBlocks:
    """Host-side construction of the dense adjacency tiles (numpy).

    Duplicate (src, dst) edges sum their weights — identical semantics to
    edge-list aggregation. ``pad_blocks_to`` rounds the dst-block count up
    (all-zero tiles) so the kernel can run ``step_blocks`` > 1.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if len(src) and (
        src.min() < 0 or dst.min() < 0 or src.max() >= num_nodes or dst.max() >= num_nodes
    ):
        raise ValueError(f"edge endpoints out of range [0, {num_nodes})")
    if weight is None:
        weight = np.ones(len(src), np.float32)
    weight = np.asarray(weight, np.float32)

    n_pad = pad_nodes(num_nodes, tile)
    nb = n_pad // tile
    nb = ((nb + pad_blocks_to - 1) // pad_blocks_to) * pad_blocks_to

    if len(src) >= 100_000:
        from ..build.native import native_dense_blocks

        out = native_dense_blocks(src, dst, weight, nb, tile)
        if out is not None:
            a, src_blk = out
            a = a.astype(dtype, copy=False)  # no-op for the default f32
            return DenseBlocks(a=a, src_blk=src_blk, tile=tile)

    db = dst // tile
    sb = src // tile

    # enumerate non-empty (dst_block, src_block) pairs
    key = db * nb + sb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    bounds = np.r_[0, np.nonzero(np.diff(key_s))[0] + 1, len(key_s)] if len(key_s) else np.array([0])
    pair_keys = key_s[bounds[:-1]] if len(key_s) else np.zeros(0, np.int64)
    pair_db = (pair_keys // nb).astype(np.int64)
    pair_sb = (pair_keys % nb).astype(np.int64)

    counts = np.zeros(nb, np.int64)
    if len(pair_db):
        counts = np.bincount(pair_db, minlength=nb)
    s_max = max(int(counts.max()) if len(counts) else 0, 1)

    a = np.zeros((nb, s_max, tile, tile), np.float32)
    src_blk = np.zeros((nb, s_max), np.int32)
    slot_of = np.zeros(nb, np.int64)
    pair_slot = np.empty(len(pair_db), np.int64)
    for p in range(len(pair_db)):
        b = pair_db[p]
        pair_slot[p] = slot_of[b]
        src_blk[b, slot_of[b]] = pair_sb[p]
        slot_of[b] += 1

    if len(src):
        # per-edge pair id -> (dst_block, slot); scatter-add weights
        pair_of_edge = np.searchsorted(pair_keys, key)
        slot = pair_slot[pair_of_edge]
        np.add.at(
            a,
            (db, slot, dst - db * tile, src - sb * tile),
            weight,
        )

    return DenseBlocks(a=a.astype(dtype), src_blk=src_blk, tile=tile)


# ------------------------------------------------------------- Pallas path


def _dense_kernel(sblk_ref, a_ref, *x_out, s_max, step_blocks, tile, has_row):
    K = step_blocks
    x_refs = x_out[: K * s_max]
    rs_ref = x_out[K * s_max] if has_row else None
    out_ref = x_out[K * s_max + (1 if has_row else 0)]
    for k in range(K):
        acc = jnp.zeros((tile, out_ref.shape[1]), jnp.float32)
        for s in range(s_max):
            acc += jnp.dot(
                a_ref[k, s].astype(jnp.bfloat16),
                x_refs[k * s_max + s][:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        if has_row:
            acc = acc * rs_ref[k * tile : (k + 1) * tile]
        out_ref[k * tile : (k + 1) * tile] = acc.astype(out_ref.dtype)


def spmm_dense_pallas(
    x: jax.Array,
    blocks: DenseBlocks,
    *,
    interpret: bool = False,
    step_blocks: int = 1,
):
    """out[i] = sum_e w_e x[src_e] over the precomputed dense tiles.

    ``x`` must be padded to ``num_dst_blocks * tile`` rows; f32 or bf16
    (operands are rounded to bf16 on the MXU either way, matching the
    one-hot kernel's DEFAULT precision). ``step_blocks`` processes K dst
    blocks per grid step, amortizing per-step overhead (num_dst_blocks
    must be divisible by K — build with ``pad_blocks_to``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    tile = blocks.tile
    nb = blocks.num_dst_blocks
    s_max = blocks.s_max
    assert n_pad == nb * tile, (n_pad, nb, tile)
    K = step_blocks
    if nb % K:
        raise ValueError(f"num_dst_blocks {nb} not divisible by step_blocks {K}; "
                         f"build with pad_blocks_to={K}")
    steps = nb // K

    def a_spec():
        return pl.BlockSpec((K, s_max, tile, tile), lambda b, sblk: (b, 0, 0, 0))

    def x_spec(k, s):
        return pl.BlockSpec(
            (tile, d), lambda b, sblk, k=k, s=s: (sblk[(b * K + k) * s_max + s], 0)
        )

    has_row = blocks.row_scale is not None
    if blocks.col_scale is not None:
        # input-row scale (transpose of a row-scaled operator). Applied as
        # ONE elementwise pass over x here rather than per-tile inside the
        # kernel: each x row is read by ~s_max block pairs, so the in-kernel
        # form repeats the multiply s_max-fold (measured 7.4 vs 6.3 ms per
        # headline fwd+bwd step).
        x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)
    extra_specs, extra_args = [], []
    if has_row:
        extra_specs.append(pl.BlockSpec((K * tile, 1), lambda b, sblk: (b, 0)))
        extra_args.append(blocks.row_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # flattened [B * S_max] src block ids
        grid=(steps,),
        in_specs=[a_spec()]
        + [x_spec(k, s) for k in range(K) for s in range(s_max)]
        + extra_specs,
        out_specs=pl.BlockSpec((K * tile, d), lambda b, sblk: (b, 0)),
    )
    return pl.pallas_call(
        partial(_dense_kernel, s_max=s_max, step_blocks=K, tile=tile,
                has_row=has_row),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), x.dtype,
            vma=_operand_vma(x, blocks.a, blocks.src_blk)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * s_max * tile * tile * d,
            bytes_accessed=blocks.a.size * blocks.a.dtype.itemsize + n_pad * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(blocks.src_blk.reshape(-1), blocks.a, *([x] * (K * s_max)), *extra_args)


def spmm_dense_xla(x: jax.Array, blocks: DenseBlocks):
    """XLA reference: einsum over the same dense tiles (any backend)."""
    nb, s_max, tile, _ = blocks.a.shape
    if blocks.col_scale is not None:
        x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)
    xb = x.reshape(-1, tile, x.shape[1])  # [NB, T, D]
    gathered = xb[blocks.src_blk]  # [B, S_max, T, D]
    out = jnp.einsum("bsij,bsjd->bid", blocks.a.astype(x.dtype), gathered)
    out = out.reshape(nb * tile, x.shape[1])
    if blocks.row_scale is not None:
        out = (out.astype(jnp.float32) * blocks.row_scale).astype(x.dtype)
    return out


# --------------------------------------------------- differentiable wrapper


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spmm_dense_apply(
    x, blocks_fwd: DenseBlocks, blocks_rev: DenseBlocks, use_pallas: bool,
    step_blocks: int = 1,
):
    """Aggregation with a transposed-blocks backward pass."""
    return _dispatch(x, blocks_fwd, use_pallas, step_blocks)


def _dispatch(x, blocks, use_pallas, step_blocks=1):
    if use_pallas:
        return spmm_dense_pallas(x, blocks, step_blocks=step_blocks)
    return spmm_dense_xla(x, blocks)


def _fwd(x, blocks_fwd, blocks_rev, use_pallas, step_blocks):
    return _dispatch(x, blocks_fwd, use_pallas, step_blocks), (blocks_rev,)


def _bwd(use_pallas, step_blocks, res, g):
    (blocks_rev,) = res
    return _dispatch(g, blocks_rev, use_pallas, step_blocks), None, None


spmm_dense_apply.defvjp(_fwd, _bwd)


def prepare_dense_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    dtype=np.float32,
    pad_blocks_to: int = 1,
) -> tuple[DenseBlocks, DenseBlocks, int]:
    """Forward + reverse dense-block layouts for mean aggregation
    (mirrors ops/spmm.prepare_mean_aggregate). Returns layouts plus the
    padded row count (num_dst_blocks * tile — pad x to this).

    ``dtype`` int8 selects the factored layout: mean aggregation's weight
    is 1/deg(dst) — constant per dst row — so A = diag(1/deg) @ counts
    factors EXACTLY into int8 count tiles plus a per-node f32 scale. Same
    math, half the A-tile HBM storage and streaming bandwidth; requires
    duplicate-edge multiplicity ≤ 127 (raises otherwise).
    """
    from ..graph.csr import mean_weights

    if np.dtype(dtype) == np.int8:
        return _prepare_int8_mean_aggregate(src, dst, num_nodes, tile=tile,
                                            pad_blocks_to=pad_blocks_to)
    w = mean_weights(dst, num_nodes)
    fwd = build_dense_blocks(src, dst, num_nodes, weight=w, tile=tile, dtype=dtype,
                             pad_blocks_to=pad_blocks_to)
    rev = build_dense_blocks(dst, src, num_nodes, weight=w, tile=tile, dtype=dtype,
                             pad_blocks_to=pad_blocks_to)
    return fwd, rev, fwd.num_dst_blocks * tile


def _prepare_int8_mean_aggregate(src, dst, num_nodes, *, tile, pad_blocks_to):
    """Factored mean layouts: int8 duplicate-edge-count tiles; the 1/deg
    scale rides as ``row_scale`` on the forward layout (output rows) and as
    ``col_scale`` on the reverse layout (the transpose of diag(s)·Q scales
    its input: grad_x = Qᵀ @ (s ⊙ g))."""
    from ..graph.csr import check_edge_range

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)  # native fills index raw buffers
    nb = pad_nodes(num_nodes, tile) // tile
    nb = ((nb + pad_blocks_to - 1) // pad_blocks_to) * pad_blocks_to

    fwd = rev = None
    if len(src) >= 100_000:
        # native int8 count fill: no [nb, s_max, T, T] float32 transient
        # (9+ GB per direction at ~50M edges — it dominated layout prep)
        from ..build.native import native_dense_blocks_i8

        out_f = native_dense_blocks_i8(src, dst, nb, tile)
        out_r = native_dense_blocks_i8(dst, src, nb, tile)
        if out_f is not None and out_r is not None:
            cmax = max(out_f[2], out_r[2], 1)
            if cmax > 127:
                raise ValueError(
                    f"duplicate-edge multiplicity {cmax} overflows int8 counts"
                )
            fwd = DenseBlocks(a=out_f[0], src_blk=out_f[1], tile=tile)
            rev = DenseBlocks(a=out_r[0], src_blk=out_r[1], tile=tile)
    if fwd is None:
        fwd = build_dense_blocks(src, dst, num_nodes, tile=tile, pad_blocks_to=pad_blocks_to)
        rev = build_dense_blocks(dst, src, num_nodes, tile=tile, pad_blocks_to=pad_blocks_to)
        cmax = max(fwd.a.max() if fwd.a.size else 0, 1)
        if cmax > 127:
            raise ValueError(f"duplicate-edge multiplicity {cmax} overflows int8 counts")
    n_pad = nb * tile
    deg = np.bincount(np.asarray(dst, np.int64), minlength=n_pad)
    scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)
    fwd = DenseBlocks(a=fwd.a.astype(np.int8, copy=False), src_blk=fwd.src_blk,
                      row_scale=scale, tile=tile)
    rev = DenseBlocks(a=rev.a.astype(np.int8, copy=False), src_blk=rev.src_blk,
                      col_scale=scale, tile=tile)
    return fwd, rev, n_pad
