"""Banded dense SpMM — windowed x streaming for locality graphs.

The dense-block kernel (ops/spmm_dense.py) streams one [T, D] x tile per
non-empty (dst, src) block pair. On banded graphs (spatially sorted nodes
with bounded-reach edges — the reference's lane maps and trajectory packs,
SURVEY.md §2.2) neighboring destination blocks read almost the same source
tiles, so per-pair streaming moves each x row ~s_span times. Measured at
the 3.2M-edge headline: 0.256 GB of x per aggregation vs 0.128 GB of int8
A — x dominates the kernel's HBM traffic.

This kernel groups K destination blocks per grid step and DMAs ONE
contiguous x window covering all their source ranges (double-buffered,
overlapped with compute):

    window_g = x[woff[g]*T : (woff[g]+WSZ)*T]          one ~300 KB DMA
    out[b]   = sum_s A[b, s] @ window[off[b] + s]      per block in group

A stays compact ([nb, s_span, T, T], slot s = src block bo[b]+s, zero
tiles for untouched blocks in the span) because each block carries its own
window offset ``off[b] = bo[b] - woff[g]`` (scalar-prefetched; dynamic
row-slices into the VMEM window). x traffic per aggregation drops from
``pairs*T*D`` to ``(nb/K)*WSZ*T*D`` — ~K/(1 + (K-1)/s_span)-fold less.

Applies only when every destination block's source blocks fit a bounded
contiguous band (``s_span`` small); the builder raises otherwise and
callers fall back to ops/spmm_dense.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TILE, pad_nodes
from .spmm import _operand_vma


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BandedBlocks:
    """Banded dense adjacency + per-group window metadata.

    a     [NB, S_SPAN, T, T] — slot s holds the adjacency tile for source
                               block ``bo[b] + s`` (zeros when untouched).
                               int8 counts (factored mean) or float.
                               When ``wide``: [NB, T, S_SPAN*T] — the slot
                               axis folded into columns so each block is ONE
                               [T, S*T] @ [S*T, D] MXU matmul (contraction
                               depth S*T instead of T).
    bo    [NB] int32         — slot-base source block per destination block:
                               ``min(first source block, NB - S_SPAN)`` so
                               slots [bo, bo+S_SPAN) always lie inside the
                               node range (and inside the DMA'd window).
    woff  [steps] int32      — x-window base (in tiles) per K-group.
    off   [steps*K] int32    — ``bo[b] - woff[group(b)]`` per block;
                               ``off + S_SPAN <= wsz`` by construction.
    row_scale / col_scale    — as in ops/spmm_dense.DenseBlocks.
    wsz   static             — window size in tiles (covers every group).
    k     static             — destination blocks per grid step.
    """

    a: jax.Array
    bo: jax.Array
    woff: jax.Array
    off: jax.Array
    row_scale: jax.Array | None = None
    col_scale: jax.Array | None = None
    # cmap [NB * S_SPAN] int32 (optional): per-(block, slot) WINDOW-
    # RELATIVE source-tile index — slot s of block b reads window tile
    # cmap[b*S+s] instead of off[b]+s. Slots become an arbitrary SET of
    # source tiles instead of a contiguous band, so low-degree graphs
    # (deg≈3 city maps) carry only their nonzero source tiles: A bytes
    # drop from nb*span*T*T toward nb*c*T*T (ops/spmm_cmap.py builder).
    # Rides the scalar prefetch — tile-level indirection is Mosaic-
    # expressible where the per-element gather tier was not
    # (ops/spmm_gather.py).
    cmap: jax.Array | None = None
    tile: int = field(default=TILE, metadata=dict(static=True))
    wsz: int = field(default=8, metadata=dict(static=True))
    k: int = field(default=4, metadata=dict(static=True))
    wide: bool = field(default=False, metadata=dict(static=True))

    @property
    def num_dst_blocks(self) -> int:
        return self.a.shape[0]

    @property
    def s_span(self) -> int:
        return self.a.shape[2] // self.tile if self.wide else self.a.shape[1]


def widen_banded(blocks: BandedBlocks) -> BandedBlocks:
    """[NB, S, T, T] → [NB, T, S*T]: fold the slot axis into columns. The
    per-block aggregation then contracts over S*T in one matmul — better
    systolic-array utilization than S chained depth-T matmuls (host-side;
    the layouts are built once per static edge set)."""
    if blocks.wide:
        return blocks
    assert blocks.cmap is None, "cmap slots are non-contiguous; keep narrow"
    a = np.asarray(blocks.a)
    nb, s, t, _ = a.shape
    a = np.ascontiguousarray(a.transpose(0, 2, 1, 3)).reshape(nb, t, s * t)
    return BandedBlocks(
        a=a, bo=blocks.bo, woff=blocks.woff, off=blocks.off,
        row_scale=blocks.row_scale, col_scale=blocks.col_scale,
        tile=blocks.tile, wsz=blocks.wsz, k=blocks.k, wide=True,
    )


def int4_count_safe(blocks: BandedBlocks) -> bool:
    """Host-side gate for :func:`counts_to_int4`: every count tile value
    fits int4 ([-8, 7]). True for any simple (unique-edge) graph — counts
    are 0/1 there; multi-edges can exceed it (e.g. the synthetic
    generator's boundary clipping)."""
    a = np.asarray(blocks.a)
    return a.dtype == np.int8 and int(a.max(initial=0)) <= 7


def counts_to_int4(blocks: BandedBlocks) -> BandedBlocks:
    """int8 count tiles -> int4 (packed 2/byte): halves the dominant
    A-tile HBM stream with EXACT math (integer counts, bf16 conversion in
    the kernel is value-identical for |v| <= 7). Measured +3.9% on the
    fused headline step (2.409 -> 2.319 ms, BASELINE.md).

    Call IN-TRACE (inside the jitted step, before the timing/training
    loop): S4 device arrays cannot cross a jit boundary through the axon
    relay (its device_put recurses), and an in-loop convert would re-read
    the int8 tiles every iteration. Gate with :func:`int4_count_safe` on
    the host first — values outside [-8, 7] would wrap silently."""
    return BandedBlocks(
        a=blocks.a.astype(jnp.int4), bo=blocks.bo, woff=blocks.woff,
        off=blocks.off, row_scale=blocks.row_scale,
        col_scale=blocks.col_scale, cmap=blocks.cmap, tile=blocks.tile,
        wsz=blocks.wsz, k=blocks.k, wide=blocks.wide,
    )


def build_banded_blocks(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    weight: np.ndarray | None = None,
    tile: int = TILE,
    k: int = 4,
    dtype=np.float32,
    max_span: int = 16,
    s_span_min: int = 1,
    wsz_min: int = 0,
) -> BandedBlocks:
    """Host-side banded layout. Raises ValueError when any destination
    block's source span exceeds ``max_span`` tiles (non-banded graph —
    use the compact dense or hybrid backends instead).

    ``s_span_min`` / ``wsz_min`` force the slot count / window size up to a
    common value — used when stacking per-shard layouts (parallel/halo.py)
    that must share static shapes."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if len(src) and (src.min() < 0 or dst.min() < 0
                     or src.max() >= num_nodes or dst.max() >= num_nodes):
        raise ValueError(f"edge endpoints out of range [0, {num_nodes})")
    if weight is None:
        weight = np.ones(len(src), np.float32)
    weight = np.asarray(weight, np.float32)

    n_pad = pad_nodes(num_nodes, tile)
    nb = n_pad // tile
    nb = ((nb + k - 1) // k) * k
    db = dst // tile
    sb = src // tile

    bo = np.arange(nb, dtype=np.int64)  # empty blocks: window of themselves
    hi = bo.copy()
    if len(src):
        np.minimum.at(bo, db, sb)
        np.maximum.at(hi, db, sb)
    span = hi - bo + 1
    s_span = int(span.max()) if len(span) else 1
    if s_span > max_span:
        raise ValueError(
            f"source span {s_span} tiles exceeds max_span={max_span}: "
            "graph is not banded under this node order")
    s_span = max(s_span, min(s_span_min, nb))
    # re-base so slots [bo, bo+s_span) never pass the node range: every
    # block's FULL slot range is then resident in its group's x window
    # (off + s_span <= wsz, see _window_meta) — required for the wide
    # kernel's single [T, S*T] slice and removes the tail blocks' reliance
    # on clamped out-of-window reads hitting zero A tiles
    bo = np.minimum(bo, max(nb - s_span, 0))

    a = np.zeros((nb, s_span, tile, tile), np.float32)
    if len(src):
        np.add.at(a, (db, sb - bo[db], dst - db * tile, src - sb * tile), weight)

    woff, off, wsz = _window_meta(bo, nb, k, s_span, wsz_min=wsz_min)
    return BandedBlocks(
        a=a.astype(dtype), bo=bo.astype(np.int32),
        woff=woff, off=off, tile=tile, wsz=wsz, k=k,
    )


def _rebase_slots(a: np.ndarray, bo: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Shift slot contents from per-block base ``bo`` to the (elementwise
    smaller-or-equal) target ``base``: slot' = slot + (bo - base)."""
    s_span = a.shape[1]
    for b in np.nonzero(np.asarray(bo, np.int64) > base)[0]:
        d = int(bo[b] - base[b])
        a[b, d:] = a[b, : s_span - d]
        a[b, :d] = 0
    return base


def _window_meta(bo: np.ndarray, nb: int, k: int, s_span: int, *, wsz_min: int = 0):
    """Per-K-group x-window base/size and per-block in-window offsets.
    Guarantees ``off + s_span <= wsz`` for every block (bo is pre-clamped
    to ``nb - s_span``) and windows stay inside [0, nb] tiles."""
    steps = (len(bo) + k - 1) // k
    bo2 = np.asarray(bo, np.int64).reshape(steps, k)
    woff = bo2.min(axis=1)
    wsz = int((bo2.max(axis=1) - woff).max()) + s_span if len(bo) else s_span
    wsz = max(wsz, min(wsz_min, nb))
    woff = np.minimum(woff, max(nb - wsz, 0))
    off = bo2 - woff[:, None]
    return woff.astype(np.int32), off.reshape(-1).astype(np.int32), wsz


def prepare_banded_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    k: int = 4,
    dtype=np.int8,
    max_span: int = 16,
    wide: bool = False,
) -> tuple[BandedBlocks, BandedBlocks, int]:
    """Forward + reverse banded layouts for mean aggregation. int8 uses
    the factored count-tile form (exact — see ops/spmm_dense.py).
    ``wide`` folds the slot axis into matmul columns (:func:`widen_banded`)
    — one [T, S*T] matmul per block instead of S depth-T matmuls; measured
    within noise of the per-slot form on v5e (Mosaic pipelines the chained
    accumulations), so the default stays narrow (no host transpose)."""
    from ..graph.csr import mean_weights

    maybe_widen = widen_banded if wide else (lambda b: b)
    if np.dtype(dtype) == np.int8:
        fwd = build_banded_counts(src, dst, num_nodes, tile=tile, k=k, max_span=max_span)
        rev = build_banded_counts(dst, src, num_nodes, tile=tile, k=k, max_span=max_span)
        n_pad = fwd.num_dst_blocks * tile
        deg = np.bincount(np.asarray(dst, np.int64), minlength=n_pad)
        scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)
        fwd = BandedBlocks(a=fwd.a.astype(np.int8, copy=False), bo=fwd.bo, woff=fwd.woff,
                           off=fwd.off, row_scale=scale, tile=tile, wsz=fwd.wsz, k=k,
                           wide=fwd.wide)
        rev = BandedBlocks(a=rev.a.astype(np.int8, copy=False), bo=rev.bo, woff=rev.woff,
                           off=rev.off, col_scale=scale, tile=tile, wsz=rev.wsz, k=k,
                           wide=rev.wide)
        return maybe_widen(fwd), maybe_widen(rev), n_pad
    w = mean_weights(dst, num_nodes)
    fwd = build_banded_blocks(src, dst, num_nodes, weight=w, tile=tile, k=k,
                              dtype=dtype, max_span=max_span)
    rev = build_banded_blocks(dst, src, num_nodes, weight=w, tile=tile, k=k,
                              dtype=dtype, max_span=max_span)
    return maybe_widen(fwd), maybe_widen(rev), fwd.num_dst_blocks * tile


def build_banded_counts(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    k: int = 4,
    max_span: int = 16,
    s_span_min: int = 1,
    wsz_min: int = 0,
) -> BandedBlocks:
    """int8 count-tile banded layout (no scales attached): the shared
    builder behind :func:`prepare_banded_mean_aggregate` and the halo
    planner's per-shard interiors (parallel/halo.py). Prefers the native
    OpenMP fill for >=100k edges (no f32 tile transient); raises on
    span/int8-count overflow."""
    from ..graph.csr import check_edge_range

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)  # native fills index raw buffers
    out = None
    if len(src) >= 100_000:
        out = _native_banded_counts(src, dst, num_nodes, tile, k, max_span,
                                    s_span_min, wsz_min)
    if out is None:
        out = build_banded_blocks(src, dst, num_nodes, tile=tile, k=k,
                                  max_span=max_span, s_span_min=s_span_min,
                                  wsz_min=wsz_min)
        cmax = max(out.a.max() if out.a.size else 0, 1)
        if cmax > 127:
            raise ValueError(f"duplicate-edge multiplicity {cmax} overflows int8 counts")
        out = BandedBlocks(a=out.a.astype(np.int8), bo=out.bo, woff=out.woff,
                           off=out.off, tile=tile, wsz=out.wsz, k=k)
    return out


def _native_banded_counts(src, dst, num_nodes, tile, k, max_span, s_span_min=1,
                          wsz_min=0):
    """int8 count layout via the native fill (no f32 transient). Returns
    None when the native lib is unavailable; raises on span/int8 overflow
    (matching the numpy path)."""
    from ..build.native import native_banded_blocks_i8

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    nb = pad_nodes(num_nodes, tile) // tile
    nb = ((nb + k - 1) // k) * k
    # span via scatter-min/max (cheap next to the fill itself)
    bo = np.arange(nb, dtype=np.int64)
    hi = bo.copy()
    if len(src):
        np.minimum.at(bo, dst // tile, src // tile)
        np.maximum.at(hi, dst // tile, src // tile)
    s_span = int((hi - bo + 1).max()) if len(src) else 1
    if s_span > max_span:
        raise ValueError(
            f"source span {s_span} tiles exceeds max_span={max_span}: "
            "graph is not banded under this node order")
    s_span = max(s_span, min(s_span_min, nb))
    out = native_banded_blocks_i8(src, dst, nb, tile, s_span)
    if out is None:
        return None
    a, bo_n, cmax = out
    if cmax > 127:
        raise ValueError(f"duplicate-edge multiplicity {cmax} overflows int8 counts")
    assert cmax >= 0  # span already validated above
    # the native fill bases slots at the true min source block; unify with
    # the numpy builder's arange-inclusive definition (bo <= own block id,
    # so windows always cover the block's own rows) plus the tail clamp —
    # the halo planner's cheap pre-pass assumes exactly this definition
    base = np.minimum(np.minimum(bo_n.astype(np.int64), np.arange(nb)),
                      max(nb - s_span, 0))
    _rebase_slots(a, bo_n, base)
    woff, off, wsz = _window_meta(base, nb, k, s_span, wsz_min=wsz_min)
    return BandedBlocks(a=a, bo=base.astype(np.int32), woff=woff, off=off,
                        tile=tile, wsz=wsz, k=k)


# ------------------------------------------------------------- Pallas path


def _window_prologue(woff_ref, x_hbm, xw, sems, tile, wsz):
    """Double-buffered x-window pipeline: start this step's DMA on step 0,
    prefetch the next step's window, wait on the current one. Returns the
    VMEM slot holding this grid step's window. Shared by the bf16 and int8
    kernels (the window dtype is whatever ``xw`` was allocated as)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    num = pl.num_programs(0)

    def window_dma(slot, g_):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(woff_ref[g_] * tile, wsz * tile), :],
            xw.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(g + 1 < num)
    def _():
        window_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    window_dma(slot, g).wait()
    return slot


def _banded_kernel(woff_ref, off_ref, *rest, s_span, K, tile, wsz, has_row,
                   wide, has_cmap=False):
    from jax.experimental import pallas as pl

    rest = list(rest)
    cmap_ref = rest.pop(0) if has_cmap else None
    a_ref = rest.pop(0)
    if has_row:
        rs_ref, x_hbm, out_ref, xw, sems = rest
    else:
        x_hbm, out_ref, xw, sems = rest
        rs_ref = None

    slot = _window_prologue(woff_ref, x_hbm, xw, sems, tile, wsz)
    g = pl.program_id(0)
    d = out_ref.shape[1]
    for kk in range(K):
        offk = off_ref[g * K + kk]
        if wide:
            # one [T, S*T] @ [S*T, D] matmul: the block's slot range is a
            # single contiguous window slice (off + s_span <= wsz by layout
            # construction), contracted at depth S*T for full MXU pipelining
            xs = xw[slot, pl.ds(offk * tile, s_span * tile), :]
            acc = jnp.dot(
                a_ref[kk].astype(jnp.bfloat16),
                xs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            acc = jnp.zeros((tile, d), jnp.float32)
            for s in range(s_span):
                # cmap: slot s reads an ARBITRARY window tile (scalar-
                # prefetched per-block index) instead of band slot off+s
                col = (cmap_ref[(g * K + kk) * s_span + s] if has_cmap
                       else offk + s)
                xs = xw[slot, pl.ds(col * tile, tile), :]
                acc += jnp.dot(
                    a_ref[kk, s].astype(jnp.bfloat16),
                    xs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
        if has_row:
            acc = acc * rs_ref[kk * tile:(kk + 1) * tile]
        out_ref[kk * tile:(kk + 1) * tile] = acc.astype(out_ref.dtype)


def spmm_banded_pallas(x: jax.Array, blocks: BandedBlocks, *, interpret: bool = False):
    """out = A @ x over the banded layout; x padded to NB*T rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    tile, K, wsz = blocks.tile, blocks.k, blocks.wsz
    nb = blocks.num_dst_blocks
    s_span = blocks.s_span
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K

    if blocks.col_scale is not None:
        # one elementwise pass (same rationale as spmm_dense_pallas)
        x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)

    has_row = blocks.row_scale is not None
    has_cmap = blocks.cmap is not None
    assert not (has_cmap and blocks.wide), "cmap needs the narrow layout"
    extra_specs, extra_args = [], []
    if has_row:
        extra_specs.append(pl.BlockSpec((K * tile, 1), lambda g, *_: (g, 0)))
        extra_args.append(blocks.row_scale)

    a_spec = (
        pl.BlockSpec((K, tile, s_span * tile), lambda g, *_: (g, 0, 0))
        if blocks.wide
        else pl.BlockSpec((K, s_span, tile, tile), lambda g, *_: (g, 0, 0, 0))
    )
    prefetch = [blocks.woff, blocks.off]
    if has_cmap:
        prefetch.append(blocks.cmap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # woff [steps], off [steps*K], cmap?
        grid=(steps,),
        in_specs=[a_spec]
        + extra_specs
        + [pl.BlockSpec(memory_space=pl.ANY)],  # x stays in HBM; windows DMA'd manually
        out_specs=pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wsz * tile, d), x.dtype),  # double-buffered window
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_banded_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz, has_row=has_row,
                wide=blocks.wide, has_cmap=has_cmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), x.dtype, vma=_operand_vma(x, blocks.a, blocks.off)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * s_span * tile * tile * d,
            bytes_accessed=blocks.a.size * blocks.a.dtype.itemsize
            + steps * wsz * tile * d * x.dtype.itemsize
            + n_pad * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, blocks.a, *extra_args, x)


def _banded_int8_kernel(woff_ref, off_ref, xscale_ref, a_ref, rs_ref, x_hbm,
                        out_ref, xw, sems, *, s_span, K, tile, wsz):
    from jax.experimental import pallas as pl

    slot = _window_prologue(woff_ref, x_hbm, xw, sems, tile, wsz)
    g = pl.program_id(0)
    d = out_ref.shape[1]
    for kk in range(K):
        offk = off_ref[g * K + kk]
        acc = jnp.zeros((tile, d), jnp.int32)
        for s in range(s_span):
            xs = xw[slot, pl.ds((offk + s) * tile, tile), :]
            # int8 x int8 -> int32 on the MXU: exact integer math (counts
            # <= 127, |xq| <= 127, row sums far below 2^31)
            acc += jnp.dot(a_ref[kk, s], xs, preferred_element_type=jnp.int32)
        scaled = acc.astype(jnp.float32) * xscale_ref[0]
        scaled = scaled * rs_ref[kk * tile:(kk + 1) * tile]
        out_ref[kk * tile:(kk + 1) * tile] = scaled.astype(out_ref.dtype)


def spmm_banded_int8_pallas(
    xq: jax.Array,
    x_scale: jax.Array,
    blocks: BandedBlocks,
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fully-int8 banded aggregation for inference.

    ``xq [n_pad, D] int8`` per-TENSOR quantized (one scalar ``x_scale``,
    from :func:`sldm_gnn_tpu.ops.quant.quantize_tensor_xla`); ``blocks``
    must carry int8 count tiles with ``row_scale`` (the factored-mean
    layout of :func:`prepare_banded_mean_aggregate`). Both MXU operands
    ride the int8 path (2x the bf16 MXU rate) and the x windows stream at
    1 byte/element (half the bf16 traffic); the integer aggregation is
    EXACT, so the only error is the one per-tensor feature quantization.
    Output = ``row_scale * x_scale * (counts @ xq)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = xq.shape
    assert xq.dtype == jnp.int8, xq.dtype
    assert not blocks.wide, "int8 banded kernel uses the per-slot layout"
    assert blocks.cmap is None, "int8 inference kernel: contiguous band only"
    assert blocks.a.dtype == jnp.int8, "needs int8 count tiles"
    assert blocks.row_scale is not None, "needs the factored-mean row scale"
    tile, K, wsz = blocks.tile, blocks.k, blocks.wsz
    nb = blocks.num_dst_blocks
    s_span = blocks.s_span
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # woff, off, x_scale
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((K, s_span, tile, tile), lambda g, woff, off, xs: (g, 0, 0, 0)),
            pl.BlockSpec((K * tile, 1), lambda g, woff, off, xs: (g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # xq in HBM; windows DMA'd
        ],
        out_specs=pl.BlockSpec((K * tile, d), lambda g, woff, off, xs: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wsz * tile, d), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_banded_int8_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), out_dtype,
            vma=_operand_vma(xq, x_scale, blocks.a, blocks.off)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * s_span * tile * tile * d,
            bytes_accessed=blocks.a.size + steps * wsz * tile * d + n_pad * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(blocks.woff, blocks.off, x_scale, blocks.a, blocks.row_scale, xq)


def spmm_banded_infer_int8(x: jax.Array, blocks: BandedBlocks, *, interpret: bool = False):
    """Quantize-then-aggregate convenience: per-tensor int8 features through
    :func:`spmm_banded_int8_pallas`. One f32 read of x for the quantization,
    then every kernel window streams at 1 byte/element."""
    from .quant import quantize_tensor_xla

    xq, scale = quantize_tensor_xla(x)
    return spmm_banded_int8_pallas(xq, scale, blocks, interpret=interpret)


def spmm_banded_xla(x: jax.Array, blocks: BandedBlocks,
                    chunk_blocks: int | None = None):
    """XLA reference over the banded tiles (any backend).

    ``chunk_blocks`` (or env ``SLDM_XLA_AGG_CHUNK``) bounds the peak
    memory of the fallback: the int8->float A-tile upcast and the
    [*, S_SPAN, T, D] source gather are materialized per ``lax.map``
    chunk of destination blocks instead of for the whole graph — exact
    same math, O(chunk) transients. This is what lets the 200M-edge
    config-5 virtual-mesh step fit host RAM (the unchunked form's f32
    A upcast alone is ~90 GB there)."""
    nb, tile, s_span = blocks.num_dst_blocks, blocks.tile, blocks.s_span
    a = blocks.a
    if blocks.wide:
        a = a.reshape(nb, tile, s_span, tile).transpose(0, 2, 1, 3)
    if blocks.col_scale is not None:
        x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)
    xb = x.reshape(-1, tile, x.shape[1])  # [NB, T, D]
    if blocks.cmap is not None:
        # window-relative slot tiles -> absolute source blocks
        woff_b = jnp.repeat(blocks.woff, blocks.k)[:nb]
        idx = jnp.clip(
            woff_b[:, None] + blocks.cmap.reshape(nb, s_span), 0, nb - 1)
    else:
        # gather source blocks bo[b] + s (in range by the builder's base clamp)
        idx = jnp.clip(blocks.bo[:, None] + jnp.arange(s_span)[None, :], 0, nb - 1)
    if chunk_blocks is None:
        c_env = os.environ.get("SLDM_XLA_AGG_CHUNK")
        chunk_blocks = int(c_env) if c_env else 0
    d = x.shape[1]
    if chunk_blocks and chunk_blocks < nb:
        c = chunk_blocks
        nb0 = (nb // c) * c  # tail handled densely: reshape stays copy-free

        def body(ac_ic):
            ac, ic = ac_ic
            return jnp.einsum("bsij,bsjd->bid", ac.astype(x.dtype), xb[ic])

        parts = [jax.lax.map(
            body, (a[:nb0].reshape(-1, c, s_span, tile, tile),
                   idx[:nb0].reshape(-1, c, s_span)),
        ).reshape(nb0, tile, d)]
        if nb0 < nb:
            parts.append(jnp.einsum(
                "bsij,bsjd->bid", a[nb0:].astype(x.dtype), xb[idx[nb0:]]))
        out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    else:
        gathered = xb[idx]  # [NB, S_SPAN, T, D]
        out = jnp.einsum("bsij,bsjd->bid", a.astype(x.dtype), gathered)
    out = out.reshape(nb * tile, x.shape[1])
    if blocks.row_scale is not None:
        out = (out.astype(jnp.float32) * blocks.row_scale).astype(x.dtype)
    return out


# --------------------------------------------------- differentiable wrapper


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_banded_apply(x, blocks_fwd: BandedBlocks, blocks_rev: BandedBlocks,
                      use_pallas: bool):
    """Aggregation with a transposed-banded backward pass."""
    return _dispatch(x, blocks_fwd, use_pallas)


def _dispatch(x, blocks, use_pallas):
    if use_pallas:
        return spmm_banded_pallas(x, blocks)
    return spmm_banded_xla(x, blocks)


def _fwd(x, blocks_fwd, blocks_rev, use_pallas):
    return _dispatch(x, blocks_fwd, use_pallas), (blocks_rev,)


def _bwd(use_pallas, res, g):
    (blocks_rev,) = res
    return _dispatch(g, blocks_rev, use_pallas), None, None


spmm_banded_apply.defvjp(_fwd, _bwd)
