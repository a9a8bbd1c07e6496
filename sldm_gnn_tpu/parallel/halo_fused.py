"""Fused kernels inside the halo-sharded path (multi-chip × sage_fused).

Round 2's single-chip wins — in-kernel dW (−11% step) and one-kernel
LayerNorm fwd/bwd fusion (1.38×) — lived only in the single-device
classifier; the multi-chip layer (parallel/halo_model.py) ran unfused
aggregation + XLA Dense/LayerNorm and re-paid the epilogue/LN HBM traffic
the fused kernels eliminate. This module closes that gap:

  * the INTERIOR aggregation runs the fused banded kernels
    (ops/sage_fused.py) exactly as on one chip;
  * the BOUNDARY partial — each shard's few halo-sourced edges — is
    computed compactly on XLA (gather + sorted segment-sum from the
    received halo table into per-group slots) and injected into the fused
    forward kernel pre-epilogue through its gated-DMA ``resid`` operand —
    the same machinery ops/banded_residual.py uses for overflow edges, so
    the full aggregate is epilogue-/LN-normalized in ONE kernel;
  * the backward's boundary transpose ``t_bnd = Rᵀ·dy`` (halo-row space)
    is a small XLA segment-sum feeding ``dhalo = t_bnd @ Wlᵀ`` (which AD
    routes back through the all-to-all transpose) and the boundary dW
    completion ``dWl += haloᵀ t_bnd``; the interior dx/dW/LN-stats all
    come out of the fused reverse kernel.

Layer math matches /root/reference/src/models/blocks/sageblock.py:4-20
(SAGEConv mean-agg → LayerNorm(1e-5) → (Leaky)ReLU), with the mean split
exactly across interior+boundary via FULL-degree weights (the banded
layouts' row/col scales and the boundary ``w`` both carry 1/deg of the
GLOBAL graph, so the two partials sum to the reference mean).

Ordering note: unlike the unfused path (whose interior kernel overlaps
the all-to-all), the fused kernel consumes the boundary partial as an
operand, so it waits on the collective. The halo exchange moves only
O(boundary) rows; the LN fusion saves ~1.3 ms/step at the headline scale
— the trade wins whenever the boundary is small relative to the shard.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.banded_residual import _expand_compact, _residual_maps
from ..ops.sage_fused import (
    _act,
    _ln_bwd_prologue,
    _ln_fwd_xla,
    banded_sage_bwd_pallas,
    banded_sage_fwd_pallas,
    banded_sage_ln_bwd_pallas,
)
from ..ops.spmm_banded import BandedBlocks, spmm_banded_xla
from .halo import HaloPlanSplit, plan_banded_interior, plan_halo_partition, split_halo_plan


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CompactBoundary:
    """Per-shard residual edges in the orders the fused path needs
    (stacked over a leading ep axis; padding edges carry w=0 and sit
    FIRST so every segment-sum runs with indices_are_sorted=True).

    TWO edge populations share the forward compact-slot space (rows in
    ``[m * K*T)``, slot 0 = dummy zeros masked in-kernel; ``rg [steps]``
    maps each banded grid group to its slot):

    * BOUNDARY edges (src on another shard): contribute
      ``w_f[e] * halo[src_f[e]]`` to row ``row_f[e]``; their transpose
      lives in received-halo-row space — ``t_bnd[src_r[e]] += w_r[e] *
      dy[dst_r[e]]`` (rev order sorted by halo row).
    * INTERIOR-OVERFLOW edges (both ends local, outside the banded span
      window — real orderings always have a few): contribute
      ``i_w_f[e] * x[i_src_f[e]]`` to row ``i_row_f[e]``. Their transpose
      targets LOCAL rows, so it rides the REVERSE kernel's resid operand:
      compact rows ``i_row_rev`` (own slot map ``rg_rev``/``m_rev``) fed
      by ``i_w_r[e] * dy[i_dst_r[e]]``.
    """

    src_f: jax.Array   # [ep, Eb] halo-table gather rows (fwd order)
    row_f: jax.Array   # [ep, Eb] compact residual rows (sorted)
    w_f: jax.Array     # [ep, Eb] 1/deg(dst) weights (0 on padding)
    dst_r: jax.Array   # [ep, Eb] local dst gather rows (rev order)
    src_r: jax.Array   # [ep, Eb] halo-row segment ids (sorted)
    w_r: jax.Array     # [ep, Eb] weights (rev order)
    rg: jax.Array      # [ep, steps] group -> fwd slot map
    i_src_f: jax.Array   # [ep, Ei] x gather rows (fwd order)
    i_row_f: jax.Array   # [ep, Ei] fwd compact rows (sorted)
    i_w_f: jax.Array     # [ep, Ei] weights (0 on padding)
    i_dst_r: jax.Array   # [ep, Ei] g/dy gather rows (rev order)
    i_row_rev: jax.Array  # [ep, Ei] rev compact rows (sorted)
    i_w_r: jax.Array     # [ep, Ei] weights (rev order)
    rg_rev: jax.Array    # [ep, steps] group -> rev slot map
    # --- SEPARATED forward maps (overlap path): the fused kernel must not
    # consume anything derived from the all-to-all, so boundary edges get
    # their OWN slot space (patched post-collective by a small epilogue)
    # and interior-overflow edges their own (kernel resid, x-only).
    b_src_s: jax.Array   # [ep, Eb] halo-table gather rows (sep fwd order)
    b_row_s: jax.Array   # [ep, Eb] boundary-only compact rows (sorted)
    b_w_s: jax.Array     # [ep, Eb] weights (sep fwd order)
    rg_b: jax.Array      # [ep, steps] group -> boundary slot map
    slot_grp: jax.Array  # [ep, m_b] boundary slot -> grid group (steps = none)
    io_src_s: jax.Array  # [ep, Ei] x gather rows (sep fwd order)
    io_row_s: jax.Array  # [ep, Ei] io-only compact rows (sorted)
    io_w_s: jax.Array    # [ep, Ei] weights (sep fwd order)
    rg_io: jax.Array     # [ep, steps] group -> io slot map
    m: int = field(metadata=dict(static=True))        # fwd compact slots
    m_rev: int = field(metadata=dict(static=True))    # rev compact slots
    kt: int = field(metadata=dict(static=True))       # K * tile rows per slot
    h_rows: int = field(metadata=dict(static=True))   # halo table rows (ep * H)
    m_b: int = field(default=1, metadata=dict(static=True))   # boundary slots
    m_io: int = field(default=1, metadata=dict(static=True))  # io-only slots


@dataclass(frozen=True)
class HaloFusedPlan:
    """Halo exchange + fused-kernel layouts: banded interior (stacked
    :class:`BandedBlocks`, fwd/rev) + :class:`CompactBoundary`."""

    send_idx: np.ndarray
    int_fwd: BandedBlocks
    int_rev: BandedBlocks
    bnd: CompactBoundary
    n_local: int
    n_pad_local: int


def _pad_front(vals, order, size, fill=0, dtype=np.int32):
    """Right-align ordered values in a fixed-size array (padding FIRST so
    sorted segment-sum index sequences stay non-decreasing)."""
    out = np.full(size, fill, dtype)
    if len(vals):
        out[size - len(vals):] = np.asarray(vals)[order]
    return out


def _compact_shard(bsrc, bdst, bw, io, steps: int, k: int, tile: int) -> dict:
    """Per-shard compact-residual maps (the body shared by the in-memory
    planner and the streamed loader). ``io = (src, dst, w)`` interior
    overflow (possibly empty)."""
    io_s, io_d, io_w = (np.asarray(a) for a in io)
    bsrc = np.asarray(bsrc, np.int64)
    bdst = np.asarray(bdst, np.int64)
    bw = np.asarray(bw, np.float32)
    # forward: boundary + interior-overflow share the slot space
    comb_dst = np.concatenate([bdst, io_d.astype(np.int64)])
    rows, rg, _, m = _residual_maps(comb_dst, k, tile, steps)
    b_rows, i_rows = rows[: len(bdst)], rows[len(bdst):]
    # reverse: interior-overflow only (its transpose targets LOCAL rows)
    i_rows_rev, rg_rev, _, m_rev = _residual_maps(
        io_s.astype(np.int64), k, tile, steps)
    # separated fwd maps for the overlap path: boundary-only slots (with a
    # slot->group inverse for the post-collective patch) + io-only slots
    b_rows_sep, rg_b, _, m_b = _residual_maps(bdst, k, tile, steps)
    slot_grp = np.full(m_b, steps, np.int32)
    if len(bdst):
        slot_grp[1:] = np.unique(bdst // (k * tile)).astype(np.int32)
    io_rows_sep, rg_io, _, m_io = _residual_maps(
        io_d.astype(np.int64), k, tile, steps)
    return dict(
        bsrc=bsrc, bdst=bdst, bw=bw, b_rows=b_rows,
        io_s=io_s, io_d=io_d, io_w=io_w.astype(np.float32), i_rows=i_rows,
        i_rows_rev=i_rows_rev, rg=rg, rg_rev=rg_rev, m=m, m_rev=m_rev,
        b_rows_sep=b_rows_sep, rg_b=rg_b, m_b=m_b, slot_grp=slot_grp,
        io_rows_sep=io_rows_sep, rg_io=rg_io, m_io=m_io,
        order_bf=np.argsort(b_rows, kind="stable"),
        order_if=np.argsort(i_rows, kind="stable"),
        order_br=np.argsort(bsrc, kind="stable"),
        order_ir=np.argsort(i_rows_rev, kind="stable"),
        order_bs=np.argsort(b_rows_sep, kind="stable"),
        order_is=np.argsort(io_rows_sep, kind="stable"))


def _stack_compact(per, kt: int, h_rows: int, *, m_min: int = 1,
                   m_rev_min: int = 1, eb_min: int = 1,
                   ei_min: int = 1, m_b_min: int = 1,
                   m_io_min: int = 1) -> CompactBoundary:
    """Stack per-shard compact maps (leading dim = len(per)); the floors
    let a multi-host subset load force GLOBAL maxima so every worker
    compiles the same program."""
    eb = max(max((len(t["bsrc"]) for t in per), default=1), 1, eb_min)
    ei = max(max((len(t["io_s"]) for t in per), default=1), 1, ei_min)
    m_common = max(max(t["m"] for t in per), m_min)
    m_rev_common = max(max(t["m_rev"] for t in per), m_rev_min)
    m_b_common = max(max(t["m_b"] for t in per), m_b_min)
    m_io_common = max(max(t["m_io"] for t in per), m_io_min)
    steps = per[0]["rg"].shape[0]

    def _pad_slots(sg):
        out = np.full(m_b_common, steps, np.int32)
        out[: len(sg)] = sg
        return out

    return CompactBoundary(
        src_f=np.stack([_pad_front(t["bsrc"], t["order_bf"], eb) for t in per]),
        row_f=np.stack([_pad_front(t["b_rows"], t["order_bf"], eb) for t in per]),
        w_f=np.stack([_pad_front(t["bw"], t["order_bf"], eb, 0.0, np.float32)
                      for t in per]),
        dst_r=np.stack([_pad_front(t["bdst"], t["order_br"], eb) for t in per]),
        src_r=np.stack([_pad_front(t["bsrc"], t["order_br"], eb) for t in per]),
        w_r=np.stack([_pad_front(t["bw"], t["order_br"], eb, 0.0, np.float32)
                      for t in per]),
        rg=np.stack([t["rg"] for t in per]),
        i_src_f=np.stack([_pad_front(t["io_s"], t["order_if"], ei) for t in per]),
        i_row_f=np.stack([_pad_front(t["i_rows"], t["order_if"], ei) for t in per]),
        i_w_f=np.stack([_pad_front(t["io_w"], t["order_if"], ei, 0.0, np.float32)
                        for t in per]),
        i_dst_r=np.stack([_pad_front(t["io_d"], t["order_ir"], ei) for t in per]),
        i_row_rev=np.stack([_pad_front(t["i_rows_rev"], t["order_ir"], ei)
                            for t in per]),
        i_w_r=np.stack([_pad_front(t["io_w"], t["order_ir"], ei, 0.0, np.float32)
                        for t in per]),
        rg_rev=np.stack([t["rg_rev"] for t in per]),
        b_src_s=np.stack([_pad_front(t["bsrc"], t["order_bs"], eb) for t in per]),
        b_row_s=np.stack([_pad_front(t["b_rows_sep"], t["order_bs"], eb)
                          for t in per]),
        b_w_s=np.stack([_pad_front(t["bw"], t["order_bs"], eb, 0.0, np.float32)
                        for t in per]),
        rg_b=np.stack([t["rg_b"] for t in per]),
        slot_grp=np.stack([_pad_slots(t["slot_grp"]) for t in per]),
        io_src_s=np.stack([_pad_front(t["io_s"], t["order_is"], ei) for t in per]),
        io_row_s=np.stack([_pad_front(t["io_rows_sep"], t["order_is"], ei)
                           for t in per]),
        io_w_s=np.stack([_pad_front(t["io_w"], t["order_is"], ei, 0.0, np.float32)
                         for t in per]),
        rg_io=np.stack([t["rg_io"] for t in per]),
        m=m_common, m_rev=m_rev_common, kt=kt, h_rows=h_rows,
        m_b=m_b_common, m_io=m_io_common,
    )


def _compact_boundary(
    split: HaloPlanSplit, n_pad_local: int, tile: int, k: int,
    io_edges=None,
) -> CompactBoundary:
    """Build the stacked compact-residual arrays from a halo split.
    ``io_edges``: optional per-shard ``(src_local, dst_local, w)`` arrays
    of interior-overflow edges (outside the banded span windows)."""
    ep = split.ep
    h_max = split.send_idx.shape[2]
    steps = n_pad_local // (k * tile)
    kt = k * tile

    per = []
    for p in range(ep):
        mb = np.asarray(split.hal_w[p]) > 0
        io = (io_edges[p] if io_edges is not None
              else (np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float32)))
        per.append(_compact_shard(
            np.asarray(split.hal_src[p])[mb],
            np.asarray(split.hal_dst[p])[mb],
            np.asarray(split.hal_w[p])[mb], io, steps, k, tile))
    return _stack_compact(per, kt, ep * h_max)


def plan_halo_fused(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    ep: int,
    *,
    mean: bool = True,
    tile: int | None = None,
    banded_k: int = 4,
    banded_max_span: int = 16,
    span: int | None = None,
    resid_frac: float = 0.01,
) -> HaloFusedPlan:
    """Build the fused-kernel halo plan from a global edge list (same
    partitioning as :func:`~sldm_gnn_tpu.parallel.halo.plan_halo_blocked`
    ``backend='banded'``; the boundary becomes the compact residual operand
    instead of one-hot layouts).

    Interior edges outside the per-block span windows — real orderings
    (Hilbert/RCM on real maps) always leave a few — spill into the SAME
    compact residual instead of widening every shard's banded span (or
    failing outright like the unfused planner): ``span=None`` picks the
    tightest common span whose total overflow stays under ``resid_frac``
    of the interior edges (sweeping per-edge-span percentiles like
    ops/banded_residual.py), bounded by ``banded_max_span``."""
    from ..graph.csr import TILE, pad_nodes
    from ..ops.banded_residual import split_banded_residual

    tile = tile or TILE
    plan, n_local = plan_halo_partition(src, dst, num_nodes, ep, mean=mean)
    split = split_halo_plan(plan, n_local)
    n_pad_local = pad_nodes(n_local, tile)
    nbl = n_pad_local // tile
    nbl = ((nbl + banded_k - 1) // banded_k) * banded_k

    # per-shard valid interior edges
    interiors = []
    for p in range(ep):
        mi = np.asarray(split.int_w[p]) > 0
        interiors.append((
            np.asarray(split.int_src[p])[mi].astype(np.int64),
            np.asarray(split.int_dst[p])[mi].astype(np.int64),
            np.asarray(split.int_w[p])[mi].astype(np.float32),
        ))

    e_int = max(sum(len(s) for s, _, _ in interiors), 1)
    if span is None:
        # candidate spans from the pooled per-edge span distribution
        spans_all = []
        for s, d_, _ in interiors:
            if not len(s):
                continue
            bo = np.arange(nbl, dtype=np.int64)
            hi = bo.copy()
            np.minimum.at(bo, d_ // tile, s // tile)
            np.maximum.at(hi, d_ // tile, s // tile)
            spans_all.append((hi - bo + 1)[d_ // tile])
        pooled = np.concatenate(spans_all) if spans_all else np.array([1])
        cands = sorted(
            {int(np.percentile(pooled, q)) for q in (50, 75, 90, 99)}
            | {min(banded_max_span, int(pooled.max()))})
        cands = [c for c in cands if c <= banded_max_span]
        span = cands[-1]
        for c in cands:
            kept = sum(
                int(split_banded_residual(s, d_, nbl, tile=tile, span=c).sum())
                for s, d_, _ in interiors)
            if (e_int - kept) / e_int <= resid_frac:
                span = c
                break
    if span > banded_max_span:
        raise ValueError(f"span {span} exceeds max_span={banded_max_span}")

    keep_masks = [split_banded_residual(s, d_, nbl, tile=tile, span=span)
                  for s, d_, _ in interiors]
    overflow = float(sum(len(s) - k.sum()
                         for (s, _, _), k in zip(interiors, keep_masks)))
    if overflow / e_int > 4 * resid_frac:
        raise ValueError(
            f"interior overflow fraction {overflow / e_int:.4f} at "
            f"span={span} exceeds {4 * resid_frac:.4f}: shard interiors "
            "are not near-banded under this node order — reorder "
            "(graph/reorder.py) or use plan_halo_blocked(backend='dense')")

    int_fwd, int_rev, n_pad_local = plan_banded_interior(
        split, dst, n_local, n_pad_local, mean=mean, tile=tile,
        banded_k=banded_k, banded_max_span=span, keep_masks=keep_masks)
    io_edges = [
        (s[~k], d_[~k], w[~k])
        for (s, d_, w), k in zip(interiors, keep_masks)
    ]
    bnd = _compact_boundary(split, n_pad_local, tile, banded_k,
                            io_edges=io_edges)
    return HaloFusedPlan(
        send_idx=np.asarray(plan.send_idx),
        int_fwd=int_fwd, int_rev=int_rev, bnd=bnd,
        n_local=n_local, n_pad_local=n_pad_local,
    )


# ------------------------------------------------------------ apply paths


def boundary_fwd_compact(x: jax.Array, halo_flat: jax.Array,
                         bnd: CompactBoundary) -> jax.Array:
    """Compact forward residual [m, K*T, D] f32 (slot 0 = zeros):
    boundary edges gather from the halo table, interior-overflow edges
    from the local x — both land in the shared slot space."""
    msgs = halo_flat[bnd.src_f].astype(jnp.float32) * bnd.w_f[:, None]
    r = jax.ops.segment_sum(msgs, bnd.row_f, num_segments=bnd.m * bnd.kt,
                            indices_are_sorted=True)
    msgs_i = x[bnd.i_src_f].astype(jnp.float32) * bnd.i_w_f[:, None]
    r = r + jax.ops.segment_sum(msgs_i, bnd.i_row_f,
                                num_segments=bnd.m * bnd.kt,
                                indices_are_sorted=True)
    return r.reshape(bnd.m, bnd.kt, halo_flat.shape[1])


def io_fwd_compact(x: jax.Array, bnd: CompactBoundary) -> jax.Array:
    """Interior-overflow-ONLY compact forward residual [m_io, K*T, D] f32
    (overlap path: depends on x alone, never on the collective)."""
    msgs = x[bnd.io_src_s].astype(jnp.float32) * bnd.io_w_s[:, None]
    r = jax.ops.segment_sum(msgs, bnd.io_row_s,
                            num_segments=bnd.m_io * bnd.kt,
                            indices_are_sorted=True)
    return r.reshape(bnd.m_io, bnd.kt, x.shape[1])


def boundary_fwd_sep(halo_flat: jax.Array, bnd: CompactBoundary) -> jax.Array:
    """Boundary-ONLY compact forward partial [m_b, K*T, D] f32 in the
    separated slot space (the overlap epilogue's collective-dependent
    input; slot 0 stays exactly zero — padding edges carry w=0)."""
    msgs = halo_flat[bnd.b_src_s].astype(jnp.float32) * bnd.b_w_s[:, None]
    r = jax.ops.segment_sum(msgs, bnd.b_row_s,
                            num_segments=bnd.m_b * bnd.kt,
                            indices_are_sorted=True)
    return r.reshape(bnd.m_b, bnd.kt, halo_flat.shape[1])


def _patch_groups(full: jax.Array, slots: jax.Array, slot_grp: jax.Array,
                  kt: int) -> jax.Array:
    """Overwrite the rows of boundary-touched grid groups with their
    recomputed values; sentinel slot ids (== steps) are no-ops.

    Implemented as m_b static dynamic-slice/update pairs, NOT a scatter —
    XLA TPU lowers even tiny scatters expensively, and this patch sits on
    the overlap path's critical epilogue (measured: the scatter form cost
    ~0.17-0.25 ms/layer on chip)."""
    steps = full.shape[0] // kt
    m_b = slots.shape[0]
    trail = full.shape[1:]
    for s in range(m_b):
        g = jnp.minimum(slot_grp[s], steps - 1)
        row = g * kt
        start = (row,) + (0,) * len(trail)
        cur = jax.lax.dynamic_slice(full, start, (kt,) + trail)
        val = jnp.where(slot_grp[s] < steps, slots[s].astype(full.dtype),
                        cur)
        full = jax.lax.dynamic_update_slice(full, val, start)
    return full


def boundary_rev(dy: jax.Array, bnd: CompactBoundary) -> jax.Array:
    """Boundary transpose ``t_bnd = Rᵀ dy``: [h_rows, H] f32."""
    msgs = dy[bnd.dst_r].astype(jnp.float32) * bnd.w_r[:, None]
    return jax.ops.segment_sum(msgs, bnd.src_r, num_segments=bnd.h_rows,
                               indices_are_sorted=True)


def interior_rev_compact(dy: jax.Array, bnd: CompactBoundary) -> jax.Array:
    """Interior-overflow transpose, compact: [m_rev, K*T, H] f32 — rides
    the reverse kernel's resid operand (targets LOCAL rows)."""
    msgs = dy[bnd.i_dst_r].astype(jnp.float32) * bnd.i_w_r[:, None]
    t = jax.ops.segment_sum(msgs, bnd.i_row_rev,
                            num_segments=bnd.m_rev * bnd.kt,
                            indices_are_sorted=True)
    return t.reshape(bnd.m_rev, bnd.kt, dy.shape[1])


def _fwd_impl(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
              use_pallas, slope, interpret):
    r = boundary_fwd_compact(x, halo, bnd)
    if use_pallas and not int_fwd.wide:
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, int_fwd, resid=(r.astype(x.dtype), bnd.rg),
            negative_slope=slope, interpret=interpret)
    agg = spmm_banded_xla(x, int_fwd)
    agg = _expand_compact(agg, r, bnd.rg)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    return _act(y, slope).astype(x.dtype)


def _psum(v, axis_name):
    """Cross-shard reduction of a replicated-parameter cotangent. Inside
    shard_map the custom VJP is opaque to the vma rewrite, so the param
    grads must come out explicitly replicated (psum'd) — AD cannot insert
    the collective transpose for us here."""
    if v is None or axis_name is None:
        return v
    return jax.lax.psum(v, axis_name)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def halo_fused_sage(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
                    use_pallas: bool, negative_slope: float | None = None,
                    interpret: bool = False, axis_name: str | None = None):
    """act((B_int x + R halo) Wl + x Wr + bias) with the boundary partial
    folded into the fused banded kernel pre-epilogue. ``x`` is the padded
    local shard [n_pad_local, D]; ``halo`` the received halo table
    [h_rows, D]. Differentiable in (x, halo, wl, wr, bias); pass
    ``axis_name`` when calling inside shard_map so the parameter
    cotangents come out psum-replicated."""
    return _fwd_impl(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
                     use_pallas, negative_slope, interpret)


def _vjp_fwd(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
             use_pallas, negative_slope, interpret, axis_name):
    y = _fwd_impl(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
                  use_pallas, negative_slope, interpret)
    return y, (x, halo, wl, wr, bias, int_rev, bnd, y)


def _vjp_bwd(use_pallas, negative_slope, interpret, axis_name, res, g):
    x, halo, wl, wr, bias, int_rev, bnd, y = res
    if negative_slope is not None:
        g = jnp.where(y > 0, g, jnp.asarray(negative_slope, g.dtype) * g)
    gq = g.astype(x.dtype)
    f32 = jnp.float32
    t_bnd = boundary_rev(gq, bnd)  # [h_rows, H] f32
    t_i = interior_rev_compact(gq, bnd)  # interior-overflow transpose
    if use_pallas and not int_rev.wide:
        dx, dwl, dwr = banded_sage_bwd_pallas(
            gq, wl, wr, int_rev, x=x,
            resid=(t_i.astype(gq.dtype), bnd.rg_rev), interpret=interpret)
        dx = dx.astype(x.dtype)
    else:
        from ..ops.banded_residual import _expand_compact

        t = spmm_banded_xla(gq, int_rev)
        t = _expand_compact(t, t_i, bnd.rg_rev)
        dx = (
            jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
            + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
        ).astype(x.dtype)
        dwl = jnp.dot(x.T, t.astype(x.dtype), preferred_element_type=f32)
        dwr = jnp.dot(x.T, gq.astype(x.dtype), preferred_element_type=f32)
    dwl = dwl + jnp.dot(halo.T, t_bnd.astype(halo.dtype),
                        preferred_element_type=f32)
    dhalo = jnp.dot(t_bnd.astype(halo.dtype), wl.T.astype(halo.dtype),
                    preferred_element_type=f32).astype(halo.dtype)
    db = None if bias is None else g.sum(axis=0).astype(bias.dtype)
    return (dx, dhalo,
            _psum(dwl.astype(wl.dtype), axis_name),
            _psum(dwr.astype(wr.dtype), axis_name),
            _psum(db, axis_name),
            None, None, None)


halo_fused_sage.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------- LayerNorm-fused layer (VJP)


def _ln_fwd_impl(x, halo, wl, wr, bias, gamma, beta, int_fwd, int_rev, bnd,
                 use_pallas, slope, eps, interpret):
    r = boundary_fwd_compact(x, halo, bnd)
    if use_pallas and not int_fwd.wide:
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, int_fwd, resid=(r.astype(x.dtype), bnd.rg),
            negative_slope=slope, ln=(gamma, beta), eps=eps,
            interpret=interpret)
    agg = spmm_banded_xla(x, int_fwd)
    agg = _expand_compact(agg, r, bnd.rg)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    z, xhat, rstd = _ln_fwd_xla(y, gamma, beta, eps)
    return _act(z, slope).astype(x.dtype), xhat.astype(x.dtype), rstd


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def halo_fused_sage_ln(x, halo, wl, wr, bias, gamma, beta,
                       int_fwd, int_rev, bnd,
                       use_pallas: bool, negative_slope: float | None = None,
                       eps: float = 1e-5, interpret: bool = False,
                       axis_name: str | None = None):
    """act(LN((B_int x + R halo) Wl + x Wr + bias)) — the whole-sublayer
    fusion (ops/sage_fused.py banded_sage_ln_apply) with the boundary
    partial riding the resid operand; the multi-chip twin of the
    single-chip fused_ln path."""
    out, _, _ = _ln_fwd_impl(x, halo, wl, wr, bias, gamma, beta,
                             int_fwd, int_rev, bnd, use_pallas,
                             negative_slope, eps, interpret)
    return out


def _ln_vjp_fwd(x, halo, wl, wr, bias, gamma, beta, int_fwd, int_rev, bnd,
                use_pallas, negative_slope, eps, interpret, axis_name):
    out, xhat, rstd = _ln_fwd_impl(
        x, halo, wl, wr, bias, gamma, beta, int_fwd, int_rev, bnd,
        use_pallas, negative_slope, eps, interpret)
    return out, (x, halo, wl, wr, bias, gamma, beta, xhat, rstd,
                 int_rev, bnd)


def _ln_vjp_bwd(use_pallas, negative_slope, eps, interpret, axis_name, res, g):
    x, halo, wl, wr, bias, gamma, beta, xhat, rstd, int_rev, bnd = res
    f32 = jnp.float32
    if use_pallas and not int_rev.wide:
        # dy is derived IN-KERNEL for the interior; the boundary transpose
        # and the interior-overflow compact need dy only at their dst rows
        # — computed pointwise after the gathers, so no full-[N, H]
        # prologue pass materializes
        dy_e, _, _ = _ln_bwd_prologue(
            g[bnd.dst_r], xhat[bnd.dst_r], rstd[bnd.dst_r], gamma, beta,
            negative_slope)
        t_bnd = jax.ops.segment_sum(
            dy_e * bnd.w_r[:, None], bnd.src_r, num_segments=bnd.h_rows,
            indices_are_sorted=True)
        dy_i, _, _ = _ln_bwd_prologue(
            g[bnd.i_dst_r], xhat[bnd.i_dst_r], rstd[bnd.i_dst_r], gamma,
            beta, negative_slope)
        t_i = jax.ops.segment_sum(
            dy_i * bnd.i_w_r[:, None], bnd.i_row_rev,
            num_segments=bnd.m_rev * bnd.kt, indices_are_sorted=True,
        ).reshape(bnd.m_rev, bnd.kt, g.shape[1])
        dx, dwl, dwr, dstats = banded_sage_ln_bwd_pallas(
            g.astype(x.dtype), xhat, rstd, wl, wr, gamma, beta, int_rev, x,
            negative_slope=negative_slope,
            resid=(t_i.astype(x.dtype), bnd.rg_rev), interpret=interpret)
        dgamma, dbeta = dstats[0], dstats[1]
        db = None if bias is None else dstats[2].astype(bias.dtype)
        dx = dx.astype(x.dtype)
    else:
        from ..ops.banded_residual import _expand_compact

        dy, dgamma, dbeta = _ln_bwd_prologue(g, xhat, rstd, gamma, beta,
                                             negative_slope)
        gq = dy.astype(x.dtype)
        t_bnd = boundary_rev(gq, bnd)
        t = spmm_banded_xla(gq, int_rev)
        t = _expand_compact(t, interior_rev_compact(gq, bnd), bnd.rg_rev)
        dx = (
            jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
            + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
        ).astype(x.dtype)
        dwl = jnp.dot(x.T, t.astype(x.dtype), preferred_element_type=f32)
        dwr = jnp.dot(x.T, gq.astype(x.dtype), preferred_element_type=f32)
        db = None if bias is None else dy.sum(axis=0).astype(bias.dtype)
    dwl = dwl + jnp.dot(halo.T, t_bnd.astype(halo.dtype),
                        preferred_element_type=f32)
    dhalo = jnp.dot(t_bnd.astype(halo.dtype), wl.T.astype(halo.dtype),
                    preferred_element_type=f32).astype(halo.dtype)
    return (dx, dhalo,
            _psum(dwl.astype(wl.dtype), axis_name),
            _psum(dwr.astype(wr.dtype), axis_name),
            _psum(db, axis_name),
            _psum(dgamma.astype(gamma.dtype), axis_name),
            _psum(dbeta.astype(beta.dtype), axis_name),
            None, None, None)


halo_fused_sage_ln.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


# ------------------------------------------------- OVERLAP variants (VJP)
#
# The fused layers above consume the boundary partial as a kernel operand,
# so the interior kernel WAITS on the all-to-all (module docstring). These
# variants restructure the forward so the collective and the interior
# kernel are data-independent and XLA's latency-hiding scheduler can run
# them concurrently (async all-to-all-start ... kernel ... done):
#
#   * the kernel's resid operand carries ONLY interior-overflow edges
#     (x-derived — no collective input), and the kernel emits a compact
#     second output y_pre_c [m_b, K*T, H] with each boundary-touched
#     group's pre-LN/pre-activation y;
#   * a small post-collective epilogue computes the boundary partial
#     (boundary_fwd_sep), completes y for the touched rows
#     (y_s = y_pre_c + (R_b halo) Wl), redoes LN/act on those O(m_b*K*T)
#     rows, and patches them into the kernel's outputs.
#
# The backward already has the right dependence shape — dhalo (the bwd
# collective's input) derives from t_bnd = Rᵀ·g alone, never from the
# reverse kernel — so it is shared verbatim with the non-overlap layers.
# tests/test_halo_overlap.py proves both properties on the jaxpr/HLO.


def _ov_epilogue_y(ypre, halo, wl, x_dtype, bnd):
    """y_s [m_b, K*T, H] f32: complete the touched groups' pre-epilogue y
    with the boundary term ((R_b halo) @ Wl at the storage dtype)."""
    r_b = boundary_fwd_sep(halo, bnd)  # [m_b, kt, D] f32
    add = jnp.dot(
        r_b.reshape(bnd.m_b * bnd.kt, -1).astype(x_dtype), wl,
        preferred_element_type=jnp.float32,
    ).reshape(bnd.m_b, bnd.kt, -1)
    return ypre + add


def _ov_fwd_impl(x, halo, wl, wr, bias, int_fwd, bnd, use_pallas, slope,
                 interpret):
    r_io = io_fwd_compact(x, bnd)
    if use_pallas and not int_fwd.wide:
        out, ypre = banded_sage_fwd_pallas(
            x, wl, wr, bias, int_fwd,
            resid=(r_io.astype(x.dtype), bnd.rg_io),
            negative_slope=slope, interpret=interpret,
            ypre=(bnd.rg_b, bnd.m_b))
    else:
        agg = spmm_banded_xla(x, int_fwd)
        agg = _expand_compact(agg, r_io, bnd.rg_io)
        y = agg @ wl + x @ wr
        if bias is not None:
            y = y + bias
        out = _act(y, slope).astype(x.dtype)
        steps = bnd.rg_b.shape[0]
        ypre = y.astype(jnp.float32).reshape(steps, bnd.kt, -1)[
            jnp.clip(bnd.slot_grp, 0, steps - 1)]
    y_s = _ov_epilogue_y(ypre, halo, wl, x.dtype, bnd)
    out_s = _act(y_s, slope)
    return _patch_groups(out, out_s, bnd.slot_grp, bnd.kt)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def halo_fused_sage_ov(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
                       use_pallas: bool, negative_slope: float | None = None,
                       interpret: bool = False, axis_name: str | None = None):
    """Overlap twin of :func:`halo_fused_sage`: identical math, but the
    interior kernel is data-independent of the all-to-all (see the section
    comment). Backward is shared with the non-overlap layer."""
    return _ov_fwd_impl(x, halo, wl, wr, bias, int_fwd, bnd, use_pallas,
                        negative_slope, interpret)


def _ov_vjp_fwd(x, halo, wl, wr, bias, int_fwd, int_rev, bnd,
                use_pallas, negative_slope, interpret, axis_name):
    y = _ov_fwd_impl(x, halo, wl, wr, bias, int_fwd, bnd, use_pallas,
                     negative_slope, interpret)
    return y, (x, halo, wl, wr, bias, int_rev, bnd, y)


halo_fused_sage_ov.defvjp(_ov_vjp_fwd, _vjp_bwd)


def _ln_ov_fwd_impl(x, halo, wl, wr, bias, gamma, beta, int_fwd, bnd,
                    use_pallas, slope, eps, interpret):
    r_io = io_fwd_compact(x, bnd)
    if use_pallas and not int_fwd.wide:
        out, xhat, rstd, ypre = banded_sage_fwd_pallas(
            x, wl, wr, bias, int_fwd,
            resid=(r_io.astype(x.dtype), bnd.rg_io),
            negative_slope=slope, ln=(gamma, beta), eps=eps,
            interpret=interpret, ypre=(bnd.rg_b, bnd.m_b))
    else:
        agg = spmm_banded_xla(x, int_fwd)
        agg = _expand_compact(agg, r_io, bnd.rg_io)
        y = agg @ wl + x @ wr
        if bias is not None:
            y = y + bias
        z, xhat_f, rstd = _ln_fwd_xla(y, gamma, beta, eps)
        out = _act(z, slope).astype(x.dtype)
        xhat = xhat_f.astype(x.dtype)
        steps = bnd.rg_b.shape[0]
        ypre = y.astype(jnp.float32).reshape(steps, bnd.kt, -1)[
            jnp.clip(bnd.slot_grp, 0, steps - 1)]
    y_s = _ov_epilogue_y(ypre, halo, wl, x.dtype, bnd)
    z_s, xhat_s, rstd_s = _ln_fwd_xla(y_s, gamma, beta, eps)
    out_s = _act(z_s, slope)
    return (_patch_groups(out, out_s, bnd.slot_grp, bnd.kt),
            _patch_groups(xhat, xhat_s, bnd.slot_grp, bnd.kt),
            _patch_groups(rstd, rstd_s, bnd.slot_grp, bnd.kt))


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def halo_fused_sage_ln_ov(x, halo, wl, wr, bias, gamma, beta,
                          int_fwd, int_rev, bnd,
                          use_pallas: bool,
                          negative_slope: float | None = None,
                          eps: float = 1e-5, interpret: bool = False,
                          axis_name: str | None = None):
    """Overlap twin of :func:`halo_fused_sage_ln` (whole-sublayer fusion
    with collective/compute overlap; backward shared)."""
    out, _, _ = _ln_ov_fwd_impl(x, halo, wl, wr, bias, gamma, beta,
                                int_fwd, bnd, use_pallas, negative_slope,
                                eps, interpret)
    return out


def _ln_ov_vjp_fwd(x, halo, wl, wr, bias, gamma, beta, int_fwd, int_rev,
                   bnd, use_pallas, negative_slope, eps, interpret,
                   axis_name):
    out, xhat, rstd = _ln_ov_fwd_impl(
        x, halo, wl, wr, bias, gamma, beta, int_fwd, bnd, use_pallas,
        negative_slope, eps, interpret)
    return out, (x, halo, wl, wr, bias, gamma, beta, xhat, rstd,
                 int_rev, bnd)


halo_fused_sage_ln_ov.defvjp(_ln_ov_vjp_fwd, _ln_vjp_bwd)
