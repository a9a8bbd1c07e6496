"""Banded SpMM with a compact residual overflow — NEAR-banded graphs.

The banded backend (ops/spmm_banded.py) sizes its A tiles and x windows by
the MAX source span over all destination blocks, so one outlier block
inflates the whole kernel's HBM traffic: a reordered real graph (RCM /
Hilbert, graph/reorder.py) typically leaves <0.1% of edges outside a tight
band but a handful of blocks with 1.5-2x the median span, and the pure
banded kernel pays that worst-case span on EVERY block (measured: a
shuffled+RCM headline graph ran at 81% of the sorted-graph rate — span 8
vs 5).

This module splits the static edge set once on the host:

  * edges inside a per-destination-block window of ``span`` tiles (the
    window is chosen per block to cover the most edges) go to the banded
    kernel at the TIGHT span;
  * the few overflow edges become a compact residual: their aggregate is
    computed by XLA gather/segment_sum into ``[m, K*T, D]`` rows — one
    slot per GRID GROUP that contains any residual destination (slot 0 is
    a zeros dummy) — and added inside the fused kernel through a
    scalar-prefetch-indexed BlockSpec (ops/sage_fused.py ``resid=``).

Residual traffic scales with the number of AFFECTED groups (m·K·T·D), not
with N·D, so the split recovers the sorted-graph rate instead of trading
one overhead for another. The same split makes the flagship kernel apply
to graphs the real builders emit (imperfect locality, skewed degrees) —
reference emission order: /root/reference/src/gbuilder.py:392-424 (file
order, not spatial order).

Aggregation = banded part + residual part, both linear; the unfused apply
composes them with ordinary AD (the banded half carries its own custom
VJP), the fused apply pairs the compact forward residual with a compact
reverse residual in a custom VJP mirroring ops/sage_fused.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TILE, check_edge_range, pad_nodes
from .spmm_banded import BandedBlocks, build_banded_counts, spmm_banded_apply, spmm_banded_xla


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BandedResidualLayout:
    """Banded layouts (span-bounded) + compact residual COO.

    Residual convention: edge e (src -> dst) contributes
    ``w[e] * x[src[e]]`` to row ``row_fwd[e]`` of the compact forward
    residual (rows live in ``[m_fwd * K*T)``, slot 0 = dummy zeros) and
    ``w[e] * g[dst[e]]`` to row ``row_rev[e]`` of the compact reverse
    residual. ``rg_fwd/rg_rev [steps]`` map each banded grid group to its
    compact slot (0 when the group has no residual);
    ``slot_group_fwd/rev [m]`` is the inverse (slot -> group id, dummy 0).
    ``r_w`` carries the FULL-degree mean weight 1/deg(dst) — the banded
    half's row/col scales also use the full degree, so the two halves sum
    to the exact mean aggregation.
    """

    banded_fwd: BandedBlocks
    banded_rev: BandedBlocks
    # forward-order arrays (sorted by r_row_fwd) and reverse-order arrays
    # (sorted by r_row_rev): each direction's segment_sum then runs with
    # indices_are_sorted=True — XLA TPU compiles UNSORTED row scatters
    # pathologically slowly (measured 250+ s for a 376-row scatter at the
    # 50k-node probe vs seconds sorted)
    r_src: jax.Array      # [Er] gather rows of x (fwd order)
    r_row_fwd: jax.Array  # [Er] sorted compact rows
    r_w: jax.Array        # [Er] mean weights (fwd order)
    r_dst: jax.Array      # [Er] gather rows of g (rev order)
    r_row_rev: jax.Array  # [Er] sorted compact rows
    r_w_rev: jax.Array    # [Er] mean weights (rev order)
    rg_fwd: jax.Array
    rg_rev: jax.Array
    n_pad: int = field(metadata=dict(static=True))
    m_fwd: int = field(metadata=dict(static=True))
    m_rev: int = field(metadata=dict(static=True))
    # informational (static so it survives pytree transforms)
    resid_frac: float = field(default=float("nan"), metadata=dict(static=True))

    @property
    def group_rows(self) -> int:
        return self.banded_fwd.k * self.banded_fwd.tile

    @property
    def steps(self) -> int:
        return self.n_pad // self.group_rows


def _choose_windows(sb: np.ndarray, db: np.ndarray, nb: int, span: int):
    """Per-destination-block source window base covering the most edges.

    Blocks whose full span fits keep their min source block; for the rest a
    two-pointer sweep over the block's sorted source blocks finds the
    densest width-``span`` window (optimal: some max-coverage window can be
    shifted so its upper edge touches a source block). Returns ``(bo,
    in_band)`` where ``in_band`` is the per-edge coverage mask."""
    bo = np.arange(nb, dtype=np.int64)
    hi = bo.copy()
    if len(sb):
        np.minimum.at(bo, db, sb)
        np.maximum.at(hi, db, sb)
    over = np.nonzero(hi - bo + 1 > span)[0]
    if len(over):
        order = np.lexsort((sb, db))
        dbs, sbs = db[order], sb[order]
        starts = np.searchsorted(dbs, over)
        ends = np.searchsorted(dbs, over + 1)
        for b, s0, s1 in zip(over, starts, ends):
            v = sbs[s0:s1]
            lo = np.searchsorted(v, v - span + 1, side="left")
            cnt = np.arange(1, len(v) + 1) - lo
            i = int(np.argmax(cnt))
            bo[b] = min(max(int(v[i]) - span + 1, 0), max(nb - span, 0))
    in_band = (sb >= bo[db]) & (sb < bo[db] + span) if len(sb) else np.zeros(0, bool)
    return bo, in_band


def _residual_maps(nodes_r: np.ndarray, k: int, tile: int, steps: int):
    """Compact slot assignment for residual rows on one direction's grid.

    ``nodes_r``: destination node id (in THAT direction) per residual edge.
    Returns (rows [Er], rg [steps], order [Er], m) where ``order`` sorts
    the edges by compact row (ascending) for sorted segment sums."""
    kt = k * tile
    grp = nodes_r // kt
    uniq = np.unique(grp)
    rg = np.zeros(steps, np.int32)
    rg[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    rows = rg[grp].astype(np.int64) * kt + (nodes_r - grp * kt)
    order = np.argsort(rows, kind="stable")
    return rows.astype(np.int32), rg, order, len(uniq) + 1


def split_banded_residual(
    src: np.ndarray,
    dst: np.ndarray,
    nb: int,
    *,
    tile: int = TILE,
    span: int = 8,
):
    """In-band mask for a given span: forward windows over all edges, then
    reverse windows over the forward survivors (the banded REVERSE layout
    must be span-bounded too — bandedness is not symmetric under per-block
    window choice)."""
    db = np.asarray(dst, np.int64) // tile
    sb = np.asarray(src, np.int64) // tile
    _, in_f = _choose_windows(sb, db, nb, span)
    keep = in_f.copy()
    if keep.any():
        _, in_r = _choose_windows(db[keep], sb[keep], nb, span)
        idx = np.nonzero(keep)[0]
        keep[idx[~in_r]] = False
    return keep


def prepare_banded_residual_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    k: int = 4,
    span: int | None = None,
    max_span: int = 16,
    resid_frac: float = 0.005,
    count_cap: int | None = None,
) -> tuple[BandedResidualLayout, int]:
    """Build the span-bounded banded + compact-residual split for mean
    aggregation (int8 count tiles, FULL-degree scales).

    ``span=None`` picks the candidate span (edge-weighted percentiles of
    the per-block span distribution, plus max_span) minimizing a traffic
    model: banded A bytes (∝ nb·span, both directions) + residual-group
    slot traffic (∝ affected groups × K·T·feat_dim_hint — the segment_sum
    write plus the kernel's gated DMA read, see the fused kernels) — NOT
    simply the tightest span: a tighter band with outliers scattered over
    many groups can cost more than one extra A slot per block. Raises
    ValueError when even ``max_span`` leaves more than ``4 * resid_frac``
    of edges outside the band (the graph is not near-banded — use the
    dense/hybrid backends)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)
    nb = pad_nodes(num_nodes, tile) // tile
    nb = ((nb + k - 1) // k) * k
    n_pad = nb * tile
    steps = nb // k
    e = max(len(src), 1)
    feat_dim_hint = 128  # nominal D for the traffic model (relative choice)

    if span is None:
        db = dst // tile
        bo = np.arange(nb, dtype=np.int64)
        hi = bo.copy()
        if len(src):
            np.minimum.at(bo, db, src // tile)
            np.maximum.at(hi, db, src // tile)
        per_edge_span = (hi - bo + 1)[db] if len(src) else np.array([1])
        cands = sorted(
            {int(np.percentile(per_edge_span, q)) for q in (50, 75, 90, 99)}
            | {max_span}
        )
        cands = [c for c in cands if c <= max_span]
        best_cost = np.inf
        span = cands[-1]
        kt = k * tile
        for c in cands:
            keep_c = split_banded_residual(src, dst, nb, tile=tile, span=c)
            er = len(src) - int(keep_c.sum())
            if er / e > 4 * resid_frac:
                continue
            rs, rd = src[~keep_c], dst[~keep_c]
            m = len(np.unique(rd // kt)) + len(np.unique(rs // kt))
            cost = (2 * nb * c * tile * tile  # int8 A, both directions
                    + 2 * m * kt * feat_dim_hint * 2)  # slot write+read, bf16
            if cost < best_cost:
                best_cost, span = cost, c

    keep = split_banded_residual(src, dst, nb, tile=tile, span=span)
    frac = float((len(src) - keep.sum()) / e)
    if frac > 4 * resid_frac:
        raise ValueError(
            f"residual fraction {frac:.4f} at span={span} exceeds "
            f"{4 * resid_frac:.4f}: graph is not near-banded — use the "
            "dense/hybrid backends")
    if count_cap is not None and keep.any():
        # cap banded tile values at count_cap by spilling EXCESS edge
        # multiplicity (copies beyond the cap of a duplicated (src, dst)
        # pair) into the residual as ordinary unit-weight entries — keeps
        # the banded counts int4-safe (counts_to_int4) with exact math.
        # Unique-edge graphs are untouched.
        kept_idx = np.nonzero(keep)[0]
        s_in0, d_in0 = src[kept_idx], dst[kept_idx]
        order = np.lexsort((s_in0, d_in0))
        ss, dd = s_in0[order], d_in0[order]
        new = np.ones(len(ss), bool)
        new[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
        run_id = np.cumsum(new) - 1
        first = np.nonzero(new)[0]
        within = np.arange(len(ss)) - first[run_id]
        drop = within >= count_cap
        if drop.any():
            keep[kept_idx[order[drop]]] = False
        frac = float((len(src) - keep.sum()) / e)
        if frac > 4 * resid_frac:
            raise ValueError(
                f"residual fraction {frac:.4f} after count_cap={count_cap} "
                f"multiplicity spill exceeds {4 * resid_frac:.4f}: graph has "
                "too much edge multiplicity for the near-banded tier — use "
                "the dense/hybrid backends")

    s_in, d_in = src[keep], dst[keep]
    fwd = build_banded_counts(s_in, d_in, num_nodes, tile=tile, k=k, max_span=span)
    rev = build_banded_counts(d_in, s_in, num_nodes, tile=tile, k=k, max_span=span)
    assert fwd.num_dst_blocks == nb, (fwd.num_dst_blocks, nb)
    # FULL degree (banded + residual edges): the two halves must sum to the
    # exact mean — same rule as ops/spmm_hybrid.py
    deg = np.bincount(dst, minlength=n_pad)
    scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)
    fwd = BandedBlocks(a=fwd.a, bo=fwd.bo, woff=fwd.woff, off=fwd.off,
                       row_scale=scale, tile=tile, wsz=fwd.wsz, k=k)
    rev = BandedBlocks(a=rev.a, bo=rev.bo, woff=rev.woff, off=rev.off,
                       col_scale=scale, tile=tile, wsz=rev.wsz, k=k)

    r_src = src[~keep]
    r_dst = dst[~keep]
    r_w = (1.0 / np.maximum(deg, 1))[r_dst].astype(np.float32)
    row_f, rg_f, of, m_f = _residual_maps(r_dst, k, tile, steps)
    row_r, rg_r, orv, m_r = _residual_maps(r_src, k, tile, steps)

    layout = BandedResidualLayout(
        banded_fwd=fwd, banded_rev=rev,
        r_src=r_src[of].astype(np.int32), r_row_fwd=row_f[of], r_w=r_w[of],
        r_dst=r_dst[orv].astype(np.int32), r_row_rev=row_r[orv],
        r_w_rev=r_w[orv],
        rg_fwd=rg_f, rg_rev=rg_r,
        n_pad=n_pad, m_fwd=m_f, m_rev=m_r, resid_frac=frac,
    )
    return layout, n_pad


# ------------------------------------------------------------- apply paths


def residual_fwd_compact(x: jax.Array, layout: BandedResidualLayout) -> jax.Array:
    """Compact forward residual aggregate: [m_fwd, K*T, D] f32 (slot 0 =
    zeros). A gather + SORTED segment_sum over the few overflow edges."""
    kt = layout.group_rows
    msgs = x[layout.r_src].astype(jnp.float32) * layout.r_w[:, None]
    r = jax.ops.segment_sum(msgs, layout.r_row_fwd,
                            num_segments=layout.m_fwd * kt,
                            indices_are_sorted=True)
    return r.reshape(layout.m_fwd, kt, x.shape[1])


def residual_rev_compact(g: jax.Array, layout: BandedResidualLayout) -> jax.Array:
    """Compact reverse residual (Rᵀ g rows): [m_rev, K*T, H] f32."""
    kt = layout.group_rows
    msgs = g[layout.r_dst].astype(jnp.float32) * layout.r_w_rev[:, None]
    r = jax.ops.segment_sum(msgs, layout.r_row_rev,
                            num_segments=layout.m_rev * kt,
                            indices_are_sorted=True)
    return r.reshape(layout.m_rev, kt, g.shape[1])


def _expand_compact(out: jax.Array, r: jax.Array, rg: jax.Array) -> jax.Array:
    """Add each group's compact residual slot to the full output — a
    GATHER by the group→slot map (residual-free groups read the zeros
    dummy), never a scatter (XLA TPU compiles unsorted scatters slowly)."""
    n_pad, d = out.shape
    return out + r[rg].reshape(n_pad, d).astype(out.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_banded_residual_apply(x: jax.Array, layout: BandedResidualLayout,
                               use_pallas: bool) -> jax.Array:
    """Mean aggregation = banded part + expanded residual. Custom VJP: the
    transpose runs the REVERSE banded layout plus the rev-sorted residual
    maps — both directions are forward-style gather/segment_sum programs,
    so no gather is ever AD-transposed into an unsorted scatter."""
    return _resid_agg_fwd_impl(x, layout, use_pallas)


def _resid_agg_fwd_impl(x, layout, use_pallas):
    out = spmm_banded_apply(x, layout.banded_fwd, layout.banded_rev, use_pallas)
    r = residual_fwd_compact(x, layout)
    return _expand_compact(out, r, layout.rg_fwd)


def _resid_agg_vjp_fwd(x, layout, use_pallas):
    return _resid_agg_fwd_impl(x, layout, use_pallas), (layout,)


def _resid_agg_vjp_bwd(use_pallas, res, g):
    (layout,) = res
    # Âᵀ g = banded transpose + reverse residual (both forward-style)
    t = spmm_banded_apply(g, layout.banded_rev, layout.banded_fwd, use_pallas)
    t = _expand_compact(t, residual_rev_compact(g, layout), layout.rg_rev)
    return t, None


spmm_banded_residual_apply.defvjp(_resid_agg_vjp_fwd, _resid_agg_vjp_bwd)


# ----------------------------------------------------- fused layer (VJP)


def _fused_fwd_impl(x, wl, wr, bias, layout, use_pallas, slope, interpret):
    from .sage_fused import _act, banded_sage_fwd_pallas

    r = residual_fwd_compact(x, layout)
    if use_pallas:
        # slots stream at the activation dtype (the kernel's MXU operands
        # round to bf16 anyway; halves the gated-DMA bytes)
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, layout.banded_fwd,
            resid=(r.astype(x.dtype), layout.rg_fwd),
            negative_slope=slope, interpret=interpret)
    agg = spmm_banded_xla(x, layout.banded_fwd)
    agg = _expand_compact(agg, r, layout.rg_fwd)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    return _act(y, slope).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def banded_residual_sage_apply(x, wl, wr, bias, layout: BandedResidualLayout,
                               use_pallas: bool,
                               negative_slope: float | None = None,
                               interpret: bool = False):
    """Differentiable fused SAGE layer over the banded+residual split:
    act((B + R) x Wl + x Wr + bias) with the residual aggregate injected
    into the fused kernel as a compact extra operand — the epilogue fusion
    of ops/sage_fused.py survives the overflow edges."""
    return _fused_fwd_impl(x, wl, wr, bias, layout, use_pallas,
                           negative_slope, interpret)


def _vjp_fwd(x, wl, wr, bias, layout, use_pallas, negative_slope, interpret):
    y = _fused_fwd_impl(x, wl, wr, bias, layout, use_pallas,
                        negative_slope, interpret)
    res = (x, wl, wr, bias, layout, y if negative_slope is not None else None)
    return y, res


def _vjp_bwd(use_pallas, negative_slope, interpret, res, g):
    from .sage_fused import banded_sage_bwd_pallas

    x, wl, wr, bias, layout, y = res
    if negative_slope is not None:
        g = jnp.where(y > 0, g, jnp.asarray(negative_slope, g.dtype) * g)
    gq = g.astype(x.dtype)
    f32 = jnp.float32
    t_r = residual_rev_compact(gq, layout)  # compact Rᵀ g̃
    # same gate as sage_fused._vjp_bwd: a widened reverse layout can't feed
    # the narrow-slot fused kernel — fall through to the XLA branch
    if use_pallas and not layout.banded_rev.wide:
        # dx AND the dW matmuls in one fused reverse pass; the compact
        # residual is injected into the aggregate before the in-kernel
        # dx/dWl matmuls, so every output carries the full Âᵀ g̃ — and t
        # itself never round-trips HBM
        dx, dwl, dwr = banded_sage_bwd_pallas(
            gq, wl, wr, layout.banded_rev, x=x,
            resid=(t_r.astype(gq.dtype), layout.rg_rev),
            interpret=interpret)
        dx = dx.astype(x.dtype)
        dwl, dwr = dwl.astype(wl.dtype), dwr.astype(wr.dtype)
    else:
        t = spmm_banded_xla(gq, layout.banded_rev)
        t = _expand_compact(t, t_r, layout.rg_rev)
        dx = (
            jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
            + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
        ).astype(x.dtype)
        dwl = jnp.dot(x.T, t.astype(x.dtype),
                      preferred_element_type=f32).astype(wl.dtype)
        dwr = jnp.dot(x.T, gq.astype(x.dtype),
                      preferred_element_type=f32).astype(wr.dtype)
    db = None if bias is None else g.sum(axis=0).astype(bias.dtype)
    return dx, dwl, dwr, db, None


banded_residual_sage_apply.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------- LayerNorm-fused layer (VJP, resid)


def _ln_fused_fwd_impl(x, wl, wr, bias, gamma, beta, layout, use_pallas,
                       slope, eps, interpret):
    from .sage_fused import _act, _ln_fwd_xla, banded_sage_fwd_pallas

    r = residual_fwd_compact(x, layout)
    if use_pallas:
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, layout.banded_fwd,
            resid=(r.astype(x.dtype), layout.rg_fwd),
            negative_slope=slope, ln=(gamma, beta), eps=eps,
            interpret=interpret)
    agg = spmm_banded_xla(x, layout.banded_fwd)
    agg = _expand_compact(agg, r, layout.rg_fwd)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    z, xhat, rstd = _ln_fwd_xla(y, gamma, beta, eps)
    return _act(z, slope).astype(x.dtype), xhat.astype(x.dtype), rstd


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def banded_residual_sage_ln_apply(x, wl, wr, bias, gamma, beta,
                                  layout: BandedResidualLayout,
                                  use_pallas: bool,
                                  negative_slope: float | None = None,
                                  eps: float = 1e-5,
                                  interpret: bool = False):
    """act(LN((B + R) x Wl + x Wr + bias)) as one fused kernel each way —
    the LayerNorm-fused layer (ops/sage_fused.py banded_sage_ln_apply)
    over the banded+residual split."""
    out, _, _ = _ln_fused_fwd_impl(x, wl, wr, bias, gamma, beta, layout,
                                   use_pallas, negative_slope, eps, interpret)
    return out


def _ln_vjp_fwd(x, wl, wr, bias, gamma, beta, layout, use_pallas,
                negative_slope, eps, interpret):
    out, xhat, rstd = _ln_fused_fwd_impl(
        x, wl, wr, bias, gamma, beta, layout, use_pallas, negative_slope,
        eps, interpret)
    return out, (x, wl, wr, bias, gamma, beta, xhat, rstd, layout)


def _ln_vjp_bwd(use_pallas, negative_slope, eps, interpret, res, g):
    from .sage_fused import (
        _ln_bwd_prologue,
        banded_sage_ln_bwd_pallas,
    )

    x, wl, wr, bias, gamma, beta, xhat, rstd, layout = res
    f32 = jnp.float32
    if use_pallas and not layout.banded_rev.wide:
        # dy is derived IN-KERNEL from the raw g + xhat/rstd residuals
        # (sage_fused._bwd_ln_kernel); only the few residual rows need dy
        # on the XLA side — computed pointwise after the gather, so the
        # full-[N, H] prologue pass never materializes
        rows = layout.r_dst
        dy_r, _, _ = _ln_bwd_prologue(
            g[rows], xhat[rows], rstd[rows], gamma, beta, negative_slope)
        kt = layout.group_rows
        t_r = jax.ops.segment_sum(
            dy_r * layout.r_w_rev[:, None], layout.r_row_rev,
            num_segments=layout.m_rev * kt, indices_are_sorted=True,
        ).reshape(layout.m_rev, kt, g.shape[1])
        dx, dwl, dwr, dstats = banded_sage_ln_bwd_pallas(
            g.astype(x.dtype), xhat, rstd, wl, wr, gamma, beta,
            layout.banded_rev, x, negative_slope=negative_slope,
            resid=(t_r.astype(x.dtype), layout.rg_rev), interpret=interpret)
        db = None if bias is None else dstats[2].astype(bias.dtype)
        return (dx.astype(x.dtype), dwl.astype(wl.dtype),
                dwr.astype(wr.dtype), db, dstats[0].astype(gamma.dtype),
                dstats[1].astype(beta.dtype), None)
    dy, dgamma, dbeta = _ln_bwd_prologue(g, xhat, rstd, gamma, beta,
                                         negative_slope)
    gq = dy.astype(x.dtype)
    t_r = residual_rev_compact(gq, layout)
    t = spmm_banded_xla(gq, layout.banded_rev)
    t = _expand_compact(t, t_r, layout.rg_rev)
    dx = (
        jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
        + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
    ).astype(x.dtype)
    dwl = jnp.dot(x.T, t.astype(x.dtype),
                  preferred_element_type=f32).astype(wl.dtype)
    dwr = jnp.dot(x.T, gq.astype(x.dtype),
                  preferred_element_type=f32).astype(wr.dtype)
    db = None if bias is None else dy.sum(axis=0).astype(bias.dtype)
    return dx, dwl, dwr, db, dgamma, dbeta, None


banded_residual_sage_ln_apply.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
