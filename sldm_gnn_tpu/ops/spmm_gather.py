"""Banded-GATHER SpMM — the low-degree tier for real map graphs.

STATUS (round 3): the layout, XLA path, custom VJP, and interpret-mode
Pallas kernel are exact and tested; the Pallas kernel does NOT compile on
current Mosaic — ``tpu.dynamic_gather`` only shuffles within a single
vreg along the gather dimension ("Multiple source vregs along gather
dimension"), so a [wsz*T, D]-row gather is inexpressible (also hit:
index/data bitwidth matching, no 1-D vector concat; see the lowering
rule in jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule). Kept
as an experimental tier: the traffic analysis below stands, and the
kernel becomes viable the moment Mosaic grows cross-vreg gathers. The
deg~3 production fix shipped this round is instead the measured-lever
path on the banded tiers (int4 counts + per-block window optimization +
tile sweep — BASELINE.md round-3 map rows).

The banded count-tile kernel (ops/spmm_banded.py) streams ``N x W`` bytes
of adjacency (N nodes, W band width in nodes) regardless of edge count —
that is the right trade at deg>=16 (the headline graph), but the
reference's own workload shape (city lane maps, deg~3 —
/root/reference/src/gbuilder.py:392-424) pays ~200 A-bytes per EDGE and
runs A-bound at 1/6 the headline per-edge rate (BASELINE.md round-2 map
row). Tile-size changes cannot help: A bytes = N*W for every dense-tile
shape.

This tier keeps the banded kernel's windowed-x streaming (ONE
double-buffered contiguous window DMA per K-block group) but encodes the
in-band edges SPARSELY: per destination row, up to R window-relative
source indices (int32) + multiplicities (f32). Aggregation becomes R
VMEM row-gathers + VPU multiply-adds per block instead of s_span MXU
count-tile matmuls:

    A-side bytes:  N * R * 8   (R~4: 32 B/node)   vs  N * W (~640 B/node)
    compute:       R*T*D VPU ops/block            vs  s_span*T^2*D MXU

Overflow edges — outside the span window OR beyond the R slot cap (skewed
degrees) — spill into the same compact residual as ops/banded_residual.py
(one [K*T, D] slot per affected grid group, XLA gather + sorted
segment-sum), so the split stays exact for any graph. Mean weights use
FULL degree on both halves, like every tier here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TILE, check_edge_range, pad_nodes
from .banded_residual import (
    _choose_windows,
    _residual_maps,
)
from .spmm_banded import _window_meta, _window_prologue


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GatherBlocks:
    """Sparse in-band adjacency in gather form — shaped for Mosaic's
    dynamic_gather (same-shape take_along_axis) and relayout-free sublane
    broadcasts:

    codes [NB, wsz*T, 1] int32 — per block, a WINDOW-shaped index column:
                             row j*T + t (slot j, dst row t) holds the
                             window-relative source row (src - woff*T) of
                             slot j's edge into dst row t; rows >= R*T (and
                             padding slots) hold 0. One full-window gather
                             per block selects every slot's rows at once.
    mult  [NB, R*T, 1] f32 — edge multiplicity per (slot, dst row)
                             (0 = padding), sublane layout so the per-slot
                             multiply broadcasts over lanes natively.
    bo    [NB] int32       — per-block window base (tiles), clamped like
                             the banded layout.
    woff  [steps] int32    — per-K-group x-window base (tiles).
    off   [steps*K] int32  — bo[b] - woff[group(b)] (own-rows offset for
                             fused epilogues; the gather itself uses codes).
    row_scale / col_scale  — [N_pad, 1] f32 mean scales (full degree).

    When R > wsz (possible on tiny graphs where the window clamps to the
    node count), codes holds ceil(R/wsz) window-shaped groups and the
    kernel runs that many gathers per block.
    """

    codes: jax.Array
    mult: jax.Array
    bo: jax.Array
    woff: jax.Array
    off: jax.Array
    row_scale: jax.Array | None = None
    col_scale: jax.Array | None = None
    tile: int = field(default=TILE, metadata=dict(static=True))
    wsz: int = field(default=8, metadata=dict(static=True))
    k: int = field(default=4, metadata=dict(static=True))

    @property
    def num_dst_blocks(self) -> int:
        return self.codes.shape[0]

    @property
    def r(self) -> int:
        return self.mult.shape[1] // self.tile


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GatherResidualLayout:
    """Gather layouts (both directions) + compact residual COO — field
    names/conventions mirror ops/banded_residual.BandedResidualLayout so
    its compact-residual helpers apply unchanged."""

    gather_fwd: GatherBlocks
    gather_rev: GatherBlocks
    r_src: jax.Array
    r_row_fwd: jax.Array
    r_w: jax.Array
    r_dst: jax.Array
    r_row_rev: jax.Array
    r_w_rev: jax.Array
    rg_fwd: jax.Array
    rg_rev: jax.Array
    n_pad: int = field(metadata=dict(static=True))
    m_fwd: int = field(metadata=dict(static=True))
    m_rev: int = field(metadata=dict(static=True))
    resid_frac: float = field(default=float("nan"), metadata=dict(static=True))

    @property
    def group_rows(self) -> int:
        return self.gather_fwd.k * self.gather_fwd.tile

    @property
    def steps(self) -> int:
        return self.n_pad // self.group_rows


def _build_gather_blocks(
    src: np.ndarray,
    dst: np.ndarray,
    mult: np.ndarray,
    nb: int,
    bo: np.ndarray,
    *,
    tile: int,
    k: int,
    r: int,
    span: int,
    wsz_min: int = 0,
) -> GatherBlocks:
    """Pack unique in-band (src, dst, mult) edges into the window-shaped
    code column + sublane mult arrays. Caller guarantees per-dst in-band
    unique-src count <= r and src within [bo[db], bo[db]+span)."""
    # prefer R <= wsz (one gather/block); tiny graphs may clamp wsz below
    # R, in which case codes holds ceil(R/wsz) window-shaped groups
    woff, off, wsz = _window_meta(bo, nb, k, span, wsz_min=max(wsz_min, r))
    n_g = -(-r // wsz)
    codes = np.zeros((nb, n_g * wsz * tile, 1), np.int32)
    multa = np.zeros((nb, r * tile, 1), np.float32)
    if len(src):
        order = np.lexsort((src, dst))
        s, d, m = src[order], dst[order], mult[order]
        first = np.ones(len(d), bool)
        first[1:] = d[1:] != d[:-1]
        starts = np.nonzero(first)[0]
        slot = np.arange(len(d)) - starts[np.cumsum(first) - 1]
        assert slot.max() < r, (slot.max(), r)
        db = d // tile
        row = d - db * tile
        group = db // k
        rel = s - woff[group].astype(np.int64) * tile
        assert rel.min() >= 0 and rel.max() < wsz * tile, (
            rel.min(), rel.max(), wsz * tile)
        codes[db, slot * tile + row, 0] = rel.astype(np.int32)
        multa[db, slot * tile + row, 0] = m.astype(np.float32)
    return GatherBlocks(codes=codes, mult=multa, bo=bo.astype(np.int32),
                        woff=woff, off=off, tile=tile, wsz=wsz, k=k)


def prepare_gather_residual_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    k: int = 4,
    r: int | None = None,
    span: int | None = None,
    max_span: int = 16,
    resid_frac: float = 0.02,
) -> tuple[GatherResidualLayout, int]:
    """Build the gather + compact-residual split for mean aggregation.

    ``span=None`` picks the tightest per-block-window span keeping the
    out-of-window fraction under ``resid_frac`` (sweeping the per-edge
    span percentiles like ops/banded_residual.py — a tighter window means
    a SMALLER x-window DMA here, the dominant stream once A is sparse).
    ``r=None`` picks the smallest slot cap covering >=(1 - resid_frac) of
    the in-window edges in both directions (cap 16). Raises when even
    max_span/r=16 leave more than ``4 * resid_frac`` of edges in the
    residual."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)
    nb = pad_nodes(num_nodes, tile) // tile
    nb = ((nb + k - 1) // k) * k
    n_pad = nb * tile
    steps = nb // k
    e = max(len(src), 1)

    sb, db = src // tile, dst // tile

    def window_keep(span_c):
        bo_f, in_f = _choose_windows(sb, db, nb, span_c)
        keep = in_f.copy()
        bo_r = None
        if keep.any():
            bo_r, in_r = _choose_windows(db[keep], sb[keep], nb, span_c)
            idx = np.nonzero(keep)[0]
            keep[idx[~in_r]] = False
        if bo_r is None:
            bo_r = np.arange(nb, dtype=np.int64)
        return keep, bo_f, bo_r

    if span is None:
        per_edge_span = None
        bo0 = np.arange(nb, dtype=np.int64)
        hi0 = bo0.copy()
        if len(src):
            np.minimum.at(bo0, db, sb)
            np.maximum.at(hi0, db, sb)
        per_edge_span = (hi0 - bo0 + 1)[db] if len(src) else np.array([1])
        cands = sorted(
            {int(np.percentile(per_edge_span, q)) for q in (50, 75, 90, 99)}
            | {min(max_span, int(per_edge_span.max()) if len(src) else 1)}
        )
        cands = [c for c in cands if c <= max_span]
        span = cands[-1]
        for c in cands:  # tightest window within the residual budget
            keep_c, _, _ = window_keep(c)
            if (len(src) - int(keep_c.sum())) / e <= resid_frac:
                span = c
                break
    if span > max_span:
        raise ValueError(f"span {span} exceeds max_span={max_span}")

    keep, bo_f, bo_r = window_keep(span)

    # unique (src, dst) pairs inside the window -> multiplicity folds into
    # mult; then the slot cap applies to UNIQUE sources per dst row
    def cap_direction(s, d, keep_idx, cap):
        """Return (unique s, d, mult, rank) of kept unique pairs."""
        order = np.lexsort((s, d))
        ss, dd = s[order], d[order]
        new = np.ones(len(ss), bool)
        if len(ss):
            new[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
        run = np.cumsum(new) - 1
        mult = np.bincount(run, minlength=new.sum())
        us, ud = ss[new], dd[new]
        first = np.ones(len(ud), bool)
        if len(ud):
            first[1:] = ud[1:] != ud[:-1]
        starts = np.nonzero(first)[0]
        rank = np.arange(len(ud)) - starts[np.cumsum(first) - 1] if len(ud) else np.zeros(0, np.int64)
        return us, ud, mult.astype(np.float32), rank

    if r is None:
        # traffic-model cap choice: each extra slot costs N*8 bytes of
        # codes+mult (both directions); each spilled edge's destination
        # group costs a [K*T, D] residual slot write+read — degree
        # outliers belong in the residual, not in slots everyone pays for
        ki = np.nonzero(keep)[0]
        _, ud_p, m_fp, rk_fp = cap_direction(src[ki], dst[ki], ki, 0)
        _, ud_rp, m_rp, rk_rp = cap_direction(dst[ki], src[ki], ki, 0)
        kt = k * tile
        d_hint = 128
        best_cost = np.inf
        r = 16
        for cap in (2, 3, 4, 6, 8, 12, 16):
            spilled = float(m_fp[rk_fp >= cap].sum() + m_rp[rk_rp >= cap].sum())
            if spilled / e > 2 * resid_frac:
                continue
            mg = (len(np.unique(ud_p[rk_fp >= cap] // kt))
                  + len(np.unique(ud_rp[rk_rp >= cap] // kt)))
            cost = 2 * n_pad * cap * 8 + mg * kt * d_hint * 4 * 2
            if cost < best_cost:
                best_cost, r = cost, cap

    def joint_cap(kept_mask):
        ki = np.nonzero(kept_mask)[0]
        s, d = src[ki], dst[ki]
        # fwd: rank unique pairs per dst
        order = np.lexsort((s, d))
        ss, dd = s[order], d[order]
        new = np.ones(len(ss), bool)
        if len(ss):
            new[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
        uid = np.cumsum(new) - 1  # unique-pair id per sorted edge
        ud = dd[new]
        us = ss[new]
        firstd = np.ones(len(ud), bool)
        if len(ud):
            firstd[1:] = ud[1:] != ud[:-1]
        starts = np.nonzero(firstd)[0]
        rank_f = (np.arange(len(ud)) - starts[np.cumsum(firstd) - 1]
                  if len(ud) else np.zeros(0, np.int64))
        drop_pair = rank_f >= r
        # rev: rank the SURVIVING unique pairs per src
        alive = ~drop_pair
        o2 = np.lexsort((ud[alive], us[alive]))
        us2 = us[alive][o2]
        firsts = np.ones(len(us2), bool)
        if len(us2):
            firsts[1:] = us2[1:] != us2[:-1]
        st2 = np.nonzero(firsts)[0]
        rank_r = (np.arange(len(us2)) - st2[np.cumsum(firsts) - 1]
                  if len(us2) else np.zeros(0, np.int64))
        drop2 = np.zeros(alive.sum(), bool)
        drop2[o2[rank_r >= r]] = True
        drop_pair[np.nonzero(alive)[0][drop2]] = True
        # map pair drops back to original edges
        edge_drop_sorted = drop_pair[uid]
        out = kept_mask.copy()
        out[ki[order[edge_drop_sorted]]] = False
        return out

    kept = joint_cap(keep)
    # one more fwd re-rank pass is unnecessary: removing rev-capped pairs
    # only shrinks per-dst pair counts, never pushes a rank above r

    frac = float((len(src) - kept.sum()) / e)
    if frac > 4 * resid_frac:
        raise ValueError(
            f"residual fraction {frac:.4f} at span={span}, r={r} exceeds "
            f"{4 * resid_frac:.4f}: use the banded/dense tiers")

    deg = np.bincount(dst, minlength=n_pad)
    scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)

    ki = np.nonzero(kept)[0]
    us_f, ud_f, m_f, rk_f = cap_direction(src[ki], dst[ki], ki, r)
    us_r, ud_r, m_r, rk_r = cap_direction(dst[ki], src[ki], ki, r)
    assert (rk_f < r).all() and (rk_r < r).all()
    # windows recomputed on the kept set (the cap can only tighten them)
    bo_f2, in_f2 = _choose_windows(us_f // tile, ud_f // tile, nb, span)
    bo_r2, in_r2 = _choose_windows(us_r // tile, ud_r // tile, nb, span)
    assert in_f2.all() and in_r2.all()
    gather_fwd = _build_gather_blocks(us_f, ud_f, m_f, nb, bo_f2, tile=tile,
                                      k=k, r=r, span=span)
    gather_rev = _build_gather_blocks(us_r, ud_r, m_r, nb, bo_r2, tile=tile,
                                      k=k, r=r, span=span)
    gather_fwd = GatherBlocks(
        codes=gather_fwd.codes, mult=gather_fwd.mult, bo=gather_fwd.bo,
        woff=gather_fwd.woff, off=gather_fwd.off, row_scale=scale,
        tile=tile, wsz=gather_fwd.wsz, k=k)
    gather_rev = GatherBlocks(
        codes=gather_rev.codes, mult=gather_rev.mult, bo=gather_rev.bo,
        woff=gather_rev.woff, off=gather_rev.off, col_scale=scale,
        tile=tile, wsz=gather_rev.wsz, k=k)

    r_src_e = src[~kept]
    r_dst_e = dst[~kept]
    r_w = (1.0 / np.maximum(deg, 1))[r_dst_e].astype(np.float32)
    row_f, rg_f, of, m_fc = _residual_maps(r_dst_e, k, tile, steps)
    row_r, rg_r, orv, m_rc = _residual_maps(r_src_e, k, tile, steps)

    layout = GatherResidualLayout(
        gather_fwd=gather_fwd, gather_rev=gather_rev,
        r_src=r_src_e[of].astype(np.int32), r_row_fwd=row_f[of], r_w=r_w[of],
        r_dst=r_dst_e[orv].astype(np.int32), r_row_rev=row_r[orv],
        r_w_rev=r_w[orv],
        rg_fwd=rg_f, rg_rev=rg_r,
        n_pad=n_pad, m_fwd=m_fc, m_rev=m_rc, resid_frac=frac,
    )
    return layout, n_pad


# ----------------------------------------------------------- XLA reference


def spmm_gather_xla(x: jax.Array, blocks: GatherBlocks) -> jax.Array:
    """Reference: out[b*T + t] = scale * sum_r mult[b, r*T+t] * x[abs_code]."""
    nb = blocks.num_dst_blocks
    tile, k, r = blocks.tile, blocks.k, blocks.r
    if blocks.col_scale is not None:
        x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)
    group = jnp.arange(nb) // k
    base = blocks.woff[group] * tile  # [NB]
    codes = blocks.codes[:, : r * tile, 0].reshape(nb, r, tile)
    rows = codes + base[:, None, None]  # [NB, R, T] absolute
    gathered = x[rows.reshape(-1)].reshape(nb, r, tile, x.shape[1])
    mult = blocks.mult.reshape(nb, r, tile)
    out = jnp.sum(gathered.astype(jnp.float32) * mult[..., None], axis=1)
    out = out.reshape(nb * tile, x.shape[1])
    if blocks.row_scale is not None:
        out = out * blocks.row_scale
    return out.astype(x.dtype)


# -------------------------------------------------------------- Pallas path


def _gather_kernel(woff_ref, codes_ref, mult_ref, *rest, K, tile, wsz, r,
                   has_row):
    """Mosaic's row gather (``tpu.dynamic_gather`` via take_along_axis)
    only supports SAME-SHAPE selection — indices and output must match the
    source's [wsz*T, D] shape. The host builder therefore packs each
    block's R slot-code vectors into a window-shaped [wsz*T, 1] index
    column (R <= wsz by construction); ONE full-window gather per block
    selects every slot's rows, and the per-slot [T, D] pieces are static
    slices multiplied by sublane mult columns — all relayout-free. The
    wasted (wsz-R)*T gathered rows are VPU ops on VMEM-resident data —
    noise next to the HBM streams this tier eliminates."""
    from jax.experimental import pallas as pl

    if has_row:
        rs_ref, x_hbm, out_ref, xw, sems = rest
    else:
        x_hbm, out_ref, xw, sems = rest
        rs_ref = None

    slot = _window_prologue(woff_ref, x_hbm, xw, sems, tile, wsz)
    d = out_ref.shape[1]
    # Mosaic's dynamic_gather needs indices and data at the SAME bitwidth:
    # widen the window to f32 (i32 indices) — a VPU convert on VMEM data
    window = xw[slot].astype(jnp.float32)  # [wsz*T, D]
    n_g = -(-r // wsz)
    for kk in range(K):
        acc = jnp.zeros((tile, d), jnp.float32)
        for gi in range(n_g):
            idx_b = jnp.broadcast_to(
                codes_ref[kk, gi * wsz * tile:(gi + 1) * wsz * tile],
                (wsz * tile, d))
            g = jnp.take_along_axis(window, idx_b, axis=0,
                                    mode="promise_in_bounds")
            for j in range(gi * wsz, min(r, (gi + 1) * wsz)):
                acc += (g[(j - gi * wsz) * tile:(j - gi * wsz + 1) * tile]
                        * mult_ref[kk, j * tile:(j + 1) * tile])
        if has_row:
            acc = acc * rs_ref[kk * tile:(kk + 1) * tile]
        out_ref[kk * tile:(kk + 1) * tile] = acc.astype(out_ref.dtype)


def spmm_gather_pallas(x: jax.Array, blocks: GatherBlocks, *,
                       interpret: bool = False):
    """out = G @ x over the gather layout; x padded to NB*T rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .spmm import _operand_vma

    n_pad, d = x.shape
    nb = blocks.num_dst_blocks
    tile, K, wsz, R = blocks.tile, blocks.k, blocks.wsz, blocks.r
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K
    has_row = blocks.row_scale is not None
    assert blocks.col_scale is None, "pass the FORWARD layout (row_scale)"

    specs = [
        pl.BlockSpec((K, blocks.codes.shape[1], 1),
                     lambda g, *_: (g, 0, 0)),                    # codes
        pl.BlockSpec((K, R * tile, 1), lambda g, *_: (g, 0, 0)),  # mult
    ]
    args = [blocks.codes, blocks.mult]
    if has_row:
        specs.append(pl.BlockSpec((K * tile, 1), lambda g, *_: (g, 0)))
        args.append(blocks.row_scale)
    specs.append(pl.BlockSpec(memory_space=pl.ANY))  # x in HBM
    args.append(x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # woff
        grid=(steps,),
        in_specs=specs,
        out_specs=pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, wsz * tile, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, K=K, tile=tile, wsz=wsz, r=R,
                has_row=has_row),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype,
                                       vma=_operand_vma(x, blocks.codes)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * R * tile * d,
            bytes_accessed=blocks.codes.size * 4 + blocks.mult.size * 4
            + steps * wsz * tile * d * x.dtype.itemsize
            + n_pad * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(blocks.woff, *args)


# --------------------------------------------------- differentiable wrapper


# Flip when Mosaic grows cross-vreg dynamic gathers (module docstring);
# until then the TPU-compilable path for this layout is the XLA form.
_PALLAS_GATHER_ENABLED = False


def _gather_dispatch(x, blocks, use_pallas):
    if use_pallas and _PALLAS_GATHER_ENABLED:
        if blocks.col_scale is not None:
            # reverse (col_scale) layout: the kernel only implements the
            # row_scale form, so fold the scale into x and hand the kernel
            # a scale-free view (algebraically identical: A(s⊙x) = (A⊙sᵀ)x)
            import dataclasses

            x = (x.astype(jnp.float32) * blocks.col_scale).astype(x.dtype)
            blocks = dataclasses.replace(blocks, col_scale=None)
        return spmm_gather_pallas(x, blocks)
    return spmm_gather_xla(x, blocks)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def spmm_gather_residual_apply(x, layout: GatherResidualLayout,
                               use_pallas: bool) -> jax.Array:
    """Exact mean aggregation = gather part + compact residual."""
    return _ga_fwd_impl(x, layout, use_pallas)


def _ga_fwd_impl(x, layout, use_pallas):
    from .banded_residual import _expand_compact, residual_fwd_compact

    out = _gather_dispatch(x, layout.gather_fwd, use_pallas)
    r = residual_fwd_compact(x, layout)
    return _expand_compact(out, r, layout.rg_fwd)


def _ga_vjp_fwd(x, layout, use_pallas):
    return _ga_fwd_impl(x, layout, use_pallas), (layout,)


def _ga_vjp_bwd(use_pallas, res, g):
    from .banded_residual import _expand_compact, residual_rev_compact

    (layout,) = res
    t = _gather_dispatch(g, layout.gather_rev, use_pallas)
    t_r = residual_rev_compact(g, layout)
    return (_expand_compact(t, t_r, layout.rg_rev), None)


spmm_gather_residual_apply.defvjp(_ga_vjp_fwd, _ga_vjp_bwd)
