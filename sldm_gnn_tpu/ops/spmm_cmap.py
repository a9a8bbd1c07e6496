"""Column-tile-indirect banded SpMM — the LOW-DEGREE tier.

The banded layouts (ops/spmm_banded.py) give every destination block a
CONTIGUOUS band of ``span`` source-tile slots, sized by the worst block.
On the reference's own workload shape — city lane maps at deg≈3
(/root/reference/src/gbuilder.py:392-424) — a block's ~3·T edges touch
only a handful of DISTINCT source tiles, yet the band must span them all:
at the measured city-map layout (RCM, span 15) >60% of the A count tiles
are all-zero, and the A stream dominates the step (BASELINE.md low-degree
rows; round-3 span-tightening failed because contiguity forces either a
wide band or a large residual).

This tier drops contiguity: each block keeps its C most-populated source
tiles as an arbitrary SET, with per-(block, slot) window-relative column
indices riding the scalar prefetch (``BandedBlocks.cmap``) — tile-level
indirection that Mosaic CAN express, where the per-ELEMENT gather tier
could not (ops/spmm_gather.py's documented cross-vreg limits). A bytes
drop from nb·span·T² to nb·C·T²; the x-window streaming, factored-mean
scales, int4 view, fused SAGE/LN kernels, and compact-residual overflow
machinery are all unchanged (the cmap'd layouts are ordinary
:class:`~sldm_gnn_tpu.ops.spmm_banded.BandedBlocks` inside a
:class:`~sldm_gnn_tpu.ops.banded_residual.BandedResidualLayout`).

Edge accounting stays EXACT: edges outside the kept tile sets (either
direction) spill into the compact residual with full-degree weights, the
same contract as the near-banded tier.
"""

from __future__ import annotations

import numpy as np

from ..graph.csr import TILE, check_edge_range, pad_nodes
from .banded_residual import (
    BandedResidualLayout,
    _choose_windows,
    _residual_maps,
)
from .spmm_banded import BandedBlocks


def _select_tiles(src: np.ndarray, dst: np.ndarray, nb: int, tile: int,
                  c: int, range_budget: int):
    """Per destination block: densest width-``range_budget`` source-tile
    window, then the C most-populated source tiles inside it.

    Returns (keep [E] bool, kept_abs [nb, c] int64 source-tile ids sorted
    ascending with sentinel nb for empty slots)."""
    db = dst // tile
    sb = src // tile
    _, in_win = _choose_windows(sb, db, nb, range_budget)
    kept_abs = np.full((nb, c), nb, np.int64)  # sentinel: past every tile
    keep = np.zeros(len(src), bool)
    if not in_win.any():
        return keep, kept_abs
    iw = np.nonzero(in_win)[0]
    pair = db[iw] * np.int64(nb) + sb[iw]
    uniq, inv, cnt = np.unique(pair, return_inverse=True, return_counts=True)
    updb = uniq // nb
    upsb = uniq % nb
    # per block: tiles by descending edge count (ties -> lower tile id)
    order = np.lexsort((upsb, -cnt, updb))
    updb_o = updb[order]
    first = np.searchsorted(updb_o, np.arange(nb), "left")
    rank = np.arange(len(order)) - first[updb_o]
    sel = rank < c
    kept_abs[updb_o[sel], rank[sel]] = upsb[order[sel]]
    kept_abs.sort(axis=1)  # ascending; sentinels trail
    kept_pair = np.zeros(len(uniq), bool)
    kept_pair[order[sel]] = True
    keep[iw] = kept_pair[inv]
    return keep, kept_abs


def _fill_cmap_counts(src: np.ndarray, dst: np.ndarray, kept_abs: np.ndarray,
                      nb: int, tile: int, k: int, *, wsz_min: int = 0):
    """Count tiles + window metadata for a kept edge set whose source
    tiles all appear in ``kept_abs`` rows."""
    c = kept_abs.shape[1]
    db = dst // tile
    sb = src // tile
    # slot of each edge's tile in its block's sorted kept list
    slot = (kept_abs[db] < sb[:, None]).sum(axis=1) if len(src) else (
        np.zeros(0, np.int64))
    if len(src):
        assert (kept_abs[db, np.minimum(slot, c - 1)] == sb).all(), (
            "edge tile missing from kept set")
    a = np.zeros((nb, c, tile, tile), np.float32)
    if len(src):
        np.add.at(a, (db, slot, dst - db * tile, src - sb * tile), 1.0)
    cmax = int(a.max()) if a.size else 0
    if cmax > 127:
        raise ValueError(f"edge multiplicity {cmax} overflows int8 counts")

    own = np.arange(nb, dtype=np.int64)
    valid = kept_abs < nb
    lo = np.where(valid[:, 0], np.minimum(kept_abs[:, 0], own), own)
    hi_t = np.where(valid, kept_abs, -1).max(axis=1)
    hi = np.maximum(hi_t, own)
    steps = nb // k
    woff = lo.reshape(steps, k).min(axis=1)
    wsz = int((hi.reshape(steps, k).max(axis=1) - woff).max()) + 1
    wsz = max(wsz, min(wsz_min, nb))
    woff = np.minimum(woff, max(nb - wsz, 0))
    off = (lo.reshape(steps, k) - woff[:, None]).reshape(-1)
    # window-relative slot map; empty slots point at tile 0 of the window
    # (their count tiles are all-zero, so the read contributes nothing)
    wof_b = np.repeat(woff, k)
    cmap = np.where(valid, kept_abs - wof_b[:, None], 0)
    assert cmap.min(initial=0) >= 0 and cmap.max(initial=0) < wsz, (
        cmap.min(initial=0), cmap.max(initial=0), wsz)
    return BandedBlocks(
        a=a.astype(np.int8), bo=lo.astype(np.int32),
        woff=woff.astype(np.int32), off=off.astype(np.int32),
        cmap=cmap.reshape(-1).astype(np.int32),
        tile=tile, wsz=wsz, k=k,
    )


def _cap_multiplicity(src, dst, keep, cap):
    """Spill edge copies beyond ``cap`` per (src, dst) pair out of
    ``keep`` (same rule as the near-banded tier's count_cap)."""
    kept_idx = np.nonzero(keep)[0]
    s_in0, d_in0 = src[kept_idx], dst[kept_idx]
    order = np.lexsort((s_in0, d_in0))
    ss, dd = s_in0[order], d_in0[order]
    new = np.ones(len(ss), bool)
    new[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
    run_id = np.cumsum(new) - 1
    first = np.nonzero(new)[0]
    within = np.arange(len(ss)) - first[run_id]
    drop = within >= cap
    if drop.any():
        keep[kept_idx[order[drop]]] = False
    return keep


def prepare_cmap_residual_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    tile: int = TILE,
    k: int = 4,
    c: int | None = None,
    range_budget: int = 32,
    resid_frac: float = 0.005,
    count_cap: int | None = None,
) -> tuple[BandedResidualLayout, int]:
    """Column-tile-indirect layouts + compact residual for EXACT mean
    aggregation (int8 counts, full-degree scales) — drop-in for
    :func:`~sldm_gnn_tpu.ops.banded_residual.
    prepare_banded_residual_mean_aggregate` on low-degree graphs.

    ``c=None`` sweeps candidates from the per-block nonzero-source-tile
    distribution (50/75/90/99th percentiles) and keeps the smallest whose
    spilled fraction (both directions) stays within ``resid_frac``.
    ``range_budget`` bounds each block's candidate tile window (keeps the
    streamed x windows sized like the banded tier's)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    check_edge_range(src, dst, num_nodes)
    nb = pad_nodes(num_nodes, tile) // tile
    nb = ((nb + k - 1) // k) * k
    n_pad = nb * tile
    steps = nb // k
    e = max(len(src), 1)

    if c is None:
        # per-block distinct-counterpart-tile counts, BOTH directions
        # (the reverse layout needs its per-src-block dst tiles too)
        nz_all = []
        for a_, b_ in ((src, dst), (dst, src)):
            pair = np.unique((b_ // tile) * np.int64(nb) + a_ // tile)
            per_blk = np.bincount((pair // nb).astype(np.int64),
                                  minlength=nb)
            nz_all.append(per_blk[per_blk > 0])
        nz = (np.concatenate(nz_all) if any(len(z) for z in nz_all)
              else np.array([1]))
        cands = sorted({int(np.percentile(nz, q))
                        for q in (50, 75, 90, 99)} | {int(nz.max())})
        c = cands[-1]
        for cc in cands:
            k1, _ = _select_tiles(src, dst, nb, tile, cc, range_budget)
            i1 = np.nonzero(k1)[0]
            k2, _ = _select_tiles(dst[i1], src[i1], nb, tile, cc,
                                  range_budget)
            if (e - int(k2.sum())) / e <= resid_frac:
                c = cc
                break

    keep, kept_fwd = _select_tiles(src, dst, nb, tile, c, range_budget)
    i1 = np.nonzero(keep)[0]
    keep2, kept_rev = _select_tiles(dst[i1], src[i1], nb, tile, c,
                                    range_budget)
    keep[i1[~keep2]] = False
    if count_cap is not None and keep.any():
        keep = _cap_multiplicity(src, dst, keep, count_cap)
    frac = float((e - keep.sum()) / e)
    if frac > 4 * resid_frac:
        raise ValueError(
            f"residual fraction {frac:.4f} at c={c} exceeds "
            f"{4 * resid_frac:.4f}: raise c/range_budget or use the "
            "banded/dense tiers")

    s_in, d_in = src[keep], dst[keep]
    fwd = _fill_cmap_counts(s_in, d_in, kept_fwd, nb, tile, k)
    rev = _fill_cmap_counts(d_in, s_in, kept_rev, nb, tile, k)
    deg = np.bincount(dst, minlength=n_pad)
    scale = (1.0 / np.maximum(deg, 1)).astype(np.float32).reshape(-1, 1)
    fwd = BandedBlocks(a=fwd.a, bo=fwd.bo, woff=fwd.woff, off=fwd.off,
                       cmap=fwd.cmap, row_scale=scale, tile=tile,
                       wsz=fwd.wsz, k=k)
    rev = BandedBlocks(a=rev.a, bo=rev.bo, woff=rev.woff, off=rev.off,
                       cmap=rev.cmap, col_scale=scale, tile=tile,
                       wsz=rev.wsz, k=k)

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
