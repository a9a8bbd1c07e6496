"""Host-memory-bounded halo-plan construction (BASELINE config 5 groundwork).

``plan_halo_blocked`` (parallel/halo.py) materializes the global edge list
AND every per-shard layout simultaneously — fine to ~50M edges, hopeless at
config 5's ~500M (the int8 banded A tiles alone are ~1 GB/shard/direction).
This module builds the same :class:`~sldm_gnn_tpu.parallel.halo.
HaloBlockedPlan` content **one shard at a time** with everything else on
disk:

  pass 1  — consume the edge stream in chunks (the caller never holds the
            full edge list either): route each edge to its destination
            shard's spill file, accumulate global in-degrees.
  pass 2  — per shard: split interior/boundary, record per-pair halo need
            sets and banded span bounds; write intermediates, free.
  pass 3  — with the now-known global floors (h_max, common span/window):
            per shard, build + save the banded interior counts (native
            int8 fill) and the one-hot boundary layouts; assemble the
            [ep, ep, H] send map.

Peak host RAM is O(chunk + one shard's edges + one shard's layouts + the
global degree array) — reported in the manifest (max RSS + working-set
estimates) so config-5 capacity planning is arithmetic, not faith. Each
multi-host worker can later ``load_streamed_halo_plan(dir, shards=...)``
for only the shards it owns; loading everything reproduces
``plan_halo_blocked(backend='banded')`` bit-for-bit (tests).
"""

from __future__ import annotations

import hashlib
import json
import resource
import uuid
from pathlib import Path

import numpy as np

from ..graph.csr import EDGE_CHUNK, TILE, block_edges, pad_nodes


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


class StreamedHaloPlanner:
    """See module docstring. Usage::

        planner = StreamedHaloPlanner(num_nodes, ep, out_dir)
        for src_chunk, dst_chunk in edge_stream:
            planner.consume(src_chunk, dst_chunk)
        manifest = planner.finalize()
    """

    def __init__(
        self,
        num_nodes: int,
        ep: int,
        out_dir: str | Path,
        *,
        tile: int = TILE,
        banded_k: int = 4,
        banded_max_span: int = 16,
        edge_chunk: int | None = None,
        step_chunks: int = 1,
        mean: bool = True,
        node_order: np.ndarray | None = None,
    ):
        """``node_order``: permutation with ``perm[new_id] = old_id``
        (graph/reorder.py convention — e.g. ``StreamingHilbert.order()``).
        When given, every consumed edge is relabeled into the new id space
        BEFORE routing/spilling, so file-order inputs (whose raw order is
        not banded) stream straight through: one O(N) relabel array
        replaces the former hard failure at pass 2's span check."""
        self.num_nodes = int(num_nodes)
        if self.num_nodes >= 2**31:
            raise ValueError("streamed planner spills int32 node ids")
        self.ep = int(ep)
        self._relabel = None
        if node_order is not None:
            perm = np.asarray(node_order, np.int64)
            if len(perm) != num_nodes:
                raise ValueError(
                    f"node_order length {len(perm)} != num_nodes {num_nodes}")
            self._relabel = np.empty(num_nodes, np.int64)
            self._relabel[perm] = np.arange(num_nodes)
        self.n_local = (num_nodes + ep - 1) // ep
        self.tile = tile
        self.banded_k = banded_k
        self.banded_max_span = banded_max_span
        self.edge_chunk = edge_chunk or EDGE_CHUNK
        self.step_chunks = step_chunks
        self.mean = mean
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        # global in-degree: the one O(num_nodes) array pass 1 must hold
        self._deg = np.zeros(self.num_nodes, np.int32)
        self._spill = [open(self.out / f"edges_p{p}.bin", "wb")
                       for p in range(ep)]
        self._counts = np.zeros(ep, np.int64)
        self._consumed = 0

    # ------------------------------------------------------------ pass 1

    def consume(self, src_chunk: np.ndarray, dst_chunk: np.ndarray) -> None:
        src = np.asarray(src_chunk, np.int64)
        dst = np.asarray(dst_chunk, np.int64)
        if src.max(initial=-1) >= self.num_nodes or dst.max(initial=-1) >= self.num_nodes:
            raise ValueError("edge endpoint out of range")
        if self._relabel is not None:
            src = self._relabel[src]
            dst = self._relabel[dst]
        np.add.at(self._deg, dst, 1)
        owner = dst // self.n_local
        order = np.argsort(owner, kind="stable")
        so, do, oo = src[order], dst[order], owner[order]
        starts = np.searchsorted(oo, np.arange(self.ep))
        ends = np.searchsorted(oo, np.arange(self.ep) + 1)
        for p in range(self.ep):
            if ends[p] > starts[p]:
                # int32 spill: node ids < 2^31 (checked in __init__) —
                # halves the pass-1 disk footprint and pass-2 read volume
                pair = np.empty((ends[p] - starts[p], 2), np.int32)
                pair[:, 0] = so[starts[p]:ends[p]]
                pair[:, 1] = do[starts[p]:ends[p]]
                self._spill[p].write(pair.tobytes())
                self._counts[p] += len(pair)
        self._consumed += len(src)

    # ------------------------------------------------- passes 2 + 3

    def _load_shard_edges(self, p: int):
        raw = np.fromfile(self.out / f"edges_p{p}.bin", dtype=np.int32)
        pair = raw.reshape(-1, 2)
        return pair[:, 0].astype(np.int64), pair[:, 1].astype(np.int64)

    def finalize(self) -> dict:
        from ..ops.spmm_banded import build_banded_counts
        from ..graph.layout_io import save_layout

        for f in self._spill:
            f.close()
        ep, n_local, tile, k = self.ep, self.n_local, self.tile, self.banded_k
        n_pad_local = pad_nodes(n_local, tile)
        nbl = ((n_pad_local // tile + k - 1) // k) * k
        n_pad_local = nbl * tile
        # padded to ep*n_local like plan_halo_blocked's bincount(minlength=
        # ep*n_local): zero-degree padding nodes get scale 1.0
        inv = np.ones(ep * n_local, np.float32)
        if self.mean:
            inv[:self.num_nodes] = 1.0 / np.maximum(self._deg, 1)
        np.save(self.out / "inv_deg.npy", inv)
        inv = inv[:self.num_nodes]

        # ---- pass 2: per-shard split + need sets + span bounds
        h_max, e_int_max, e_bnd_max = 1, 1, 1
        s_common, bases = 1, []
        peak_shard_bytes = 0
        for p in range(ep):
            src, dst = self._load_shard_edges(p)
            peak_shard_bytes = max(peak_shard_bytes, src.nbytes * 2)
            owner_src = src // n_local
            mi = owner_src == p
            isrc = (src[mi] - p * n_local).astype(np.int32)
            idst = (dst[mi] - p * n_local).astype(np.int32)
            iw = inv[dst[mi]]
            bsrc_g = src[~mi]
            bdst = (dst[~mi] - p * n_local).astype(np.int32)
            bw = inv[dst[~mi]]
            bq = (owner_src[~mi]).astype(np.int32)
            e_int_max = max(e_int_max, len(isrc))
            e_bnd_max = max(e_bnd_max, len(bsrc_g))
            needs = {}
            for q in np.unique(bq):
                ids = np.unique(bsrc_g[bq == q])
                needs[int(q)] = ids
                h_max = max(h_max, len(ids))
            np.savez(self.out / f"shard_p{p}.npz",
                     isrc=isrc, idst=idst, iw=iw.astype(np.float32),
                     bsrc_g=bsrc_g.astype(np.int32), bdst=bdst,
                     bw=bw.astype(np.float32), bq=bq,
                     **{f"need_{q}": ids.astype(np.int32)
                        for q, ids in needs.items()})
            # banded span bounds of the interior, both directions
            for s, d_ in ((isrc.astype(np.int64), idst.astype(np.int64)),
                          (idst.astype(np.int64), isrc.astype(np.int64))):
                bo = np.arange(nbl, dtype=np.int64)
                hi = bo.copy()
                if len(s):
                    np.minimum.at(bo, d_ // tile, s // tile)
                    np.maximum.at(hi, d_ // tile, s // tile)
                s_common = max(s_common, int((hi - bo + 1).max()))
                bases.append(bo)
            del src, dst
        if s_common > self.banded_max_span:
            raise ValueError(
                f"interior source span {s_common} tiles exceeds "
                f"max_span={self.banded_max_span}: shard interiors are not "
                "banded under this node order")
        w_common = 0
        for bo in bases:
            base = np.minimum(bo, max(nbl - s_common, 0)).reshape(-1, k)
            spread = int((base.max(axis=1) - base.min(axis=1)).max()) if len(base) else 0
            w_common = max(w_common, spread + s_common)

        # ---- pass 3: per-shard layouts at the common floors
        n_pad_bnd = pad_nodes(max(ep * h_max, n_local), tile)
        send_idx = np.zeros((ep, ep, h_max), np.int32)
        for p in range(ep):
            z = np.load(self.out / f"shard_p{p}.npz")
            isrc, idst, iw = z["isrc"], z["idst"], z["iw"]
            fwd = build_banded_counts(
                isrc.astype(np.int64), idst.astype(np.int64), n_pad_local,
                tile=tile, k=k, max_span=self.banded_max_span,
                s_span_min=s_common, wsz_min=w_common)
            rev = build_banded_counts(
                idst.astype(np.int64), isrc.astype(np.int64), n_pad_local,
                tile=tile, k=k, max_span=self.banded_max_span,
                s_span_min=s_common, wsz_min=w_common)
            save_layout(self.out / f"int_fwd_p{p}.npz", fwd)
            save_layout(self.out / f"int_rev_p{p}.npz", rev)
            # boundary remap into the [ep*h_max] halo-row table + send map
            bsrc_g, bdst, bw, bq = z["bsrc_g"], z["bdst"], z["bw"], z["bq"]
            hal_src = np.zeros(len(bsrc_g), np.int32)
            for q in np.unique(bq):
                ids = z[f"need_{int(q)}"]
                send_idx[int(q), p, :len(ids)] = (ids - int(q) * n_local).astype(np.int32)
                m = bq == q
                hal_src[m] = int(q) * h_max + np.searchsorted(ids, bsrc_g[m]).astype(np.int32)
            bf = block_edges(hal_src, bdst, n_pad_bnd, weight=bw, tile=tile,
                             edge_chunk=self.edge_chunk, step_chunks=self.step_chunks)
            br = block_edges(bdst, hal_src, n_pad_bnd, weight=bw, tile=tile,
                             edge_chunk=self.edge_chunk, step_chunks=self.step_chunks)
            save_layout(self.out / f"bnd_fwd_p{p}.npz", bf)
            save_layout(self.out / f"bnd_rev_p{p}.npz", br)
        np.save(self.out / "send_idx.npy", send_idx)

        manifest = {
            "num_nodes": self.num_nodes, "num_edges": int(self._consumed),
            "ep": ep, "n_local": n_local, "n_pad_local": int(n_pad_local),
            "n_pad_bnd": int(n_pad_bnd), "h_max": int(h_max),
            "tile": tile, "banded_k": k, "s_common": int(s_common),
            "w_common": int(w_common), "step_chunks": self.step_chunks,
            "mean": self.mean,
            "per_shard_edges": self._counts.tolist(),
            # host-RAM accounting: what capacity planning needs
            "peak_rss_mb": round(_rss_mb(), 1),
            "deg_array_mb": round(self._deg.nbytes / 1e6, 1),
            "peak_shard_edges_mb": round(peak_shard_bytes / 1e6, 1),
            "banded_a_mb_per_shard_dir": round(nbl * s_common * tile * tile / 1e6, 1),
            # unique per finalize: ties fused_* caches to THIS build
            "build_id": uuid.uuid4().hex,
        }
        # a rebuild into an existing plan dir must invalidate any fused
        # layout cache materialized from the PREVIOUS contents — the
        # fast-load path would otherwise silently train on the old
        # graph's layouts whenever n/ep/span coincide
        for stale in self.out.glob("fused_*"):
            stale.unlink()
        (self.out / "manifest.json").write_text(json.dumps(manifest, indent=1))
        return manifest


def load_streamed_halo_plan(out_dir: str | Path, shards=None):
    """Assemble a :class:`~sldm_gnn_tpu.parallel.halo.HaloBlockedPlan`
    (banded backend) from a streamed build. ``shards`` restricts loading to
    a subset (a multi-host worker loads only its own); the stacked leading
    dim is then ``len(shards)`` and `send_idx` keeps the full [ep, ep, H]
    map (the all-to-all needs every pair)."""
    import jax
    from ..graph.layout_io import load_layout
    from ..ops.spmm_banded import BandedBlocks
    from .halo import HaloBlockedPlan, _stack_blocked

    out = Path(out_dir)
    man = json.loads((out / "manifest.json").read_text())
    ep = man["ep"]
    shards = list(range(ep)) if shards is None else list(shards)
    n_local, n_pad_local = man["n_local"], man["n_pad_local"]
    inv = np.load(out / "inv_deg.npy")
    send_idx = np.load(out / "send_idx.npy")

    def stack_banded(names, *, row: bool):
        blocks = [load_layout(out / f"{names}_p{p}.npz") for p in shards]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        scale = np.zeros((len(shards), n_pad_local, 1), np.float32)
        for i, p in enumerate(shards):
            scale[i, :n_local, 0] = inv[p * n_local: (p + 1) * n_local]
        return BandedBlocks(
            a=stacked.a, bo=stacked.bo, woff=stacked.woff, off=stacked.off,
            row_scale=scale if row else None,
            col_scale=None if row else scale,
            tile=man["tile"], wsz=blocks[0].wsz, k=man["banded_k"],
        )

    def stack_onehot(names):
        blocks = [load_layout(out / f"{names}_p{p}.npz") for p in shards]
        return _stack_blocked(blocks, man["step_chunks"])

    return HaloBlockedPlan(
        send_idx=send_idx,
        int_fwd=stack_banded("int_fwd", row=True),
        int_rev=stack_banded("int_rev", row=False),
        bnd_fwd=stack_onehot("bnd_fwd"),
        bnd_rev=stack_onehot("bnd_rev"),
        n_local=n_local,
        n_pad_local=n_pad_local,
        n_pad_bnd=man["n_pad_bnd"],
        k_per_step=man["step_chunks"],
    )


def _fused_floors(out: Path, ep, nbl, tile, k, kt, span, resid_frac):
    """Pass A: global floors over ALL shards (O(one shard) memory) so a
    subset load on one worker compiles the SAME program as every other."""
    from ..ops.banded_residual import split_banded_residual

    w_floor = span
    m_max = m_rev_max = 1
    m_b_max = m_io_max = 1
    eb_max = ei_max = 1
    overflow_tot = 0
    e_tot = 0
    for p in range(ep):
        z = np.load(out / f"shard_p{p}.npz")
        isrc = z["isrc"].astype(np.int64)
        idst = z["idst"].astype(np.int64)
        keep = split_banded_residual(isrc, idst, nbl, tile=tile, span=span)
        overflow_tot += len(isrc) - int(keep.sum())
        e_tot += len(isrc)
        io_d = idst[~keep]
        io_s = isrc[~keep]
        for s, d_ in ((isrc[keep], idst[keep]), (idst[keep], isrc[keep])):
            bo = np.arange(nbl, dtype=np.int64)
            if len(s):
                np.minimum.at(bo, d_ // tile, s // tile)
            base = np.minimum(bo, max(nbl - span, 0)).reshape(-1, k)
            spread = int((base.max(axis=1) - base.min(axis=1)).max()) if len(base) else 0
            w_floor = max(w_floor, spread + span)
        bdst = z["bdst"].astype(np.int64)
        m_max = max(m_max, len(np.unique(
            np.concatenate([bdst, io_d]) // kt)) + 1)
        m_rev_max = max(m_rev_max, len(np.unique(io_s // kt)) + 1)
        m_b_max = max(m_b_max, len(np.unique(bdst // kt)) + 1)
        m_io_max = max(m_io_max, len(np.unique(io_d // kt)) + 1)
        eb_max = max(eb_max, len(bdst))
        ei_max = max(ei_max, len(io_s))
        del z
    _check_overflow(overflow_tot, e_tot, span, resid_frac)
    return {"span": span, "w_floor": w_floor, "m_max": m_max,
            "m_rev_max": m_rev_max, "m_b_max": m_b_max,
            "m_io_max": m_io_max, "eb_max": eb_max, "ei_max": ei_max,
            "overflow_tot": overflow_tot, "e_tot": e_tot}


def _check_overflow(overflow_tot: int, e_tot: int, span: int,
                    resid_frac: float) -> None:
    if e_tot and overflow_tot / e_tot > 4 * resid_frac:
        raise ValueError(
            f"interior overflow fraction {overflow_tot / e_tot:.4f} at "
            f"span={span} exceeds {4 * resid_frac:.4f}: loosen span or "
            "reorder the input stream (StreamingHilbert)")


def _plan_fingerprint(out: Path) -> str:
    """Identity of the plan a fused cache was materialized against: the
    manifest's per-finalize ``build_id`` when present, else (plans built
    before build_id existed) a hash of the manifest text — finalize
    rewrites it with run-varying fields, so a rebuild changes it."""
    text = (out / "manifest.json").read_text()
    man = json.loads(text)
    if "build_id" in man:
        return man["build_id"]
    return hashlib.sha1(text.encode()).hexdigest()


def _fused_floors_cached(out: Path, span: int, resid_frac: float):
    """Floors from ``fused_manifest.json`` when materialize_fused_plan ran
    at this span AGAINST THIS PLAN BUILD; None -> caller recomputes (and
    rebuilds per shard). Re-validates the recorded interior-overflow
    fraction against the CALLER's resid_frac — a stricter bound than the
    one materialize used must reject the cache's layouts, not silently
    accept them."""
    fm_path = out / "fused_manifest.json"
    if not fm_path.exists():
        return None
    fm = json.loads(fm_path.read_text())
    if fm["span"] != span:
        return None
    if fm.get("plan_fingerprint") != _plan_fingerprint(out):
        return None
    if "overflow_tot" not in fm or "e_tot" not in fm:
        return None
    _check_overflow(fm["overflow_tot"], fm["e_tot"], span, resid_frac)
    fm["cached"] = True
    return fm


def _fused_shard_layouts(out: Path, p: int, *, span, w_floor, n_pad_local,
                         tile, k, h_max, steps, nbl):
    """Pass-B body for ONE shard: span-split banded interiors + compact
    residual maps (boundary rows remapped into the [ep*h_max] table)."""
    from ..ops.banded_residual import split_banded_residual
    from ..ops.spmm_banded import build_banded_counts
    from .halo_fused import _compact_shard

    z = np.load(out / f"shard_p{p}.npz")
    isrc = z["isrc"].astype(np.int64)
    idst = z["idst"].astype(np.int64)
    iw = z["iw"].astype(np.float32)
    keep = split_banded_residual(isrc, idst, nbl, tile=tile, span=span)
    s_k, d_k = isrc[keep], idst[keep]
    fwd = build_banded_counts(
        s_k, d_k, n_pad_local, tile=tile, k=k, max_span=span,
        s_span_min=span, wsz_min=w_floor)
    rev = build_banded_counts(
        d_k, s_k, n_pad_local, tile=tile, k=k, max_span=span,
        s_span_min=span, wsz_min=w_floor)
    bsrc_g, bdst, bw, bq = (z["bsrc_g"], z["bdst"].astype(np.int64),
                            z["bw"].astype(np.float32), z["bq"])
    hal_src = np.zeros(len(bsrc_g), np.int64)
    for q in np.unique(bq):
        ids = z[f"need_{int(q)}"]
        m = bq == q
        hal_src[m] = int(q) * h_max + np.searchsorted(ids, bsrc_g[m])
    t = _compact_shard(hal_src, bdst, bw,
                       (isrc[~keep], idst[~keep], iw[~keep]),
                       steps, k, tile)
    del z
    return fwd, rev, t


def materialize_fused_plan(out_dir: str | Path, *, span: int | None = None,
                           resid_frac: float = 0.01) -> dict:
    """One-time fused-layout cache next to a streamed plan: computes the
    pass-A global floors and every shard's span-split layouts ONCE and
    writes them to ``fused_int_{fwd,rev}_p*.npz`` (int4-packed via
    save_layout) + ``fused_bnd_p*.npz`` + ``fused_manifest.json``.
    Subsequent ``load_streamed_halo_fused_plan`` calls at the same span
    fast-load any shard subset with no O(E) rescan — multi-host worker
    startup drops from minutes (re-split + native refill of every local
    shard) to reading its own files. Returns the floors manifest."""
    from ..graph.layout_io import save_layout

    out = Path(out_dir)
    man = json.loads((out / "manifest.json").read_text())
    ep, tile, k = man["ep"], man["tile"], man["banded_k"]
    nbl = man["n_pad_local"] // tile
    span = man["s_common"] if span is None else int(span)
    # invalidate the cache FIRST: an interruption mid-materialize must
    # leave no manifest pairing old floors with a mix of old/new shard
    # files — the loader then falls back to the slow rebuild path
    (out / "fused_manifest.json").unlink(missing_ok=True)
    floors = _fused_floors(out, ep, nbl, tile, k, k * tile, span, resid_frac)
    floors["plan_fingerprint"] = _plan_fingerprint(out)
    for p in range(ep):
        fwd, rev, t = _fused_shard_layouts(
            out, p, span=span, w_floor=floors["w_floor"],
            n_pad_local=man["n_pad_local"], tile=tile, k=k,
            h_max=man["h_max"], steps=nbl // k, nbl=nbl)
        save_layout(out / f"fused_int_fwd_p{p}.npz", fwd)
        save_layout(out / f"fused_int_rev_p{p}.npz", rev)
        np.savez(out / f"fused_bnd_p{p}.npz", **t)
    (out / "fused_manifest.json").write_text(json.dumps(floors, indent=1))
    return floors


def load_streamed_halo_fused_plan(out_dir: str | Path, shards=None, *,
                                  span: int | None = None,
                                  resid_frac: float = 0.01):
    """Assemble a :class:`~sldm_gnn_tpu.parallel.halo_fused.HaloFusedPlan`
    from a streamed build — config-5 inputs feeding the FUSED multi-chip
    path. ``span=None`` uses the manifest's s_common (no interior
    overflow); a tighter ``span`` spills out-of-window interior edges into
    the fused kernels' compact residual (parallel/halo_fused.py).

    Pass A scans ALL shards (one at a time, O(one shard) memory) for the
    GLOBAL floors — common (s_span, wsz), compact-slot maxima, padded edge
    counts — so a ``shards=...`` subset load on one worker compiles the
    SAME program as every other worker. Pass B builds only the requested
    shards' layouts. When :func:`materialize_fused_plan` has cached the
    floors + per-shard layouts at this span, BOTH passes are skipped in
    favor of reading this subset's files (no O(E) rescan at startup)."""
    from ..ops.spmm_banded import BandedBlocks
    from .halo_fused import HaloFusedPlan, _stack_compact

    out = Path(out_dir)
    man = json.loads((out / "manifest.json").read_text())
    ep, n_local = man["ep"], man["n_local"]
    tile, k = man["tile"], man["banded_k"]
    n_pad_local = man["n_pad_local"]
    h_max = man["h_max"]
    nbl = n_pad_local // tile
    steps = nbl // k
    kt = k * tile
    span = man["s_common"] if span is None else int(span)
    inv = np.load(out / "inv_deg.npy")
    send_idx = np.load(out / "send_idx.npy")

    floors = _fused_floors_cached(out, span, resid_frac)
    if floors is None:
        floors = _fused_floors(out, ep, nbl, tile, k, kt, span, resid_frac)

    # ---- pass B: requested shards' layouts (cached on disk by
    # materialize_fused_plan, else built here)
    shards = list(range(ep)) if shards is None else list(shards)
    fwd_list, rev_list, per = [], [], []
    for p in shards:
        fp = out / f"fused_int_fwd_p{p}.npz"
        if floors.get("cached") and fp.exists():
            from ..graph.layout_io import load_layout

            fwd, rev = load_layout(fp), load_layout(
                out / f"fused_int_rev_p{p}.npz")
            zc = np.load(out / f"fused_bnd_p{p}.npz")
            t = {kk: (int(zc[kk]) if zc[kk].ndim == 0 else zc[kk])
                 for kk in zc.files}
        else:
            fwd, rev, t = _fused_shard_layouts(
                out, p, span=span, w_floor=floors["w_floor"],
                n_pad_local=n_pad_local, tile=tile, k=k, h_max=h_max,
                steps=steps, nbl=nbl)
        fwd_list.append(fwd)
        rev_list.append(rev)
        per.append(t)
    m_max, m_rev_max = floors["m_max"], floors["m_rev_max"]
    m_b_max, m_io_max = floors["m_b_max"], floors["m_io_max"]
    eb_max, ei_max = floors["eb_max"], floors["ei_max"]

    import jax

    def stack_banded(blocks, *, row: bool):
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
        scale = np.zeros((len(shards), n_pad_local, 1), np.float32)
        for i, p in enumerate(shards):
            scale[i, :n_local, 0] = inv[p * n_local: (p + 1) * n_local]
        return BandedBlocks(
            a=stacked.a, bo=stacked.bo, woff=stacked.woff, off=stacked.off,
            row_scale=scale if row else None,
            col_scale=None if row else scale,
            tile=tile, wsz=blocks[0].wsz, k=k,
        )

    return HaloFusedPlan(
        send_idx=send_idx,
        int_fwd=stack_banded(fwd_list, row=True),
        int_rev=stack_banded(rev_list, row=False),
        bnd=_stack_compact(per, kt, ep * h_max, m_min=m_max,
                           m_rev_min=m_rev_max, eb_min=eb_max,
                           ei_min=ei_max, m_b_min=m_b_max,
                           m_io_min=m_io_max),
        n_local=n_local,
        n_pad_local=n_pad_local,
    )
