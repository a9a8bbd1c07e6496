"""Online (streaming) graph construction for serving.

Parity: /root/reference/src/gbuilder.py:148-301 ``GraphOnlineCreator`` —
same featurization + edge logic as the batch path, single-call per sliding
window, optional label, optional inline z-score normalization with the
training stats carried in the snapshot, and a ``pos_raw`` copy saved before
normalization.

Note: the reference's online path sorts rows (FrameId, VehicleId) and then
reshapes to [V, F, feat] (gbuilder.py:208,220) — a frame-major/vehicle-major
mismatch that scrambles features whenever more than one vehicle is present.
This implementation uses the batch path's correct vehicle-major
tensorization (the contract the trained model actually saw), so multi-vehicle
streaming windows are featurized consistently with training.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..graph.containers import GraphArrays
from ..labels import ALL_LABELS, decode_bitmask
from .tensorize import build_trajectory_edges, tensorize_pack


class GraphOnlineCreator:
    def __init__(
        self,
        frames_num: int,
        m_radius: float,
        active_labels: list[int] | None = None,
        *,
        has_label: bool = False,
        norm_stats: dict | None = None,
    ):
        self.frames_num = frames_num
        self.m_radius = m_radius
        self.active_labels = active_labels if active_labels is not None else list(ALL_LABELS)
        self.has_label = has_label
        self.norm_stats = None
        if norm_stats is not None:
            for stat in ("mu", "sigma"):
                if stat not in norm_stats:
                    raise ValueError(f"norm_stats missing '{stat}'")
                for key in ("x", "xdims"):
                    if key not in norm_stats[stat]:
                        raise ValueError(f"norm_stats['{stat}'] missing '{key}'")
            self.norm_stats = {
                s: {k: np.asarray(norm_stats[s][k]) for k in ("x", "xdims")}
                for s in ("mu", "sigma")
            }

    def __call__(self, pack_df: pd.DataFrame, mlb: int | None = None) -> GraphArrays:
        if self.has_label and mlb is None:
            raise ValueError("configured to expect labels but mlb is None")

        if pack_df.empty:
            empty = GraphArrays(
                x=np.zeros((0, self.frames_num, 6), np.float32),
                xsttype=np.zeros((0,), np.int32),
                xdims=np.zeros((0, 2), np.float32),
                edge_index=np.zeros((2, 0), np.int32),
                edge_attr=np.zeros((0, 4), np.float32),
                y=None,
                pos_raw=np.zeros((0, self.frames_num, 2), np.float32),
            )
            return empty

        x, xsttype, xdims = tensorize_pack(pack_df, None, self.frames_num)
        edge_index, edge_attr = build_trajectory_edges(x, self.m_radius)

        y = None
        if mlb is not None:
            y = np.array(decode_bitmask(mlb, self.active_labels), dtype=np.float32)

        pos_raw = x[:, :, :2].copy()
        if self.norm_stats is not None:
            mu, sg = self.norm_stats["mu"], self.norm_stats["sigma"]
            x = x.copy()
            x[:, :, :-1] = (x[:, :, :-1] - mu["x"]) / sg["x"]
            xdims = (xdims - mu["xdims"]) / sg["xdims"]

        return GraphArrays(
            x=x.astype(np.float32),
            xsttype=xsttype,
            xdims=xdims.astype(np.float32),
            edge_index=edge_index,
            edge_attr=edge_attr,
            y=y,
            pos_raw=pos_raw,
        )


class IncrementalGraphOnlineCreator:
    """Stride-1 sliding-window graph construction in O(V²) per frame.

    The plain :class:`GraphOnlineCreator` recomputes the full O(V²·F)
    pairwise-trajectory problem per window; under a stride-1 stream
    (serve/stream.py, reference rcv.py:89-91) consecutive windows share
    F-1 frames. This creator maintains ring buffers + decremental pair
    statistics so each ``push`` costs:

      * O(V) featurization of the one incoming frame,
      * O(V²) pairwise distances of the one incoming frame,
      * O(V²) add/subtract of the mean/mean-square/count accumulators,
      * O(V²·F) *memory-bound masked min/max reduction* over precomputed
        ring distances at emit (no sqrt/diff recompute — the compute-heavy
        part of the full rebuild).

    Accumulators run in float64 and are refreshed from the ring every F
    pushes, so subtract-on-evict rounding can never drift. Emitted graphs
    match :class:`GraphOnlineCreator` exactly (tests) under the data
    contract that Width/Length/StationType are static per vehicle — true
    of the reference, whose static features come from the per-vehicle
    ``vinfo`` table (/root/reference/src/gbuilder.py:476).
    """

    _ABSENT = None  # placeholder; absent-frame features depend on length

    def __init__(
        self,
        frames_num: int,
        m_radius: float,
        active_labels: list[int] | None = None,
        *,
        norm_stats: dict | None = None,
        capacity: int = 32,
    ):
        # reuse the full creator for validation + as the emit fallback pieces
        self._proto = GraphOnlineCreator(
            frames_num, m_radius, active_labels, norm_stats=norm_stats
        )
        self.frames_num = frames_num
        self.m_radius = m_radius
        self._cap = max(capacity, 4)
        self._alloc(self._cap)
        self._vid2slot: dict = {}
        self._free: list[int] = list(range(self._cap))[::-1]
        self._head = 0  # ring position of the OLDEST frame
        self._n_frames = 0  # frames currently in the window (<= frames_num)
        self._pushes_since_refresh = 0

    # ------------------------------------------------------------ storage

    def _alloc(self, cap: int):
        F = self.frames_num
        self._x = np.zeros((cap, F, 6), np.float32)  # transformed features, ring on axis 1
        self._x[:, :, 4] = 1.0  # absent frames: hcos = cos(0) = 1
        self._present = np.zeros((cap, F), bool)
        self._d = np.zeros((F, cap, cap), np.float32)  # per-frame pair distances
        self._dsum = np.zeros((cap, cap), np.float64)
        self._d2sum = np.zeros((cap, cap), np.float64)
        self._cnt = np.zeros((cap, cap), np.int64)
        # lazy sliding-window min/max: value + the ring position attaining
        # it; a pair is recomputed from the ring only when the attaining
        # frame is evicted (amortized O(V²)/stride instead of O(V²·F)/emit)
        self._dmin = np.full((cap, cap), np.inf, np.float32)
        self._dmin_pos = np.full((cap, cap), -1, np.int32)
        self._dmax = np.full((cap, cap), -np.inf, np.float32)
        self._dmax_pos = np.full((cap, cap), -1, np.int32)
        self._vids: list = [None] * cap  # VehicleIds may be any sortable type
        self._wl = np.zeros((cap, 2), np.float32)  # width, length
        self._stt = np.zeros(cap, np.int32)

    def _grow(self):
        old_cap = self._cap
        cap = old_cap * 2
        x, present, d = self._x, self._present, self._d
        dsum, d2sum, cnt = self._dsum, self._d2sum, self._cnt
        dmin, dmin_pos, dmax, dmax_pos = self._dmin, self._dmin_pos, self._dmax, self._dmax_pos
        vids, wl, stt = self._vids, self._wl, self._stt
        self._alloc(cap)
        self._x[:old_cap] = x
        self._present[:old_cap] = present
        self._d[:, :old_cap, :old_cap] = d
        self._dsum[:old_cap, :old_cap] = dsum
        self._d2sum[:old_cap, :old_cap] = d2sum
        self._cnt[:old_cap, :old_cap] = cnt
        self._dmin[:old_cap, :old_cap] = dmin
        self._dmin_pos[:old_cap, :old_cap] = dmin_pos
        self._dmax[:old_cap, :old_cap] = dmax
        self._dmax_pos[:old_cap, :old_cap] = dmax_pos
        self._vids[:old_cap] = vids[:old_cap]
        self._wl[:old_cap] = wl
        self._stt[:old_cap] = stt
        self._free.extend(range(cap - 1, old_cap - 1, -1))
        self._cap = cap

    def _slot_for(self, vid, width, length, sttype) -> int:
        s = self._vid2slot.get(vid)
        if s is not None:
            return s
        if not self._free:
            self._grow()
        s = self._free.pop()
        self._vid2slot[vid] = s
        self._vids[s] = vid
        self._wl[s] = (width, length)
        self._stt[s] = sttype
        # absent-frame features for this vehicle: rescaled origin at angle 0
        self._x[s] = 0.0
        self._x[s, :, 0] = -length / 2.0
        self._x[s, :, 4] = 1.0
        self._present[s] = False
        self._d[:, s, :] = 0.0
        self._d[:, :, s] = 0.0
        self._dsum[s, :] = self._dsum[:, s] = 0.0
        self._d2sum[s, :] = self._d2sum[:, s] = 0.0
        self._cnt[s, :] = self._cnt[:, s] = 0
        self._dmin[s, :] = self._dmin[:, s] = np.inf
        self._dmin_pos[s, :] = self._dmin_pos[:, s] = -1
        self._dmax[s, :] = self._dmax[:, s] = -np.inf
        self._dmax_pos[s, :] = self._dmax_pos[:, s] = -1
        return s

    # ------------------------------------------------------------- update

    def push(self, frame_df: pd.DataFrame):
        """Ingest one frame (rows: VehicleId, X, Y, Speed, Angle, Width,
        Length, StationType). Evicts the oldest frame once the window is
        full. Call :meth:`window` to emit the current graph.

        Thin pandas wrapper over :meth:`push_arrays` — the column
        extraction here costs ~0.8 ms/push in pandas accessor overhead
        at V=32 (profiled), so latency-sensitive receivers that already
        hold columnar data should call :meth:`push_arrays` directly."""
        if len(frame_df):
            self.push_arrays(
                frame_df["VehicleId"].to_numpy(),
                frame_df["X"].to_numpy(np.float32),
                frame_df["Y"].to_numpy(np.float32),
                frame_df["Speed"].to_numpy(np.float32),
                frame_df["Angle"].to_numpy(np.float32),
                frame_df["Width"].fillna(0.0).to_numpy(np.float32),
                frame_df["Length"].fillna(0.0).to_numpy(np.float32),
                frame_df["StationType"].to_numpy(np.int32),
            )
        else:
            self.push_arrays(np.empty(0, np.int64), *(np.empty(0, np.float32),) * 6,
                             np.empty(0, np.int32))

    def push_arrays(self, vid, x, y, speed, angle, width, length, sttype):
        """Array-native :meth:`push` (no pandas): one entry per vehicle
        present in the frame. NaN width/length must already be 0.0 (the
        wrapper's fillna contract — NaN would poison the pair distances).

        The numerical core (evict + lazy min/max + ring write + pair
        distances) runs as ONE native call when libgraphbuild.so is
        built (native/graphbuild.cpp incr_push — the numpy path below is
        dispatch-bound at serving sizes, ~0.33 vs ~0.03 ms at V=32);
        slot resolution, ring bookkeeping, and the periodic refresh stay
        here either way."""
        from .native import native_incr_push

        F = self.frames_num
        pos = self._head if self._n_frames >= F else (self._head + self._n_frames) % F
        evict = self._n_frames >= F

        # slot resolution first (it may _grow() — the native call must see
        # the final arrays); safe before eviction: freeing only happens in
        # the end-of-push sweep, and a fresh slot's state resets are
        # idempotent with the eviction maintenance (its cnt rows are 0)
        if len(vid):
            slots = np.array(
                [self._slot_for(v, width[i], length[i], sttype[i])
                 for i, v in enumerate(vid)],
                np.int64,
            )
            ang = np.deg2rad(np.asarray(angle, np.float32))
            slen = self._wl[slots, 1]
            cos_a = np.cos(ang)
            sin_a = np.sin(ang)
            px = np.asarray(x, np.float32) - slen / 2.0 * cos_a
            py = np.asarray(y, np.float32) - slen / 2.0 * sin_a
            spd = np.asarray(speed, np.float32)
        else:
            slots = np.empty(0, np.int64)
            px = py = spd = sin_a = cos_a = np.empty(0, np.float32)

        if native_incr_push(self, pos, evict, slots, px, py, spd, sin_a, cos_a):
            if evict:
                self._head = (self._head + 1) % F
            else:
                self._n_frames += 1
            self._finish_push()
            return

        if self._n_frames >= F:
            # evict the oldest frame's contribution from the accumulators
            co_old = np.outer(self._present[:, pos], self._present[:, pos])
            d_old = self._d[pos]
            self._dsum -= d_old * co_old
            self._d2sum -= d_old * d_old * co_old
            self._cnt -= co_old
            self._present[:, pos] = False
            self._head = (self._head + 1) % F
            # lazy min/max maintenance: pairs left without co-present frames
            # reset; pairs whose extremum lived in the evicted frame recompute
            empty = self._cnt == 0
            self._dmin[empty] = np.inf
            self._dmin_pos[empty] = -1
            self._dmax[empty] = -np.inf
            self._dmax_pos[empty] = -1
            stale = ((self._dmin_pos == pos) | (self._dmax_pos == pos)) & ~empty
            if stale.any():
                ii, jj = np.nonzero(stale)
                dcols = self._d[:, ii, jj]  # [F, n]
                co = (self._present[ii] & self._present[jj]).T  # [F, n]
                ar = np.arange(len(ii))
                dm = np.where(co, dcols, np.inf)
                k = np.argmin(dm, axis=0)
                self._dmin[ii, jj] = dm[k, ar]
                self._dmin_pos[ii, jj] = k
                dM = np.where(co, dcols, -np.inf)
                k = np.argmax(dM, axis=0)
                self._dmax[ii, jj] = dM[k, ar]
                self._dmax_pos[ii, jj] = k
        else:
            self._n_frames += 1

        # clear the ring column, then write the incoming frame
        self._x[:, pos, :] = 0.0
        self._x[:, pos, 0] = -self._wl[:, 1] / 2.0
        self._x[:, pos, 4] = 1.0

        if len(vid):
            # NaN dims -> 0.0 like the batch path (tensorize.py fillna):
            # the wrapper's fillna contract; slots/features were resolved
            # above, shared with the native path
            self._x[slots, pos, 0] = px
            self._x[slots, pos, 1] = py
            self._x[slots, pos, 2] = spd
            self._x[slots, pos, 3] = sin_a
            self._x[slots, pos, 4] = cos_a
            self._x[slots, pos, 5] = 1.0
            self._present[slots, pos] = True

        # pairwise distances of the incoming frame (over ALL slots; masked
        # by the presence outer product in the accumulators)
        xy = self._x[:, pos, :2]
        diff = xy[:, None, :] - xy[None, :, :]
        d_new = np.sqrt(np.sum(diff * diff, axis=-1), dtype=np.float32)
        self._d[pos] = d_new
        co_new = np.outer(self._present[:, pos], self._present[:, pos])
        self._dsum += d_new.astype(np.float64) * co_new
        self._d2sum += d_new.astype(np.float64) * d_new * co_new
        self._cnt += co_new
        upd = co_new & (d_new < self._dmin)
        self._dmin[upd] = d_new[upd]
        self._dmin_pos[upd] = pos
        upd = co_new & (d_new > self._dmax)
        self._dmax[upd] = d_new[upd]
        self._dmax_pos[upd] = pos

        self._finish_push()

    def _finish_push(self):
        # free slots whose vehicles have left the window entirely
        alive = self._present.any(axis=1)
        for vid, s in list(self._vid2slot.items()):
            if not alive[s]:
                del self._vid2slot[vid]
                self._free.append(s)

        # periodic exact refresh: kills float64 subtract-on-evict drift
        self._pushes_since_refresh += 1
        if self._pushes_since_refresh >= self.frames_num:
            self._refresh_accumulators()
            self._pushes_since_refresh = 0

    def _refresh_accumulators(self):
        """Exact rebuild of the float64 sum/count accumulators (the only
        state with subtract-on-evict drift; the min/max trackers are exact
        by construction). Restricted to live slots — dead slots are zeroed
        on (re)allocation."""
        live = sorted(self._vid2slot.values())
        if not live:
            return
        sl = np.asarray(live, np.int64)
        ix3 = np.ix_(np.arange(self.frames_num), sl, sl)
        d = self._d[ix3]  # [F, L, L]
        pr = self._present[sl]  # [L, F]
        co = pr.T[:, :, None] & pr.T[:, None, :]
        ix2 = np.ix_(sl, sl)
        self._dsum[ix2] = np.sum(d * co, axis=0, dtype=np.float64)
        self._d2sum[ix2] = np.sum(d.astype(np.float64) ** 2 * co, axis=0)
        self._cnt[ix2] = co.sum(axis=0, dtype=np.int64)

    # --------------------------------------------------------------- emit

    @property
    def warm(self) -> bool:
        return self._n_frames >= self.frames_num

    def window(self, mlb: int | None = None) -> GraphArrays:
        """Emit the current window's graph (same contract as
        :class:`GraphOnlineCreator`.__call__)."""
        F = self.frames_num
        slots = sorted(self._vid2slot.items())  # sorted by VehicleId
        if not slots:
            return self._proto(pd.DataFrame(), mlb)
        sl = np.array([s for _, s in slots], np.int64)
        V = len(sl)

        # temporal re-order: ring position head..head+F-1 -> window 0..F-1
        order = (self._head + np.arange(F)) % F
        x = self._x[np.ix_(sl, order)]  # [V, F, 6]

        # pair stats restricted to live slots: the native edge emission
        # (one C call) when built, else O(V²) gathers of the trackers
        from .native import native_incr_window_edges

        ee = native_incr_window_edges(self, sl)
        if ee is not None:
            edge_index, edge_attr = ee
        else:
            pair_ix = np.ix_(sl, sl)
            dmin = self._dmin[pair_ix]
            cnt = self._cnt[pair_ix]
            valid = (cnt > 0) & (dmin <= self.m_radius)
            np.fill_diagonal(valid, False)

            loc = np.argwhere(valid)  # i-major order, matching the reference
            if len(loc):
                dmax = self._dmax[pair_ix]
                cntf = np.maximum(cnt, 1).astype(np.float64)
                dmean = (self._dsum[pair_ix] / cntf).astype(np.float32)
                dmsq = (self._d2sum[pair_ix] / cntf).astype(np.float32)
                ii, jj = loc[:, 0], loc[:, 1]
                edge_index = np.stack([ii, jj]).astype(np.int32)
                edge_attr = np.stack(
                    [dmin[ii, jj], dmax[ii, jj], dmean[ii, jj], dmsq[ii, jj]], axis=1
                ).astype(np.float32)
            else:
                edge_index = np.zeros((2, 0), np.int32)
                edge_attr = np.zeros((0, 4), np.float32)

        y = None
        if mlb is not None:
            y = np.array(decode_bitmask(mlb, self._proto.active_labels), dtype=np.float32)

        xdims = self._wl[sl].copy()
        pos_raw = x[:, :, :2].copy()
        ns = self._proto.norm_stats
        if ns is not None:
            x = x.copy()
            x[:, :, :-1] = (x[:, :, :-1] - ns["mu"]["x"]) / ns["sigma"]["x"]
            xdims = (xdims - ns["mu"]["xdims"]) / ns["sigma"]["xdims"]

        return GraphArrays(
            x=x.astype(np.float32),
            xsttype=self._stt[sl].copy(),
            xdims=xdims.astype(np.float32),
            edge_index=edge_index,
            edge_attr=edge_attr,
            y=y,
            pos_raw=pos_raw,
        )
