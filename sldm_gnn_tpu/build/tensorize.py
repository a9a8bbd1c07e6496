"""Pack tensorization + vectorized trajectory-edge construction.

Semantics parity with /root/reference/src/gbuilder.py:

  * zero-padding of missing frames with PresenceFlag=0 (``finalizepdf``,
    :481-514) — done here by dense scatter instead of per-row DataFrame
    concat;
  * angle deg→rad (:67), XY re-centering by vehicle length along heading
    (``rescaleToCenter``, :15-33) — applied to *all* frames including
    absent ones, exactly like the reference (absent frames end up at
    x=-len/2, y=0 before normalization);
  * O(V²)·O(F) trajectory-proximity edges: a directed edge (i, j) exists
    when the minimum distance over co-present frames is <= m_radius, with
    edge attributes [min, max, mean, mean-square] over co-present frames
    (:85-110). Emission order is i-major then j (the reference's double
    loop), reproduced by row-major ``argwhere``;
  * heading angle replaced by (sin, cos) channels (:114-118).

Everything is dense numpy (or the C++ kernel in native/ when available);
memory is bounded by chunking the V² pair space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TEMPORAL_COLS = ["X", "Y", "Speed", "Angle"]


def rescale_to_center(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Move XY from front-border center to box center using heading angle.

    x: [V, F, >=4] with channels (X, Y, Speed, AngleRad); lengths: [V].
    """
    out = x.copy()
    ang = x[:, :, 3]
    off = lengths[:, None] / 2.0
    out[:, :, 0] = x[:, :, 0] - off * np.cos(ang)
    out[:, :, 1] = x[:, :, 1] - off * np.sin(ang)
    return out


def tensorize_pack(
    pack_df: pd.DataFrame,
    vinfo_df: pd.DataFrame | None,
    frames_num: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert one pack's rows into dense per-vehicle arrays.

    ``pack_df`` columns: VehicleId, FrameId, X, Y, Speed, Angle — plus
    Width/Length/StationType either inline or joined from ``vinfo_df``.

    Returns (x [V, F, 6], xsttype [V] int32, xdims [V, 2]):
      x channels = X, Y, Speed, HeadingSin, HeadingCos, PresenceFlag.
    Vehicle order = sorted VehicleId (the reference's groupby/sort order).
    """
    df = pack_df
    if vinfo_df is not None and "StationType" not in df.columns:
        df = df.merge(vinfo_df, on="VehicleId", how="inner")

    vids = np.sort(df["VehicleId"].unique())
    vindex = {v: i for i, v in enumerate(vids)}
    V = len(vids)

    vi = df["VehicleId"].map(vindex).to_numpy()
    fi = df["FrameId"].to_numpy(dtype=np.int64)
    if (fi < 0).any() or (fi >= frames_num).any():
        raise ValueError(f"FrameId out of range [0, {frames_num})")

    temporal = np.zeros((V, frames_num, 4), dtype=np.float32)
    presence = np.zeros((V, frames_num), dtype=np.float32)
    for c, col in enumerate(TEMPORAL_COLS):
        temporal[vi, fi, c] = df[col].to_numpy(dtype=np.float32)
    presence[vi, fi] = 1.0

    # static features: first occurrence per vehicle
    first_rows = df.drop_duplicates("VehicleId").set_index("VehicleId").loc[vids]
    widths = first_rows["Width"].fillna(0.0).to_numpy(dtype=np.float32)
    lengths = first_rows["Length"].fillna(0.0).to_numpy(dtype=np.float32)
    sttype = first_rows["StationType"].to_numpy(dtype=np.int32)

    temporal[:, :, 3] = np.deg2rad(temporal[:, :, 3])
    temporal = rescale_to_center(temporal, lengths)

    hsin = np.sin(temporal[:, :, 3:4])
    hcos = np.cos(temporal[:, :, 3:4])
    x = np.concatenate([temporal[:, :, :3], hsin, hcos, presence[:, :, None]], axis=2)
    xdims = np.stack([widths, lengths], axis=1)
    return x.astype(np.float32), sttype, xdims.astype(np.float32)


def build_trajectory_edges(
    x: np.ndarray, m_radius: float, *, chunk: int = 128, allow_native: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized trajectory-proximity edges.

    x: [V, F, 6] tensorized features (XY channels 0:2, presence channel 5).
    Returns (edge_index [2, E] int32, edge_attr [E, 4] float32) in the
    reference's i-major emission order. Uses the C++ OpenMP kernel
    (native/libgraphbuild.so) when built, numpy otherwise.
    """
    if allow_native:
        from .native import native_trajectory_edges

        out = native_trajectory_edges(np.ascontiguousarray(x, np.float32), m_radius)
        if out is not None:
            return out
    V, F, _ = x.shape
    if V == 0:
        return np.zeros((2, 0), np.int32), np.zeros((0, 4), np.float32)
    xy = x[:, :, :2].astype(np.float32)
    present = x[:, :, 5] > 0.5

    srcs, dsts, attrs = [], [], []
    for i0 in range(0, V, chunk):
        i1 = min(i0 + chunk, V)
        diff = xy[i0:i1, None, :, :] - xy[None, :, :, :]  # [c, V, F, 2]
        d = np.sqrt(np.sum(diff * diff, axis=-1))  # [c, V, F]
        co = present[i0:i1, None, :] & present[None, :, :]  # [c, V, F]
        cnt = co.sum(axis=-1)  # [c, V]

        big = np.float32(np.inf)
        dmin = np.where(co, d, big).min(axis=-1)
        valid = (cnt > 0) & (dmin <= m_radius)
        ii = np.arange(i0, i1)[:, None]
        jj = np.arange(V)[None, :]
        valid &= ii != jj

        if not valid.any():
            continue
        dmax = np.where(co, d, -big).max(axis=-1)
        dsum = np.where(co, d, 0.0).sum(axis=-1)
        d2sum = np.where(co, d * d, 0.0).sum(axis=-1)
        cntf = np.maximum(cnt, 1).astype(np.float32)
        dmean = dsum / cntf
        dmsq = d2sum / cntf

        loc = np.argwhere(valid)  # row-major: i-major then j — reference order
        srcs.append(loc[:, 0] + i0)
        dsts.append(loc[:, 1])
        attrs.append(
            np.stack(
                [dmin[loc[:, 0], loc[:, 1]], dmax[loc[:, 0], loc[:, 1]],
                 dmean[loc[:, 0], loc[:, 1]], dmsq[loc[:, 0], loc[:, 1]]],
                axis=1,
            )
        )

    if not srcs:
        return np.zeros((2, 0), np.int32), np.zeros((0, 4), np.float32)
    edge_index = np.stack([np.concatenate(srcs), np.concatenate(dsts)]).astype(np.int32)
    edge_attr = np.concatenate(attrs).astype(np.float32)
    return edge_index, edge_attr
