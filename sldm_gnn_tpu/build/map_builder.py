"""Vectorized lane-segment map graph construction.

Semantics parity with /root/reference/src/gbuilder.py:303-430 (MapBuilder):

  * per-segment angle = atan2(end-start) (:314-320) and centroid;
  * directed edge rules per ordered pair (i, j), i-major order (:392-424):
      - if |ang_i - ang_j| < lat_conn_max_angle (raw atan2 difference, no
        wrapping — reference behavior): a LATERAL edge iff the adjusted
        segment distance < lat_conn_proximity_threshold AND the lanes are
        directionally compatible ((AllowRight_i & AllowLeft_j) or
        (AllowLeft_i & AllowRight_j));
      - **elif** ||end_i - start_j|| < 2.0: a FORWARD edge. Note the elif:
        pairs that pass the angle test but fail the lateral checks get *no*
        forward edge — reproduced exactly;
  * adjusted segment distance (:322-355): clamped projection of the
    *shorter* segment's centroid onto the *longer* segment (swap iff
    len_j > len_i), minus (width_i + width_j)/2.

The O(S²) double loop becomes chunked dense array ops.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

FLOAT_COLS = ["StartX", "StartY", "EndX", "EndY", "SpeedLimit", "Width"]
BOOL_COLS = ["AllowLeft", "AllowRight"]


def segment_angles(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    return np.arctan2(end[:, 1] - start[:, 1], end[:, 0] - start[:, 0])


def build_map_edges(
    start: np.ndarray,
    end: np.ndarray,
    widths: np.ndarray,
    allow_left: np.ndarray,
    allow_right: np.ndarray,
    *,
    lat_conn_max_angle_deg: float = 30.0,
    lat_conn_proximity_threshold: float = 1.0,
    fwd_dist_threshold: float = 2.0,
    chunk: int = 512,
    allow_native: bool = True,
) -> np.ndarray:
    """Return [2, E] int64 directed edges in i-major emission order.
    Uses the C++ OpenMP kernel when built, numpy otherwise."""
    if allow_native:
        from .native import native_map_edges

        out = native_map_edges(
            start, end, widths, allow_left, allow_right,
            lat_conn_max_angle_deg=lat_conn_max_angle_deg,
            lat_conn_proximity_threshold=lat_conn_proximity_threshold,
            fwd_dist_threshold=fwd_dist_threshold,
        )
        if out is not None:
            return out
    S = start.shape[0]
    ang = segment_angles(start, end)
    cent = (start + end) / 2.0
    seglen = np.linalg.norm(end - start, axis=1)
    max_angle_rad = np.deg2rad(lat_conn_max_angle_deg)

    srcs, dsts = [], []
    for i0 in range(0, S, chunk):
        i1 = min(i0 + chunk, S)
        c = i1 - i0
        delta = np.abs(ang[i0:i1, None] - ang[None, :])  # [c, S]
        lat_cand = delta < max_angle_rad

        fwd = np.linalg.norm(end[i0:i1, None, :] - start[None, :, :], axis=2)
        fwd_edge = (~lat_cand) & (fwd < fwd_dist_threshold)

        # adjusted segment distance for lateral candidates
        swap = seglen[None, :] > seglen[i0:i1, None]  # [c, S]: j is longer
        A = np.where(swap[..., None], start[None, :, :], start[i0:i1, None, :])
        B = np.where(swap[..., None], end[None, :, :], end[i0:i1, None, :])
        C = np.where(swap[..., None], cent[i0:i1, None, :], cent[None, :, :])
        AB = B - A
        AC = C - A
        denom = np.sum(AB * AB, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.sum(AC * AB, axis=-1) / denom
        t = np.clip(t, 0.0, 1.0)
        P = A + t[..., None] * AB
        raw = np.linalg.norm(C - P, axis=-1)
        adj = raw - (widths[i0:i1, None] + widths[None, :]) / 2.0

        compat = (allow_right[i0:i1, None] & allow_left[None, :]) | (
            allow_left[i0:i1, None] & allow_right[None, :]
        )
        lat_edge = lat_cand & (adj < lat_conn_proximity_threshold) & compat

        valid = lat_edge | fwd_edge
        ii = np.arange(i0, i1)[:, None]
        valid &= ii != np.arange(S)[None, :]

        loc = np.argwhere(valid)
        srcs.append(loc[:, 0] + i0)
        dsts.append(loc[:, 1])

    if not srcs:
        return np.zeros((2, 0), np.int64)
    return np.stack([np.concatenate(srcs), np.concatenate(dsts)]).astype(np.int64)


class MapBuilder:
    """Build + save the map graph tensors from a lane-segment parquet.

    Output (``.map/<stem>.npz``) fields mirror the reference's vmap.pth dict
    (gbuilder.py:430): float_features [S, 6] (explicit column order
    StartX, StartY, EndX, EndY, SpeedLimit, Width), bool_features [S, 2],
    lane_type_cats [S], mseg_centroids [S, 2], mgraph_edge_indexes [2, E].
    """

    def __init__(
        self,
        filepath: Path | str,
        lat_conn_max_angle_deg: float = 30.0,
        lat_conn_proximity_threshold: float = 1.0,
    ):
        self.filepath = Path(filepath).resolve()
        self.lat_conn_max_angle_deg = lat_conn_max_angle_deg
        self.lat_conn_proximity_threshold = lat_conn_proximity_threshold
        savedir = self.filepath.parent / ".map"
        savedir.mkdir(parents=True, exist_ok=True)
        self.savepath = savedir / (self.filepath.stem + ".npz")

    def build(self, df: pd.DataFrame | None = None) -> dict[str, np.ndarray]:
        if df is None:
            df = pd.read_parquet(self.filepath)
        float_features = df[FLOAT_COLS].to_numpy(dtype=np.float32)
        bool_features = df[BOOL_COLS].to_numpy(dtype=bool)
        lane_type_cats = df["LaneType"].to_numpy(dtype=np.int64)

        start = float_features[:, 0:2]
        end = float_features[:, 2:4]
        widths = float_features[:, 5]
        centroids = (start + end) / 2.0

        edges = build_map_edges(
            start,
            end,
            widths,
            bool_features[:, 0],
            bool_features[:, 1],
            lat_conn_max_angle_deg=self.lat_conn_max_angle_deg,
            lat_conn_proximity_threshold=self.lat_conn_proximity_threshold,
        )
        return {
            "float_features": float_features,
            "bool_features": bool_features,
            "lane_type_cats": lane_type_cats,
            "mseg_centroids": centroids.astype(np.float32),
            "mgraph_edge_indexes": edges,
        }

    def save(self, df: pd.DataFrame | None = None) -> Path:
        tensors = self.build(df)
        np.savez(self.savepath, **tensors)
        return self.savepath


def load_map_data(path: Path | str):
    """Load saved map tensors into a model-ready :class:`MapData`:
    z-scored float features (MapZscoreNorm semantics) concatenated with the
    bool features cast to float (reference: grusage.py:82-83 +
    mapencoder.py:9)."""
    import jax.numpy as jnp

    from ..models.map_modules import MapData, map_zscore_norm

    z = np.load(Path(path))
    feats_f = jnp.asarray(z["float_features"], dtype=jnp.float32)
    feats = jnp.concatenate(
        [map_zscore_norm(feats_f), jnp.asarray(z["bool_features"]).astype(jnp.float32)], axis=1
    )
    return MapData(
        feats=feats,
        lane_type_cats=jnp.asarray(z["lane_type_cats"], dtype=jnp.int32),
        edge_src=jnp.asarray(z["mgraph_edge_indexes"][0], dtype=jnp.int32),
        edge_dst=jnp.asarray(z["mgraph_edge_indexes"][1], dtype=jnp.int32),
        centroids=jnp.asarray(z["mseg_centroids"], dtype=jnp.float32),
    )
