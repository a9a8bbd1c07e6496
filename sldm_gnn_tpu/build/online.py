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
