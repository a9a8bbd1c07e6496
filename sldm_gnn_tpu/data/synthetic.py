"""Synthetic trajectory/map data generators.

Produce the reference's raw-data contract (SURVEY.md §1 L0) for tests,
benchmarks and demos: per-split ``packs.parquet`` / ``labels.parquet`` /
``vinfo.parquet`` plus a shared ``vmap.parquet`` of lane segments, and
synthetic scale-up graphs (configurable node/edge counts) for the SpMM
benchmarks (BASELINE configs 4-5).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def make_vehicle_split(
    outdir: Path | str,
    *,
    n_packs: int = 20,
    frames_num: int = 20,
    max_vehicles: int = 6,
    n_labels: int = 4,
    seed: int = 0,
    area: float = 100.0,
    drop_frame_frac: float = 0.2,
    positive_frac: float = 0.6,
) -> Path:
    """Write a packs/labels/vinfo parquet triplet of random trajectories."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    all_vids = [f"veh{k}" for k in range(max_vehicles * 4)]
    vinfo = pd.DataFrame(
        {
            "VehicleId": all_vids,
            "Width": rng.uniform(1.5, 2.5, len(all_vids)).astype(np.float32),
            "Length": rng.uniform(3.5, 6.0, len(all_vids)).astype(np.float32),
            "StationType": rng.integers(0, 8, len(all_vids)).astype(np.uint8),
        }
    )
    vinfo.to_parquet(outdir / "vinfo.parquet")

    rows = []
    labels = []
    for pid in range(n_packs):
        nv = int(rng.integers(1, max_vehicles + 1))
        vids = rng.choice(all_vids, nv, replace=False)
        mlb = int(rng.integers(1, 2**n_labels)) if rng.random() < positive_frac else 0
        labels.append({"PackId": pid, "MLBEncoded": mlb})
        for vid in vids:
            x0, y0 = rng.uniform(0, area, 2)
            heading = rng.uniform(0, 360)
            speed = rng.uniform(2, 20)
            frames = np.arange(frames_num)
            if drop_frame_frac > 0 and frames_num > 4:
                keep = rng.random(frames_num) > drop_frame_frac
                keep[rng.integers(0, frames_num)] = True  # at least one frame
                frames = frames[keep]
            for f in frames:
                rows.append(
                    {
                        "PackId": pid,
                        "VehicleId": vid,
                        "FrameId": int(f),
                        "X": x0 + speed * 0.1 * f * np.cos(np.deg2rad(heading)),
                        "Y": y0 + speed * 0.1 * f * np.sin(np.deg2rad(heading)),
                        "Speed": speed + rng.normal(0, 0.5),
                        "Angle": heading + rng.normal(0, 2.0),
                    }
                )
    pd.DataFrame(rows).astype(
        {"PackId": "uint32", "FrameId": "int64", "X": "float32", "Y": "float32",
         "Speed": "float32", "Angle": "float32"}
    ).to_parquet(outdir / "packs.parquet")
    pd.DataFrame(labels).astype({"PackId": "uint32", "MLBEncoded": "uint16"}).to_parquet(
        outdir / "labels.parquet"
    )
    return outdir


def make_map_parquet(path: Path | str, *, n_segments: int = 30, seed: int = 0) -> Path:
    """Write a random lane-segment vmap.parquet (grid-ish layout)."""
    rng = np.random.default_rng(seed)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for s in range(n_segments):
        sx, sy = rng.uniform(0, 100, 2)
        ang = rng.choice([0, 90, 180, 270]) + rng.normal(0, 5)
        length = rng.uniform(5, 20)
        rows.append(
            {
                "StartX": sx,
                "StartY": sy,
                "EndX": sx + length * np.cos(np.deg2rad(ang)),
                "EndY": sy + length * np.sin(np.deg2rad(ang)),
                "LaneType": int(rng.integers(0, 4)),
                "SpeedLimit": float(rng.choice([30, 50, 90, 130])),
                "Width": float(rng.uniform(2.5, 4.0)),
                "AllowLeft": bool(rng.integers(0, 2)),
                "AllowRight": bool(rng.integers(0, 2)),
            }
        )
    pd.DataFrame(rows).astype(
        {"StartX": "float32", "StartY": "float32", "EndX": "float32", "EndY": "float32",
         "LaneType": "uint8", "SpeedLimit": "float32", "Width": "float32"}
    ).to_parquet(path)
    return path


def make_dataset_tree(
    root: Path | str,
    *,
    n_packs: int = 20,
    frames_num: int = 20,
    max_vehicles: int = 6,
    n_map_segments: int = 30,
    seed: int = 0,
    splits: tuple[str, ...] = ("train", "eval", "test"),
) -> Path:
    """Full dataset directory tree (vmap.parquet + per-split triplets)."""
    root = Path(root)
    make_map_parquet(root / "vmap.parquet", n_segments=n_map_segments, seed=seed)
    for i, split in enumerate(splits):
        make_vehicle_split(
            root / split,
            n_packs=n_packs,
            frames_num=frames_num,
            max_vehicles=max_vehicles,
            seed=seed + 100 * (i + 1),
        )
    return root


def make_city_lane_map(
    n_segments: int,
    *,
    lanes_per_dir: int = 2,
    seg_len: float = 5.0,
    lane_width: float = 3.5,
    road_spacing: float = 250.0,
    seed: int = 0,
):
    """Synthetic grid-city lane map at benchmark scale, in FILE order.

    A square grid of vertical and horizontal multi-lane roads; every lane
    is chopped into ``seg_len``-metre segments emitted road-major (all
    vertical roads, then all horizontal) — the emission order of the
    reference builder (/root/reference/src/gbuilder.py:392-424 iterates
    segments as read), NOT a spatial order. Adjacent lanes sit
    ``lane_width`` apart so the MapBuilder's lateral rule (adjusted
    distance < 1.0 m with the width subtraction) connects them; opposite-
    direction lanes are offset further so only same-direction neighbors
    link laterally. Horizontal roads cross EVERY vertical road, so their
    forward/lateral edges are long-range in id space — the realistic
    stress case for the reordering + banded-residual pipeline.

    Returns ``(start, end, widths, allow_left, allow_right)`` float32/bool
    arrays of ~``n_segments`` rows (rounded to whole lanes).
    """
    rng = np.random.default_rng(seed)
    lanes_per_road = 2 * lanes_per_dir
    # grid sized so total segments ≈ n_segments: g roads each way, each
    # road length g*road_spacing → segs/road = lanes*g*spacing/seg_len;
    # total = 2g * that → g = sqrt(n*seg_len / (2*lanes*spacing))
    g = max(int(round((n_segments * seg_len / (2 * lanes_per_road * road_spacing)) ** 0.5)), 1)
    length = g * road_spacing
    per_lane = int(length / seg_len)

    starts, ends, widths, al, ar = [], [], [], [], []

    def emit_road(origin, axis):
        """One road from ``origin`` along ``axis`` (0=x, 1=y) with
        lanes_per_dir lanes each way, lane offsets across the road."""
        t = np.arange(per_lane, dtype=np.float64) * seg_len
        for direction in (1.0, -1.0):
            for lane in range(lanes_per_dir):
                # same-direction lanes adjacent; directions separated by
                # one extra width so lateral links stay within direction
                off = (lane + 0.75) * lane_width * (1 if direction > 0 else -1)
                s = np.zeros((per_lane, 2))
                e = np.zeros((per_lane, 2))
                tt = t if direction > 0 else length - t
                s[:, axis] = tt
                e[:, axis] = tt + direction * seg_len
                s[:, 1 - axis] = origin + off
                e[:, 1 - axis] = origin + off
                # ~1% missing segments: degree skew + band gaps
                keep = rng.random(per_lane) > 0.01
                starts.append(s[keep])
                ends.append(e[keep])
                n_k = int(keep.sum())
                widths.append(np.full(n_k, lane_width))
                # inner lanes allow both; outer lane only toward center
                al.append(np.full(n_k, lane > 0 or lanes_per_dir == 1))
                ar.append(np.full(n_k, lane < lanes_per_dir - 1))

    # per-road origin jitter: crossing endpoints land within the forward
    # rule's 2.0 m radius for a realistic fraction of intersections
    for i in range(g):  # vertical roads (along y)
        emit_road(origin=(i + 0.5) * road_spacing + rng.uniform(-2.5, 2.5), axis=1)
    for i in range(g):  # horizontal roads (along x)
        emit_road(origin=(i + 0.5) * road_spacing + rng.uniform(-2.5, 2.5), axis=0)

    start = np.concatenate(starts).astype(np.float32)
    end = np.concatenate(ends).astype(np.float32)
    return (start, end,
            np.concatenate(widths).astype(np.float32),
            np.concatenate(al).astype(bool),
            np.concatenate(ar).astype(bool))


def make_random_graph(
    num_nodes: int, num_edges: int, feat_dim: int, *, seed: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Synthetic scale-up graph for SpMM benchmarks: (x, edge_src, edge_dst).

    Edge endpoints are uniform random; sorting by destination yields the
    CSR-like layout the Pallas kernels consume.
    """
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((num_nodes, feat_dim)).astype(np.float32)
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    dst = np.sort(rng.integers(0, num_nodes, num_edges).astype(np.int32))
    return x, src, dst
