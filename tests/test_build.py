"""Graph/map construction parity: vectorized builders vs naive loops that
restate the reference's documented semantics (gbuilder.py edge rules)."""

import numpy as np
import pandas as pd
import pytest

from sldm_gnn_tpu.build.tensorize import (
    tensorize_pack,
    build_trajectory_edges,
    rescale_to_center,
)
from sldm_gnn_tpu.build.map_builder import MapBuilder, build_map_edges, load_map_data
from sldm_gnn_tpu.build.vehicle import GraphsBuilder
from sldm_gnn_tpu.build.online import GraphOnlineCreator
from sldm_gnn_tpu.data.synthetic import make_vehicle_split, make_map_parquet
from sldm_gnn_tpu.utils.metadata import MetaData


def naive_trajectory_edges(x, m_radius):
    """Reference double-loop edge semantics (gbuilder.py:85-110), naive."""
    V = x.shape[0]
    ei, ea = [], []
    for i in range(V):
        for j in range(V):
            if i == j:
                continue
            d = np.linalg.norm(x[i, :, :2] - x[j, :, :2], axis=1)
            m = (x[i, :, 5] > 0.5) & (x[j, :, 5] > 0.5)
            d = d[m]
            if d.size and d.min() <= m_radius:
                ei.append([i, j])
                ea.append([d.min(), d.max(), d.mean(), (d**2).mean()])
    if not ei:
        return np.zeros((2, 0), np.int32), np.zeros((0, 4), np.float32)
    return np.array(ei).T.astype(np.int32), np.array(ea, np.float32)


def test_trajectory_edges_match_naive(rng):
    V, F = 17, 12
    x = np.zeros((V, F, 6), np.float32)
    x[:, :, :2] = rng.uniform(0, 60, (V, F, 2))
    x[:, :, 5] = (rng.random((V, F)) > 0.3).astype(np.float32)
    ei_v, ea_v = build_trajectory_edges(x, 25.0, chunk=5)
    ei_n, ea_n = naive_trajectory_edges(x, 25.0)
    np.testing.assert_array_equal(ei_v, ei_n)
    np.testing.assert_allclose(ea_v, ea_n, rtol=1e-5, atol=1e-5)


def test_rescale_to_center():
    x = np.zeros((1, 2, 4), np.float32)
    x[0, :, 0] = 10.0  # X
    x[0, :, 1] = 5.0  # Y
    x[0, 0, 3] = 0.0  # angle 0 -> offset along -x
    x[0, 1, 3] = np.pi / 2  # angle 90deg -> offset along -y
    out = rescale_to_center(x, np.array([4.0], np.float32))
    np.testing.assert_allclose(out[0, 0, :2], [8.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1, :2], [10.0, 3.0], atol=1e-6)


def test_tensorize_zero_pads_missing_frames():
    pack = pd.DataFrame(
        {
            "VehicleId": ["a", "a", "b"],
            "FrameId": [0, 2, 1],
            "X": [1.0, 2.0, 3.0],
            "Y": [0.0, 0.0, 0.0],
            "Speed": [5.0, 5.0, 7.0],
            "Angle": [0.0, 0.0, 0.0],
        }
    )
    vinfo = pd.DataFrame(
        {
            "VehicleId": ["a", "b"],
            "Width": [2.0, 2.0],
            "Length": [4.0, 6.0],
            "StationType": [1, 2],
        }
    )
    x, stt, xdims = tensorize_pack(pack, vinfo, frames_num=4)
    assert x.shape == (2, 4, 6)
    # vehicle 'a' present frames 0,2; absent 1,3
    np.testing.assert_array_equal(x[0, :, 5], [1, 0, 1, 0])
    np.testing.assert_array_equal(x[1, :, 5], [0, 1, 0, 0])
    # absent frames: zero features re-centered by -len/2 at angle 0
    np.testing.assert_allclose(x[0, 1, 0], -2.0, atol=1e-6)  # -len_a/2
    np.testing.assert_allclose(x[1, 0, 0], -3.0, atol=1e-6)  # -len_b/2
    # present frame recentered: X=1 - 4/2*cos(0) = -1
    np.testing.assert_allclose(x[0, 0, 0], -1.0, atol=1e-6)
    np.testing.assert_array_equal(stt, [1, 2])
    np.testing.assert_allclose(xdims, [[2, 4], [2, 6]])


def naive_map_edges(start, end, widths, cgl, cgr, max_angle_deg, prox, fwd_thresh=2.0):
    """Reference map edge double loop (gbuilder.py:392-424), incl. the
    elif-gating of forward edges and the swap-to-longest distance."""
    S = len(start)
    ang = np.arctan2(end[:, 1] - start[:, 1], end[:, 0] - start[:, 0])
    cent = (start + end) / 2.0
    ln = np.linalg.norm(end - start, axis=1)

    def segdist(i, j):
        a, b = (i, j) if ln[j] <= ln[i] else (j, i)
        A, B, C = start[a], end[a], cent[b]
        AB, AC = B - A, C - A
        t = np.dot(AC, AB) / np.dot(AB, AB)
        P = A if t < 0 else (B if t > 1 else A + t * AB)
        return np.linalg.norm(C - P) - (widths[i] + widths[j]) / 2.0

    edges = []
    for i in range(S):
        for j in range(S):
            if i == j:
                continue
            if abs(ang[i] - ang[j]) < np.deg2rad(max_angle_deg):
                if segdist(i, j) < prox:
                    if (cgr[i] and cgl[j]) or (cgl[i] and cgr[j]):
                        edges.append([i, j])
            elif np.linalg.norm(end[i] - start[j]) < fwd_thresh:
                edges.append([i, j])
    return np.array(edges).T if edges else np.zeros((2, 0), np.int64)


def test_map_edges_match_naive(rng):
    S = 25
    start = rng.uniform(0, 50, (S, 2)).astype(np.float32)
    ang = rng.choice([0, 5, 90, 180], S) + rng.normal(0, 3, S)
    ln = rng.uniform(4, 15, S)
    end = start + np.stack([ln * np.cos(np.deg2rad(ang)), ln * np.sin(np.deg2rad(ang))], 1).astype(np.float32)
    widths = rng.uniform(2, 4, S).astype(np.float32)
    cgl = rng.random(S) > 0.4
    cgr = rng.random(S) > 0.4

    got = build_map_edges(start, end, widths, cgl, cgr,
                          lat_conn_max_angle_deg=30.0, lat_conn_proximity_threshold=8.0, chunk=7)
    want = naive_map_edges(start, end, widths, cgl, cgr, 30.0, 8.0)
    np.testing.assert_array_equal(got, want)


def test_graphs_builder_end_to_end(tmp_path):
    split = make_vehicle_split(tmp_path / "train", n_packs=6, frames_num=10, max_vehicles=4, seed=3)
    gb = GraphsBuilder(split, frames_num=10, m_radius=30.0, active_labels=[0, 2])
    gpath = gb.save()
    files = sorted(gpath.glob("pack_*.npz"))
    assert len(files) == 6
    md = MetaData.load_json(gpath / "metadata.json")
    assert md.frames_num == 10 and md.active_labels == [0, 2]
    z = np.load(files[0])
    assert z["x"].ndim == 3 and z["x"].shape[1:] == (10, 6)
    assert z["y"].shape == (2,)
    assert z["edge_index"].reshape(2, -1).shape[0] == 2


def test_map_builder_end_to_end(tmp_path):
    mp = make_map_parquet(tmp_path / "vmap.parquet", n_segments=15, seed=1)
    mb = MapBuilder(mp, lat_conn_max_angle_deg=30.0, lat_conn_proximity_threshold=1.0)
    saved = mb.save()
    md = load_map_data(saved)
    assert md.feats.shape == (15, 8)  # 6 z-scored floats + 2 bools
    assert md.centroids.shape == (15, 2)
    # z-scored columns have ~zero mean
    np.testing.assert_allclose(np.asarray(md.feats[:, :6]).mean(0), 0.0, atol=1e-5)


def test_online_creator_matches_offline(tmp_path):
    """Online per-window graph == offline batch graph for the same pack."""
    split = make_vehicle_split(tmp_path / "s", n_packs=3, frames_num=8, max_vehicles=4, seed=5)
    gb = GraphsBuilder(split, frames_num=8, m_radius=30.0, active_labels=[0])
    gpath = gb.save()

    packs = pd.read_parquet(split / "packs.parquet")
    vinfo = pd.read_parquet(split / "vinfo.parquet")
    oc = GraphOnlineCreator(frames_num=8, m_radius=30.0, active_labels=[0])
    for pid, pg in packs.groupby("PackId"):
        merged = pg.drop(columns=["PackId"]).merge(vinfo, on="VehicleId", how="inner")
        g_on = oc(merged)
        z = np.load(gpath / f"pack_{pid}.npz")
        np.testing.assert_allclose(g_on.x, z["x"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(g_on.edge_index, z["edge_index"].reshape(2, -1))
        np.testing.assert_allclose(g_on.edge_attr, z["edge_attr"].reshape(-1, 4), rtol=1e-5)


def test_online_creator_empty_and_norm():
    oc = GraphOnlineCreator(
        frames_num=4,
        m_radius=10.0,
        norm_stats={
            "mu": {"x": np.zeros((1, 1, 5), np.float32), "xdims": np.zeros((1, 2), np.float32)},
            "sigma": {"x": np.full((1, 1, 5), 2.0, np.float32), "xdims": np.ones((1, 2), np.float32)},
        },
    )
    g = oc(pd.DataFrame())
    assert g.num_nodes == 0 and g.num_edges == 0

    pack = pd.DataFrame(
        {
            "VehicleId": ["v"], "FrameId": [0], "X": [4.0], "Y": [0.0],
            "Speed": [2.0], "Angle": [0.0], "Width": [2.0], "Length": [4.0], "StationType": [1],
        }
    )
    g = oc(pack)
    # pos_raw is pre-normalization: X recentered = 4 - 2 = 2
    np.testing.assert_allclose(g.pos_raw[0, 0, 0], 2.0)
    # normalized x = 2/2 = 1
    np.testing.assert_allclose(g.x[0, 0, 0], 1.0)
    # presence flag untouched by normalization
    np.testing.assert_allclose(g.x[0, 0, 5], 1.0)


@pytest.mark.parametrize("seed", range(5))
def test_trajectory_edges_fuzz(seed):
    """Randomized graphs across seeds: vectorized (and native when built)
    edge construction equals the naive loop."""
    rng = np.random.default_rng(1000 + seed)
    V = int(rng.integers(1, 30))
    F = int(rng.integers(1, 20))
    x = np.zeros((V, F, 6), np.float32)
    x[:, :, :2] = rng.uniform(-50, 50, (V, F, 2))
    x[:, :, 5] = (rng.random((V, F)) > rng.uniform(0.1, 0.9)).astype(np.float32)
    r = float(rng.uniform(5, 60))
    ei_v, ea_v = build_trajectory_edges(x, r)
    ei_n, ea_n = naive_trajectory_edges(x, r)
    np.testing.assert_array_equal(ei_v, ei_n)
    np.testing.assert_allclose(ea_v, ea_n, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(5))
def test_map_edges_fuzz(seed):
    rng = np.random.default_rng(2000 + seed)
    S = int(rng.integers(2, 40))
    start = rng.uniform(-30, 30, (S, 2)).astype(np.float32)
    end = (start + rng.uniform(-15, 15, (S, 2))).astype(np.float32)
    widths = rng.uniform(1, 5, S).astype(np.float32)
    cgl = rng.random(S) > 0.5
    cgr = rng.random(S) > 0.5
    ang = float(rng.uniform(5, 90))
    prox = float(rng.uniform(0.5, 10))
    got = build_map_edges(start, end, widths, cgl, cgr,
                          lat_conn_max_angle_deg=ang, lat_conn_proximity_threshold=prox)
    want = naive_map_edges(start, end, widths, cgl, cgr, ang, prox)
    np.testing.assert_array_equal(got, want)


def test_row_group_straddling_pack(tmp_path):
    """A pack spanning parquet row groups must be built once, complete."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    split = make_vehicle_split(tmp_path / "s", n_packs=5, frames_num=8,
                               max_vehicles=4, seed=9, drop_frame_frac=0.0)
    # rewrite packs.parquet with tiny row groups so packs straddle them
    df = pd.read_parquet(split / "packs.parquet")
    pq.write_table(pa.Table.from_pandas(df), split / "packs.parquet", row_group_size=7)

    gb = GraphsBuilder(split, frames_num=8, m_radius=30.0, active_labels=[0])
    gpath = gb.save()
    files = sorted(gpath.glob("pack_*.npz"))
    assert len(files) == 5
    # every pack graph has the full vehicle set (no truncated duplicates)
    for pid, pg in df.groupby("PackId"):
        z = np.load(gpath / f"pack_{pid}.npz")
        assert z["x"].shape[0] == pg["VehicleId"].nunique()


def test_incremental_online_matches_full_rebuild(rng):
    """IncrementalGraphOnlineCreator == GraphOnlineCreator on every window
    of a churning stream (vehicles entering/leaving), with and without
    normalization; long enough to cross the accumulator-refresh boundary."""
    from sldm_gnn_tpu.build.online import GraphOnlineCreator, IncrementalGraphOnlineCreator

    F, radius = 6, 12.0
    norm = {
        "mu": {"x": np.zeros(5, np.float32) + 0.3, "xdims": np.zeros(2, np.float32)},
        "sigma": {"x": np.ones(5, np.float32) * 2.0, "xdims": np.ones(2, np.float32)},
    }
    full = GraphOnlineCreator(F, radius, norm_stats=norm)
    inc = IncrementalGraphOnlineCreator(F, radius, norm_stats=norm, capacity=4)

    # static per-vehicle info (the reference's vinfo contract)
    vinfo = {
        v: (float(rng.uniform(1.5, 2.5)), float(rng.uniform(3.5, 5.0)), int(rng.integers(0, 6)))
        for v in range(12)
    }

    def frame(t):
        rows = []
        for v in range(12):
            # vehicles drift in and out of the stream
            if (t + v) % 5 == 0 or rng.random() < 0.15:
                continue
            w, ln, st = vinfo[v]
            rows.append(dict(
                VehicleId=v, FrameId=0, X=float(v * 3 + 0.5 * t + rng.normal()),
                Y=float(np.sin(0.3 * t + v)), Speed=float(rng.uniform(0, 20)),
                Angle=float(rng.uniform(0, 360)), Width=w, Length=ln, StationType=st,
            ))
        return pd.DataFrame(rows)

    frames = [frame(t) for t in range(3 * F + 2)]
    checked = 0
    for t, fr in enumerate(frames):
        inc.push(fr)
        if not inc.warm:
            continue
        window = frames[t - F + 1 : t + 1]
        parts = []
        for rel, wfr in enumerate(window):
            if len(wfr):
                p = wfr.copy()
                p["FrameId"] = rel
                parts.append(p)
        pack_df = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        want = full(pack_df)
        got = inc.window()

        assert got.x.shape == want.x.shape
        np.testing.assert_allclose(got.x, want.x, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got.xsttype, want.xsttype)
        np.testing.assert_allclose(got.xdims, want.xdims, rtol=1e-6)
        np.testing.assert_array_equal(got.edge_index, want.edge_index)
        np.testing.assert_allclose(got.edge_attr, want.edge_attr, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got.pos_raw, want.pos_raw, rtol=1e-6, atol=1e-6)
        checked += 1
    assert checked >= 2 * F  # crossed at least one refresh boundary


def test_incremental_online_empty_and_labels(rng):
    from sldm_gnn_tpu.build.online import IncrementalGraphOnlineCreator

    F = 3
    inc = IncrementalGraphOnlineCreator(F, 10.0, active_labels=[0, 1])
    for _ in range(F):
        inc.push(pd.DataFrame())
    g = inc.window(mlb=2)
    assert g.x.shape == (0, F, 6)
    assert g.y is None  # empty-window contract matches GraphOnlineCreator
    assert g.edge_index.shape == (2, 0)
