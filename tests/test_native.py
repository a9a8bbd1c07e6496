"""Native C++ ETL kernel parity vs the numpy reference paths.

The library is built on demand (make -C native); tests are skipped when no
toolchain is available.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native_lib():
    lib = REPO / "native" / "libgraphbuild.so"
    if not lib.is_file():
        r = subprocess.run(["make", "-C", str(REPO / "native")], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    import sldm_gnn_tpu.build.native as native

    if not native.available():
        pytest.skip("native lib not loadable")
    return native


def test_native_trajectory_edges_match_numpy(native_lib, rng):
    from sldm_gnn_tpu.build.tensorize import build_trajectory_edges

    V, F = 40, 25
    x = np.zeros((V, F, 6), np.float32)
    x[:, :, :2] = rng.uniform(0, 80, (V, F, 2))
    x[:, :, 5] = (rng.random((V, F)) > 0.25).astype(np.float32)

    ei_c, ea_c = build_trajectory_edges(x, 30.0, allow_native=True)
    ei_np, ea_np = build_trajectory_edges(x, 30.0, allow_native=False)
    np.testing.assert_array_equal(ei_c, ei_np)
    np.testing.assert_allclose(ea_c, ea_np, rtol=1e-5, atol=1e-4)


def test_native_map_edges_match_numpy(native_lib, rng):
    from sldm_gnn_tpu.build.map_builder import build_map_edges

    S = 60
    start = rng.uniform(0, 60, (S, 2)).astype(np.float32)
    ang = rng.choice([0, 10, 90, 180], S) + rng.normal(0, 4, S)
    ln = rng.uniform(4, 15, S)
    end = (start + np.stack([ln * np.cos(np.deg2rad(ang)), ln * np.sin(np.deg2rad(ang))], 1)).astype(np.float32)
    widths = rng.uniform(2, 4, S).astype(np.float32)
    cgl = rng.random(S) > 0.4
    cgr = rng.random(S) > 0.4

    kw = dict(lat_conn_max_angle_deg=30.0, lat_conn_proximity_threshold=6.0)
    e_c = build_map_edges(start, end, widths, cgl, cgr, allow_native=True, **kw)
    e_np = build_map_edges(start, end, widths, cgl, cgr, allow_native=False, **kw)
    np.testing.assert_array_equal(e_c, e_np)


def test_native_empty_graph(native_lib):
    from sldm_gnn_tpu.build.tensorize import build_trajectory_edges

    x = np.zeros((0, 5, 6), np.float32)
    ei, ea = build_trajectory_edges(x, 10.0, allow_native=True)
    assert ei.shape == (2, 0) and ea.shape == (0, 4)

    # single isolated vehicle
    x1 = np.zeros((1, 5, 6), np.float32)
    x1[:, :, 5] = 1.0
    ei, ea = build_trajectory_edges(x1, 10.0, allow_native=True)
    assert ei.shape == (2, 0)


def test_native_block_edges_matches_python(native_lib, rng):
    """Native blocked-layout builder: SpMM result equality with the python
    builder (chunk order within a dst block may legitimately differ)."""
    import jax
    import jax.numpy as jnp

    from sldm_gnn_tpu.graph.csr import block_edges, pad_nodes
    from sldm_gnn_tpu.ops.spmm import _spmm_dispatch
    from sldm_gnn_tpu.build.native import native_block_edges
    from sldm_gnn_tpu.graph.csr import BlockedEdges

    n, e, d = 700, 5000, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n)

    # e=5000 is below the 100k native-routing threshold, so this exercises
    # the python builder directly
    blocked_py = block_edges(src, dst, n_pad, weight=w, step_chunks=2)

    out = native_block_edges(src, dst, n_pad, weight=w, tile=128, edge_chunk=256,
                             step_chunks=2)
    assert out is not None
    meta, sl, dl, wa, eid = out
    blocked_c = BlockedEdges(block_meta=meta, src_local=sl, dst_local=dl,
                             weight=wa, edge_id=eid, tile=128)
    assert blocked_c.num_chunks % 2 == 0
    # dst blocks contiguous ascending
    assert (np.diff(meta[:, 0]) >= 0).all()
    # every real edge present exactly once
    valid = wa.reshape(-1) != 0
    assert sorted(eid.reshape(-1)[valid].tolist()) == list(range(e))

    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    out_py = np.asarray(_spmm_dispatch(x, jax.tree.map(jnp.asarray, blocked_py), n_pad, False))
    out_c = np.asarray(_spmm_dispatch(x, jax.tree.map(jnp.asarray, blocked_c), n_pad, False))
    np.testing.assert_allclose(out_c, out_py, rtol=1e-4, atol=1e-4)


def test_native_block_edges_out_of_range_raises(native_lib, rng):
    """Edges past the padded node range must error loudly, not drop."""
    from sldm_gnn_tpu.build.native import native_block_edges
    from sldm_gnn_tpu.graph.csr import block_edges

    src = np.array([0, 300], np.int64)
    dst = np.array([1, 300], np.int64)  # node 300 outside n_pad=256
    with pytest.raises(ValueError, match="outside the padded|out of range"):
        native_block_edges(src, dst, 256, tile=128, edge_chunk=64, step_chunks=1)
    with pytest.raises(ValueError, match="out of range"):
        block_edges(src, dst, 256)


def test_native_dense_blocks_matches_python(rng):
    """Native dense-adjacency builder == python builder (same slot order)."""
    from sldm_gnn_tpu.build.native import available, native_dense_blocks
    from sldm_gnn_tpu.graph.csr import mean_weights, pad_nodes
    from sldm_gnn_tpu.ops.spmm_dense import build_dense_blocks

    if not available():
        pytest.skip("native library not built")
    n, e, tile = 700, 5000, 64
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    w = mean_weights(dst, pad_nodes(n, tile))
    nb = pad_nodes(n, tile) // tile

    py = build_dense_blocks(src, dst, n, weight=w, tile=tile)  # python (< 100k edges)
    a_n, sb_n = native_dense_blocks(src, dst, w, nb, tile)
    assert a_n.shape == py.a.shape
    np.testing.assert_array_equal(sb_n, np.asarray(py.src_blk))
    np.testing.assert_allclose(a_n, np.asarray(py.a), rtol=1e-6, atol=1e-7)


def test_native_dense_blocks_i8_matches_python(rng):
    """Native int8 count-tile fill == python count layout (incl. duplicate
    edges), and the reported max count is exact."""
    from sldm_gnn_tpu.build.native import available, native_dense_blocks_i8
    from sldm_gnn_tpu.graph.csr import pad_nodes
    from sldm_gnn_tpu.ops.spmm_dense import build_dense_blocks

    if not available():
        pytest.skip("native library not built")
    n, e, tile = 700, 5000, 64
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    # force duplicates so counts exceed 1
    src[:50] = src[0]
    dst[:50] = dst[0]
    nb = pad_nodes(n, tile) // tile

    py = build_dense_blocks(src, dst, n, tile=tile)  # unweighted = counts
    out = native_dense_blocks_i8(src, dst, nb, tile)
    assert out is not None
    a_i8, sb_n, cmax = out
    assert a_i8.dtype == np.int8
    np.testing.assert_array_equal(sb_n, np.asarray(py.src_blk))
    np.testing.assert_array_equal(a_i8.astype(np.float32), np.asarray(py.a))
    assert cmax == int(py.a.max()) == 50


def test_incr_push_matches_numpy(rng):
    """native incr_push drives IncrementalGraphOnlineCreator to the EXACT
    same state and emitted windows as the numpy path — vehicles arriving,
    leaving (slot free + reuse), capacity growth, eviction maintenance,
    and the periodic refresh all exercised."""
    from sldm_gnn_tpu.build import native as nat
    from sldm_gnn_tpu.build.online import IncrementalGraphOnlineCreator

    if not nat.available() or nat._load_incr() is None:
        pytest.skip("native library not built")

    def mk():
        return IncrementalGraphOnlineCreator(
            frames_num=6, m_radius=8.0, capacity=4,
            norm_stats={"mu": {"x": np.zeros(5, np.float32),
                               "xdims": np.zeros(2, np.float32)},
                        "sigma": {"x": np.ones(5, np.float32),
                                  "xdims": np.ones(2, np.float32)}})

    a, b = mk(), mk()

    def drive(creator, frames, use_native):
        import contextlib
        import unittest.mock as mock

        ctx = (contextlib.nullcontext() if use_native
               else mock.patch.object(nat, "_load", lambda: None))
        outs = []
        with ctx:  # numpy arm: push AND window fall back
            for f in frames:
                creator.push_arrays(*f)
                if creator.warm:
                    outs.append(creator.window())
        return outs

    frames = []
    pool = list(range(12))
    for t in range(40):
        n = int(rng.integers(0, 7))
        vids = rng.choice(pool, size=n, replace=False).tolist()
        frames.append((
            vids,
            (rng.standard_normal(n) * 6).astype(np.float32),
            (rng.standard_normal(n) * 6).astype(np.float32),
            rng.standard_normal(n).astype(np.float32),
            rng.uniform(0, 360, n).astype(np.float32),
            np.full(n, 2.0, np.float32), np.full(n, 4.5, np.float32),
            np.full(n, 1, np.int32)))

    outs_n = drive(a, frames, use_native=True)
    outs_p = drive(b, frames, use_native=False)

    # internal state exactly equal
    for name in ("_x", "_present", "_d", "_dsum", "_d2sum", "_cnt",
                 "_dmin", "_dmin_pos", "_dmax", "_dmax_pos", "_wl", "_stt"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name),
                                      err_msg=name)
    assert a._vid2slot == b._vid2slot and a._head == b._head

    # emitted windows exactly equal
    assert len(outs_n) == len(outs_p)
    for ga, gb in zip(outs_n, outs_p):
        np.testing.assert_array_equal(ga.x, gb.x)
        np.testing.assert_array_equal(ga.edge_index, gb.edge_index)
        np.testing.assert_array_equal(ga.edge_attr, gb.edge_attr)
        np.testing.assert_array_equal(ga.xsttype, gb.xsttype)
        np.testing.assert_array_equal(ga.xdims, gb.xdims)
