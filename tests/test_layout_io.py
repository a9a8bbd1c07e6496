"""Layout serialization (graph/layout_io.py): round-trip equality for the
three blocked-layout types and the builder cache."""

import numpy as np
import jax
import pytest

from sldm_gnn_tpu.graph.csr import block_edges, mean_weights, pad_nodes
from sldm_gnn_tpu.graph.layout_io import cached_layouts, load_layout, save_layout
from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate
from sldm_gnn_tpu.ops.spmm_dense import prepare_dense_mean_aggregate


def _graph(rng, n=1000, deg=5, reach=50):
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


def _assert_layout_equal(a, b):
    assert type(a) is type(b)
    import dataclasses

    for f in dataclasses.fields(type(a)):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if va is None or vb is None:
            assert va is None and vb is None, f.name
        elif f.metadata.get("static"):
            assert va == vb, f.name
        else:
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=f.name)
            assert np.asarray(va).dtype == np.asarray(vb).dtype, f.name


@pytest.mark.parametrize("kind", ["banded", "dense", "onehot"])
def test_layout_roundtrip(tmp_path, rng, kind):
    n = 1000
    src, dst = _graph(rng)
    if kind == "banded":
        fwd, rev, _ = prepare_banded_mean_aggregate(src, dst, n, tile=64, k=4)
    elif kind == "dense":
        fwd, rev, _ = prepare_dense_mean_aggregate(src, dst, n, tile=64)
    else:
        n_pad = pad_nodes(n, 64)
        w = mean_weights(dst, n_pad)
        fwd = block_edges(src, dst, n_pad, weight=w, tile=64, edge_chunk=32)
        rev = block_edges(dst, src, n_pad, weight=w, tile=64, edge_chunk=32)
    for layout in (fwd, rev):
        p = tmp_path / "l.npz"
        save_layout(p, layout)
        _assert_layout_equal(load_layout(p), layout)


def test_cached_layouts(tmp_path, rng):
    n = 800
    src, dst = _graph(rng, n=n)
    calls = []

    def build():
        calls.append(1)
        return prepare_banded_mean_aggregate(src, dst, n, tile=64, k=4)

    r1 = cached_layouts(tmp_path, "k1", build)
    r2 = cached_layouts(tmp_path, "k1", build)
    assert len(calls) == 1  # second call served from disk
    _assert_layout_equal(r1[0], r2[0])
    _assert_layout_equal(r1[1], r2[1])
    assert r1[2] == r2[2]  # the padded node count (plain value)
    r3 = cached_layouts(tmp_path, "k2", build)
    assert len(calls) == 2  # different key rebuilds
    _assert_layout_equal(r1[0], r3[0])


def test_hybrid_layout_roundtrip(tmp_path, rng):
    """HybridLayout (nested DenseBlocks/BlockedEdges halves + static
    dense_frac) round-trips; cached_layouts handles its tuple."""
    from sldm_gnn_tpu.ops.spmm_hybrid import prepare_hybrid_mean_aggregate

    n = 1200
    src, dst = _graph(rng, n=n, deg=6, reach=40)
    # force a genuine split: low min_pair_edges keeps some pairs dense
    layout, n_pad = prepare_hybrid_mean_aggregate(
        src, dst, n, tile=32, min_pair_edges=8, a_budget_bytes=1e6)
    p = tmp_path / "h.npz"
    save_layout(p, layout)
    back = load_layout(p)
    assert back.dense_frac == layout.dense_frac
    assert back.n_pad == layout.n_pad
    for fname in ("dense_fwd", "dense_rev", "onehot_fwd", "onehot_rev"):
        a, b = getattr(layout, fname), getattr(back, fname)
        if a is None:
            assert b is None
        else:
            _assert_layout_equal(a, b)

    calls = []

    def build():
        calls.append(1)
        return prepare_hybrid_mean_aggregate(
            src, dst, n, tile=32, min_pair_edges=8, a_budget_bytes=1e6)

    r1 = cached_layouts(tmp_path, "hk", build)
    r2 = cached_layouts(tmp_path, "hk", build)
    assert len(calls) == 1 and r1[1] == r2[1]
    assert r2[0].dense_frac == r1[0].dense_frac


def test_int4_packed_roundtrip(tmp_path, rng):
    """save_layout packs int8 count tiles that fit [-8, 7] as nibbles
    (half the on-disk bytes); load_layout restores them bit-exactly."""
    from sldm_gnn_tpu.graph.layout_io import load_layout, save_layout
    from sldm_gnn_tpu.ops.spmm_banded import build_banded_counts

    n = 4096
    dst = np.repeat(np.arange(n, dtype=np.int64), 3)
    src = np.clip(dst + rng.integers(-40, 41, len(dst)), 0, n - 1)
    blocks = build_banded_counts(src, dst, n, tile=32, k=2)
    assert int(np.asarray(blocks.a).max()) <= 7
    p = tmp_path / "b.npz"
    save_layout(p, blocks)
    with np.load(p, allow_pickle=False) as z:
        assert "a__i4" in z.files and "a" not in z.files
        packed_bytes = z["a__i4"].nbytes
    assert packed_bytes * 2 >= np.asarray(blocks.a).nbytes - 1
    got = load_layout(p)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(blocks.a))
    assert got.a.dtype == np.int8
    np.testing.assert_array_equal(got.off, blocks.off)
    # out-of-range int8 arrays stay unpacked
    big = build_banded_counts(
        np.concatenate([src] + [src[:1]] * 9),
        np.concatenate([dst] + [dst[:1]] * 9), n, tile=32, k=2)
    save_layout(p, big)
    with np.load(p, allow_pickle=False) as z:
        assert "a" in z.files


def test_raw_sidecar_roundtrip(rng, tmp_path):
    """Arrays over raw_threshold go to .npy side-cars (the npz zipfile
    reader is ~150 MB/s; raw npy reads at disk speed) and load back
    bit-identical — including int4-packed count tiles whose PACKED form
    crosses the threshold."""
    from sldm_gnn_tpu.graph.layout_io import load_layout, save_layout
    from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate

    n, deg = 4096, 6
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-40, 41, n * deg), 0, n - 1)
    fwd, _, _ = prepare_banded_mean_aggregate(src, dst, n, tile=64, k=4)

    p = tmp_path / "lay.npz"
    save_layout(p, fwd, raw_threshold=1024)  # force side-cars
    sidecars = list(tmp_path.glob("lay.*.npy"))
    assert sidecars, "expected raw side-car files"
    got = load_layout(p)
    for f in ("a", "bo", "woff", "off", "row_scale"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(fwd, f)), err_msg=f)
    assert got.a.dtype == np.int8

    # threshold None -> single-file npz, same contents
    p2 = tmp_path / "lay2.npz"
    save_layout(p2, fwd, raw_threshold=None)
    assert not list(tmp_path.glob("lay2.*.npy"))
    got2 = load_layout(p2)
    np.testing.assert_array_equal(np.asarray(got2.a), np.asarray(got.a))
