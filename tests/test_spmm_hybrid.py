"""Hybrid SpMM backend: block-density edge split, dense+one-hot composition,
budget-derived pair cap, custom-VJP composition — vs edge-list aggregation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import mean_weights
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.ops.spmm_hybrid import (
    HybridLayout,
    prepare_hybrid_mean_aggregate,
    select_dense_edges,
    spmm_hybrid_apply,
)


def skewed_graph(rng, n=640, core_blocks=2, tile=64, e_core=6000, e_strag=1500):
    """Dense core (first ``core_blocks`` node tiles) + uniform stragglers."""
    core = rng.integers(0, core_blocks * tile, (e_core, 2))
    strag = rng.integers(0, n, (e_strag, 2))
    edges = np.concatenate([core, strag])
    return edges[:, 0].astype(np.int64), edges[:, 1].astype(np.int64)


@pytest.mark.parametrize("dtype,dense_k,k_per_step", [
    (np.float32, 1, 1),
    (np.float32, 2, 2),
    (np.int8, 2, 1),
])
def test_hybrid_matches_edge_list(rng, dtype, dense_k, k_per_step):
    n, tile, d = 640, 64, 32
    src, dst = skewed_graph(rng, n=n, tile=tile)
    hl, n_pad = prepare_hybrid_mean_aggregate(
        src, dst, n, tile=tile, dense_k=dense_k, k_per_step=k_per_step,
        min_pair_edges=tile // 2, dense_dtype=dtype,
    )
    assert hl.dense_fwd is not None and hl.onehot_fwd is not None
    assert 0.0 < hl.dense_edge_fraction < 1.0
    hlj = jax.tree.map(jnp.asarray, hl)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

    want = spmm_xla(x, srcj, dstj, w, n_pad)
    got = jax.jit(lambda x, hl: spmm_hybrid_apply(x, hl, False))(x, hlj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda x: jnp.sum(spmm_hybrid_apply(x, hlj, False) * t))(x)
    g2 = jax.grad(lambda x: jnp.sum(spmm_xla(x, srcj, dstj, w, n_pad) * t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_degenerate_splits(rng):
    # all edges inside one dense block pair -> pure dense half
    src = rng.integers(0, 64, 5000)
    dst = rng.integers(0, 64, 5000)
    hl, n_pad = prepare_hybrid_mean_aggregate(src, dst, 640, tile=64)
    assert hl.dense_fwd is not None and hl.onehot_fwd is None
    # uniform sparse -> pure one-hot half
    src2 = rng.integers(0, 640, 50)
    dst2 = rng.integers(0, 640, 50)
    hl2, n_pad2 = prepare_hybrid_mean_aggregate(src2, dst2, 640, tile=64)
    assert hl2.dense_fwd is None and hl2.onehot_fwd is not None
    for hl_, s_, d_ in [(hl, src, dst), (hl2, src2, dst2)]:
        x = jnp.asarray(rng.standard_normal((hl_.n_pad, 8)).astype(np.float32))
        hlj = jax.tree.map(jnp.asarray, hl_)
        got = spmm_hybrid_apply(x, hlj, False)
        want = spmm_xla(x, jnp.asarray(s_), jnp.asarray(d_),
                        jnp.asarray(mean_weights(d_, hl_.n_pad)), hl_.n_pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_empty_graph(rng):
    hl, n_pad = prepare_hybrid_mean_aggregate(
        np.zeros(0, np.int64), np.zeros(0, np.int64), 100, tile=64)
    x = jnp.asarray(rng.standard_normal((n_pad, 8)).astype(np.float32))
    out = spmm_hybrid_apply(x, jax.tree.map(jnp.asarray, hl), False)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_budget_caps_pairs_per_block(rng):
    n, tile = 640, 64
    src, dst = skewed_graph(rng, n=n, tile=tile)
    nb = 640 // tile
    # budget allowing exactly 1 pair per block per direction
    budget = 2 * nb * tile * tile * 4 * 1
    hl, _ = prepare_hybrid_mean_aggregate(
        src, dst, n, tile=tile, min_pair_edges=1, a_budget_bytes=budget)
    assert hl.dense_fwd is None or hl.dense_fwd.s_max <= 1
    assert hl.dense_rev is None or hl.dense_rev.s_max <= 1
    # the symmetric cap keeps fwd and rev layouts transposes of each other:
    # gradient still matches the edge list exactly
    hlj = jax.tree.map(jnp.asarray, hl)
    x = jnp.asarray(rng.standard_normal((hl.n_pad, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((hl.n_pad, 16)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, hl.n_pad))
    g1 = jax.grad(lambda x: jnp.sum(spmm_hybrid_apply(x, hlj, False) * t))(x)
    g2 = jax.grad(lambda x: jnp.sum(
        spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, hl.n_pad) * t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_select_dense_edges_threshold(rng):
    tile, nb = 64, 4
    # pair (0,0): 100 edges; pair (1,2): 3 edges
    src = np.r_[rng.integers(0, tile, 100), rng.integers(2 * tile, 3 * tile, 3)]
    dst = np.r_[rng.integers(0, tile, 100), rng.integers(tile, 2 * tile, 3)]
    mask = select_dense_edges(src, dst, nb, tile=tile, min_pair_edges=32)
    assert mask[:100].all() and not mask[100:].any()


def test_pallas_interpret_matches_xla_dispatch(rng):
    n, tile, d = 512, 128, 128
    src, dst = skewed_graph(rng, n=n, tile=tile, core_blocks=1, e_core=4000, e_strag=800)
    hl, n_pad = prepare_hybrid_mean_aggregate(src, dst, n, tile=tile,
                                              min_pair_edges=tile // 2)
    assert hl.dense_fwd is not None and hl.onehot_fwd is not None
    hlj = jax.tree.map(jnp.asarray, hl)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    want = np.asarray(spmm_hybrid_apply(x, hlj, False))

    # route both halves through their interpret-mode Pallas kernels
    from sldm_gnn_tpu.ops.spmm import spmm_pallas
    from sldm_gnn_tpu.ops.spmm_dense import spmm_dense_pallas

    got = np.asarray(
        spmm_dense_pallas(x, hlj.dense_fwd, interpret=True, step_blocks=hl.dense_k)
        + spmm_pallas(x, hlj.onehot_fwd, n_pad, interpret=True, k_per_step=hl.k_per_step)
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_hybrid_int8_native_path_matches_python(rng):
    """Above the native threshold the hybrid's int8 dense half must equal
    the numpy construction (and the one-hot half is untouched)."""
    from sldm_gnn_tpu.build.native import available
    import sldm_gnn_tpu.build.native as native_mod

    if not available():
        pytest.skip("native library not built")
    n, deg, tile = 20_000, 6, 64
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-40, 41, n * deg), 0, n - 1)

    kw = dict(tile=tile, dense_k=2, min_pair_edges=8,
              a_budget_bytes=1e9, dense_dtype=np.int8)
    hl_n, np_n = prepare_hybrid_mean_aggregate(src, dst, n, **kw)
    assert hl_n.dense_fwd is not None and hl_n.dense_fwd.a.dtype == np.int8

    orig = native_mod.native_dense_blocks_i8
    native_mod.native_dense_blocks_i8 = lambda *a, **k: None
    try:
        hl_p, np_p = prepare_hybrid_mean_aggregate(src, dst, n, **kw)
    finally:
        native_mod.native_dense_blocks_i8 = orig

    assert np_n == np_p
    for a, b in ((hl_n.dense_fwd, hl_p.dense_fwd), (hl_n.dense_rev, hl_p.dense_rev)):
        np.testing.assert_array_equal(np.asarray(a.a), np.asarray(b.a))
        np.testing.assert_array_equal(np.asarray(a.src_blk), np.asarray(b.src_blk))
    np.testing.assert_array_equal(np.asarray(hl_n.dense_fwd.row_scale),
                                  np.asarray(hl_p.dense_fwd.row_scale))


def test_prepare_auto_selects_and_matches(rng):
    """The auto layout picker returns bf16-dense / int8-dense / hybrid by
    budget tier, and every tier computes the same mean aggregation."""
    from sldm_gnn_tpu.ops.spmm import spmm_xla
    from sldm_gnn_tpu.ops.spmm_dense import DenseBlocks, spmm_dense_apply
    from sldm_gnn_tpu.ops.spmm_hybrid import (
        HybridLayout, dense_tile_bytes, prepare_auto_mean_aggregate)
    from sldm_gnn_tpu.graph.csr import mean_weights

    n, deg, tile, d = 1500, 6, 64, 8
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-30, 31, n * deg), 0, n - 1)

    from sldm_gnn_tpu.ops.spmm_banded import BandedBlocks, spmm_banded_apply

    full_i8 = dense_tile_bytes(src, dst, n, tile=tile, itemsize=1)
    tiers = [
        (full_i8 + 1, BandedBlocks, "int8"),  # banded graph -> banded tier
        (2 * tile * tile + 1, HybridLayout, None),
    ]
    outs = []
    for budget, typ, dt in tiers:
        fwd, rev, n_pad = prepare_auto_mean_aggregate(
            src, dst, n, tile=tile, a_budget_bytes=budget)
        assert isinstance(fwd, typ)
        if dt is not None:
            assert str(fwd.a.dtype) == dt
        x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
        if isinstance(fwd, HybridLayout):
            got = spmm_hybrid_apply(x, jax.tree.map(jnp.asarray, fwd), False)
        elif isinstance(fwd, BandedBlocks):
            got = spmm_banded_apply(x, jax.tree.map(jnp.asarray, fwd),
                                    jax.tree.map(jnp.asarray, rev), False)
        else:
            got = spmm_dense_apply(x, jax.tree.map(jnp.asarray, fwd),
                                   jax.tree.map(jnp.asarray, rev), False)
        outs.append((np.asarray(got), x, n_pad))

    for got, x, n_pad in outs:
        w = jnp.asarray(mean_weights(dst, n_pad))
        want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # duplicate multiplicity > 127 -> exact int8 counts impossible; the
    # picker falls back to bf16 weight tiles within the same budget
    src2 = np.concatenate([src, np.full(130, src[0])])
    dst2 = np.concatenate([dst, np.full(130, dst[0])])
    fwd, rev, n_pad = prepare_auto_mean_aggregate(
        src2, dst2, n, tile=tile,
        a_budget_bytes=dense_tile_bytes(src2, dst2, n, tile=tile, itemsize=2) + 1)
    assert isinstance(fwd, DenseBlocks) and str(fwd.a.dtype) == "bfloat16"
