"""Dense-block SpMM backend: builder, Pallas kernel (interpret), XLA
reference, custom VJP — vs the naive edge-list aggregation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import mean_weights, pad_nodes
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.ops.spmm_dense import (
    build_dense_blocks,
    prepare_dense_mean_aggregate,
    spmm_dense_apply,
    spmm_dense_pallas,
    spmm_dense_xla,
)


def naive(x, src, dst, w, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    for e in range(len(src)):
        out[dst[e]] += w[e] * x[src[e]]
    return out


@pytest.mark.parametrize("n,e,d,tile", [(100, 800, 16, 16), (300, 4000, 32, 64), (50, 0, 8, 16)])
def test_builder_and_xla_match_naive(rng, n, e, d, tile):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    blocks = build_dense_blocks(src, dst, n, weight=w, tile=tile)
    n_pad = pad_nodes(n, tile)
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    out = np.asarray(spmm_dense_xla(jnp.asarray(x), jax.tree.map(jnp.asarray, blocks)))
    np.testing.assert_allclose(out, naive(x, src, dst, w, n_pad), rtol=1e-4, atol=1e-4)


def test_duplicate_edges_sum_weights(rng):
    n, tile = 40, 8
    src = np.array([1, 1, 1, 5])
    dst = np.array([3, 3, 3, 3])
    w = np.array([0.5, 0.25, 0.125, 1.0], np.float32)
    blocks = build_dense_blocks(src, dst, n, weight=w, tile=tile)
    x = rng.standard_normal((pad_nodes(n, tile), 4)).astype(np.float32)
    out = np.asarray(spmm_dense_xla(jnp.asarray(x), jax.tree.map(jnp.asarray, blocks)))
    want = naive(x, src, dst, w, pad_nodes(n, tile))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_pallas_interpret_matches_xla(rng):
    n, e, d, tile = 260, 3000, 128, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = mean_weights(dst, pad_nodes(n, tile))
    blocks = jax.tree.map(jnp.asarray, build_dense_blocks(src, dst, n, weight=w, tile=tile))
    x = jnp.asarray(rng.standard_normal((pad_nodes(n, tile), d)).astype(np.float32))
    got = np.asarray(spmm_dense_pallas(x, blocks, interpret=True))
    want = np.asarray(spmm_dense_xla(x, blocks))
    # kernel uses bf16 MXU operands (same as the one-hot DEFAULT path)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_apply_grad_matches_autodiff_of_edge_list(rng):
    n, e, d, tile = 90, 700, 16, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_dense_mean_aggregate(src, dst, n, tile=tile)
    fwd = jax.tree.map(jnp.asarray, fwd)
    rev = jax.tree.map(jnp.asarray, rev)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    w = jnp.asarray(mean_weights(dst, n_pad))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

    g1 = jax.grad(lambda x: jnp.sum(spmm_dense_apply(x, fwd, rev, False) * t))(x)
    g2 = jax.grad(lambda x: jnp.sum(spmm_xla(x, srcj, dstj, w, n_pad) * t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_flop_advantage_on_local_graph():
    """On the headline's map-like locality graph the dense-block form does
    ~an order of magnitude fewer matmul FLOPs than the one-hot form."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    n, deg, d, tile, ec = 20_000, 16, 128, 512, 512
    src, dst = bench.make_local_graph(n, deg)
    blocks = build_dense_blocks(src, dst, n, tile=tile)
    dense_flops = 2 * blocks.num_dst_blocks * blocks.s_max * tile * tile * d
    onehot_flops = 4 * len(src) * tile * d * 1.1  # ~10% chunk padding
    assert dense_flops * 3 < onehot_flops


@pytest.mark.slow
def test_step_blocks_matches_single(rng):
    """K dst blocks per grid step == K=1, including the VJP."""
    n, e, d, tile = 200, 1600, 32, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_dense_mean_aggregate(src, dst, n, tile=tile, pad_blocks_to=4)
    assert fwd.num_dst_blocks % 4 == 0
    fwd = jax.tree.map(jnp.asarray, fwd)
    rev = jax.tree.map(jnp.asarray, rev)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    from sldm_gnn_tpu.ops.spmm_dense import spmm_dense_pallas

    o1 = np.asarray(spmm_dense_pallas(x, fwd, interpret=True, step_blocks=1))
    o4 = np.asarray(spmm_dense_pallas(x, fwd, interpret=True, step_blocks=4))
    np.testing.assert_allclose(o4, o1, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="step_blocks"):
        bad_fwd, _, np2 = prepare_dense_mean_aggregate(src, dst, n, tile=tile)
        if bad_fwd.num_dst_blocks % 5:
            spmm_dense_pallas(jnp.zeros((np2, d)), jax.tree.map(jnp.asarray, bad_fwd),
                              interpret=True, step_blocks=5)
        else:
            raise ValueError("step_blocks test setup degenerate")

    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(spmm_dense_apply(x, fwd, rev, False, 1) * t))(x)
    g2 = jax.grad(lambda x: jnp.sum(spmm_dense_apply(x, fwd, rev, False, 4) * t))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_int8_factored_mean_matches_edge_list(rng):
    """int8 count tiles + per-node 1/deg scales == the f32 folded-weight
    layout (exact factoring of mean aggregation), fwd and bwd, XLA and
    Pallas-interpret dispatch."""
    n, e, d, tile = 300, 4000, 32, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_dense_mean_aggregate(src, dst, n, tile=tile,
                                                   dtype=np.int8, pad_blocks_to=2)
    assert fwd.a.dtype == np.int8 and fwd.row_scale is not None
    assert rev.a.dtype == np.int8 and rev.col_scale is not None
    fwd = jax.tree.map(jnp.asarray, fwd)
    rev = jax.tree.map(jnp.asarray, rev)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = mean_weights(dst, n_pad)

    want = naive(np.asarray(x), src, dst, w, n_pad)
    np.testing.assert_allclose(np.asarray(spmm_dense_xla(x, fwd)), want,
                               rtol=1e-4, atol=1e-5)
    got_pal = np.asarray(spmm_dense_pallas(x, fwd, interpret=True, step_blocks=2))
    np.testing.assert_allclose(got_pal, want, rtol=5e-2, atol=5e-2)

    srcj, dstj, wj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    g1 = jax.grad(lambda x: jnp.sum(spmm_dense_apply(x, fwd, rev, False, 2) * t))(x)
    g2 = jax.grad(lambda x: jnp.sum(spmm_xla(x, srcj, dstj, wj, n_pad) * t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_int8_prepare_native_path_matches_python(rng):
    """Above the native-path threshold (1e5 edges) the int8 factored
    layouts must be identical to the numpy construction."""
    from sldm_gnn_tpu.build.native import available

    if not available():
        pytest.skip("native library not built")
    n, deg, tile = 20_000, 6, 64
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-40, 41, n * deg), 0, n - 1)
    assert len(src) >= 100_000

    fwd_n, rev_n, n_pad_n = prepare_dense_mean_aggregate(
        src, dst, n, tile=tile, dtype=np.int8, pad_blocks_to=2)

    # numpy reference: same function with the native builder disabled
    import sldm_gnn_tpu.build.native as native_mod

    orig = native_mod.native_dense_blocks_i8
    native_mod.native_dense_blocks_i8 = lambda *a, **k: None
    try:
        fwd_p, rev_p, n_pad_p = prepare_dense_mean_aggregate(
            src, dst, n, tile=tile, dtype=np.int8, pad_blocks_to=2)
    finally:
        native_mod.native_dense_blocks_i8 = orig

    assert n_pad_n == n_pad_p
    for a, b in ((fwd_n, fwd_p), (rev_n, rev_p)):
        np.testing.assert_array_equal(np.asarray(a.a), np.asarray(b.a))
        np.testing.assert_array_equal(np.asarray(a.src_blk), np.asarray(b.src_blk))
    np.testing.assert_array_equal(np.asarray(fwd_n.row_scale), np.asarray(fwd_p.row_scale))
    np.testing.assert_array_equal(np.asarray(rev_n.col_scale), np.asarray(rev_p.col_scale))
