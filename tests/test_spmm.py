"""Blocked SpMM correctness: Pallas kernel (interpret mode on CPU) and XLA
dispatch vs naive dense reference, plus custom-VJP gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import TILE, block_edges, mean_weights, pad_nodes
from sldm_gnn_tpu.ops.spmm import (
    prepare_mean_aggregate,
    spmm_apply,
    spmm_pallas,
    spmm_xla,
    _spmm_dispatch,
)


def naive_weighted_sum(x, src, dst, w, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    for e in range(len(src)):
        out[dst[e]] += w[e] * x[src[e]]
    return out


@pytest.mark.parametrize("n,e,d", [(50, 300, 8), (200, 1500, 16), (130, 10, 128)])
def test_blocked_xla_dispatch_matches_naive(rng, n, e, d):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    x_np = rng.standard_normal((pad_nodes(n), d)).astype(np.float32)

    blocked = block_edges(src, dst, pad_nodes(n), weight=w)
    out = np.asarray(_spmm_dispatch(jnp.array(x_np), blocked, pad_nodes(n), False))
    want = naive_weighted_sum(x_np, src, dst, w, pad_nodes(n))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_interpret_matches_naive(rng):
    n, e, d = 300, 2000, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    blocked = block_edges(src, dst, n_pad, weight=w)
    out = np.asarray(
        spmm_pallas(
            jnp.array(x_np), blocked, n_pad, interpret=True,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)

    # fast path: bf16 MXU operands, ~1e-2 tolerance
    out_fast = np.asarray(spmm_pallas(jnp.array(x_np), blocked, n_pad, interpret=True))
    np.testing.assert_allclose(out_fast, want, rtol=5e-2, atol=5e-2)


def test_pallas_empty_dst_blocks_zeroed(rng):
    """dst blocks with no incoming edges must come out as zeros."""
    n_pad = 3 * TILE
    d = 8
    # all edges target block 0 only
    src = rng.integers(0, n_pad, 50)
    dst = rng.integers(0, TILE, 50)
    blocked = block_edges(src, dst, n_pad)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    out = np.asarray(
        spmm_pallas(jnp.array(x_np), blocked, n_pad, interpret=True,
                    precision=jax.lax.Precision.HIGHEST)
    )
    np.testing.assert_allclose(out[TILE:], 0.0)
    want = naive_weighted_sum(x_np, src, dst, np.ones(50, np.float32), n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_mean_aggregate_and_grad(rng):
    n, e, d = 90, 600, 12
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    out = np.asarray(spmm_apply(jnp.array(x_np), fwd, rev, n_pad, False))
    w = mean_weights(dst, n)
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    # gradient == aggregation over reversed edges with same weights
    def loss(x):
        return jnp.sum(spmm_apply(x, fwd, rev, n_pad, False) * 2.0)

    grad = np.asarray(jax.grad(loss)(jnp.array(x_np)))
    want_grad = naive_weighted_sum(np.full((n_pad, d), 2.0, np.float32), dst, src, w, n_pad)
    np.testing.assert_allclose(grad, want_grad, rtol=1e-4, atol=1e-4)


def test_grad_matches_autodiff_of_xla_path(rng):
    n, e, d = 40, 200, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    w = jnp.array(mean_weights(dst, n))

    def loss_custom(x):
        return jnp.sum(jnp.sin(spmm_apply(x, fwd, rev, n_pad, False)))

    def loss_plain(x):
        return jnp.sum(jnp.sin(spmm_xla(x, jnp.array(src), jnp.array(dst), w, n_pad)))

    g1 = np.asarray(jax.grad(loss_custom)(jnp.array(x_np)))
    g2 = np.asarray(jax.grad(loss_plain)(jnp.array(x_np)))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_megakernel_interpret_matches_naive(rng):
    """Megakernel variant (grid per dst block, in-kernel DMA chunk loop)."""
    from sldm_gnn_tpu.ops.spmm_mk import spmm_pallas_mk, to_megakernel_layout

    n, e, d = 300, 1500, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    blocked = block_edges(src, dst, n_pad, weight=w)
    mk = to_megakernel_layout(blocked, n_pad)

    out = np.asarray(
        spmm_pallas_mk(jnp.array(x_np), jax.tree.map(jnp.asarray, mk), n_pad,
                       fast=False, interpret=True)
    )
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)

    # a dst block with zero edges stays zero
    assert int(np.asarray(mk.chunk_ptr)[-1]) == mk.num_chunks


def test_megakernel_empty_graph(rng):
    from sldm_gnn_tpu.ops.spmm_mk import spmm_pallas_mk, to_megakernel_layout

    n_pad = pad_nodes(200)
    blocked = block_edges(np.zeros(0, np.int64), np.zeros(0, np.int64), n_pad)
    mk = to_megakernel_layout(blocked, n_pad)
    x_np = rng.standard_normal((n_pad, 8)).astype(np.float32)
    out = np.asarray(
        spmm_pallas_mk(jnp.array(x_np), jax.tree.map(jnp.asarray, mk), n_pad,
                       fast=False, interpret=True)
    )
    np.testing.assert_allclose(out, 0.0)


def test_k_per_step_matches_single(rng):
    """K-chunks-per-grid-step variant equals the K=1 kernel (interpret)."""
    n, e, d = 400, 3000, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    for K in (2, 4):
        blocked = block_edges(src, dst, n_pad, weight=w, step_chunks=K)
        assert blocked.num_chunks % K == 0
        out = np.asarray(
            spmm_pallas(jnp.array(x_np), blocked, n_pad, interpret=True,
                        precision=jax.lax.Precision.HIGHEST, k_per_step=K)
        )
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3, err_msg=f"K={K}")


def test_k_per_step_requires_matching_layout(rng):
    n = 200
    blocked = block_edges(rng.integers(0, n, 50), rng.integers(0, n, 50), pad_nodes(n))
    if blocked.num_chunks % 4 != 0:
        with pytest.raises(ValueError, match="k_per_step"):
            spmm_pallas(jnp.zeros((pad_nodes(n), 8), jnp.float32), blocked,
                        pad_nodes(n), interpret=True, k_per_step=4)


def test_tile_256_layout(rng):
    """Non-default node-tile height (256) stays exact."""
    n, e, d = 500, 2500, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n, tile=256, edge_chunk=512,
                                             step_chunks=2)
    assert n_pad % 256 == 0 and fwd.tile == 256
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    out = np.asarray(
        spmm_pallas(jnp.array(x_np), fwd, n_pad, interpret=True,
                    precision=jax.lax.Precision.HIGHEST, k_per_step=2)
    )
    w = mean_weights(dst, n)
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)


def test_megakernel_respects_layout_tile(rng):
    """Regression: megakernel must honor a non-default tile (256)."""
    from sldm_gnn_tpu.ops.spmm_mk import spmm_pallas_mk, to_megakernel_layout

    n, e, d = 500, 1500, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n, 256)
    blocked = block_edges(src, dst, n_pad, weight=w, tile=256, edge_chunk=512)
    mk = to_megakernel_layout(blocked, n_pad)
    assert mk.tile == 256
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    out = np.asarray(
        spmm_pallas_mk(jnp.array(x_np), jax.tree.map(jnp.asarray, mk), n_pad,
                       fast=False, interpret=True)
    )
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-3)


def test_bench_chunked_xla_baseline_matches(rng):
    """bench.py's memory-bounded chunked-scan baseline == one-shot XLA."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    n, e, d = 300, 2500, 8
    src = jnp.array(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.array(rng.integers(0, n, e).astype(np.int32))
    w = jnp.array(rng.random(e).astype(np.float32))
    x = jnp.array(rng.standard_normal((n, d)).astype(np.float32))
    got = np.asarray(bench.spmm_xla_chunked(x, src, dst, w, n, chunk=600))
    want = np.asarray(spmm_xla(x, src, dst, w, n))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_bf16_feature_storage(rng):
    """bf16 feature storage (halved X streaming) matches naive within the
    DEFAULT-precision tolerance; output adopts bf16; HIGHEST rejects bf16."""
    n, e, d = 200, 1500, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    n_pad = pad_nodes(n)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    blocked = block_edges(src, dst, n_pad, weight=w)
    out = spmm_pallas(jnp.array(x_np, jnp.bfloat16), blocked, n_pad, interpret=True)
    assert out.dtype == jnp.bfloat16
    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    np.testing.assert_allclose(np.asarray(out, np.float32), want, rtol=5e-2, atol=5e-2)

    with pytest.raises(ValueError, match="HIGHEST"):
        spmm_pallas(
            jnp.array(x_np, jnp.bfloat16), blocked, n_pad, interpret=True,
            precision=jax.lax.Precision.HIGHEST,
        )


def test_bench_two_layer_sage_bf16_close_to_f32(rng):
    """bench's bf16 compute mode tracks the f32 result (XLA dispatch path)."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    n, e, d = 150, 900, 32
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    bf, br, n_pad = prepare_mean_aggregate(src, dst, n)
    x = jnp.array(rng.standard_normal((n_pad, d)).astype(np.float32))
    params = {
        k: jnp.array(rng.standard_normal((d, d)).astype(np.float32) * 0.05)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }
    agg = lambda h: spmm_apply(h, bf, br, n_pad, False)
    out32 = np.asarray(bench.two_layer_sage(params, x, agg, jnp.float32))
    out16 = np.asarray(bench.two_layer_sage(params, x, agg, jnp.bfloat16))
    assert out16.dtype == np.float32  # cast back at the boundary
    scale = np.abs(out32).max() + 1e-6
    assert np.abs(out16 - out32).max() / scale < 5e-2


def test_pallas_int8_matches_dequantized_reference(rng):
    """Int8 SpMM == f32 SpMM over the dequantized features, within bf16
    scatter rounding; and quant+aggregate tracks the unquantized result
    within int8 error."""
    from sldm_gnn_tpu.ops.quant import dequantize_rows, quantize_rows_xla
    from sldm_gnn_tpu.ops.spmm import spmm_pallas_int8

    n, e, d = 250, 2000, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    n_pad = pad_nodes(n)
    w = mean_weights(dst, n_pad)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    blocked = block_edges(src, dst, n_pad, weight=w)
    xq, xs = quantize_rows_xla(jnp.array(x_np))
    out = np.asarray(spmm_pallas_int8(xq, xs, blocked, n_pad, interpret=True))

    deq = np.asarray(dequantize_rows(xq, xs))
    want_q = naive_weighted_sum(deq, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want_q, rtol=5e-2, atol=5e-3)

    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    scale = np.abs(want).max()
    assert np.abs(out - want).max() / scale < 5e-2


def test_pallas_int8_k_per_step(rng):
    from sldm_gnn_tpu.ops.quant import quantize_rows_xla
    from sldm_gnn_tpu.ops.spmm import spmm_pallas_int8

    n, e, d = 200, 1200, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    n_pad = pad_nodes(n)
    w = mean_weights(dst, n_pad)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    xq, xs = quantize_rows_xla(jnp.array(x_np))

    b1 = block_edges(src, dst, n_pad, weight=w)
    b2 = block_edges(src, dst, n_pad, weight=w, step_chunks=2)
    o1 = np.asarray(spmm_pallas_int8(xq, xs, b1, n_pad, interpret=True))
    o2 = np.asarray(spmm_pallas_int8(xq, xs, b2, n_pad, interpret=True, k_per_step=2))
    np.testing.assert_allclose(o2, o1, rtol=1e-5, atol=1e-6)


def test_pallas_int8_pertensor_matches_dequantized_reference(rng):
    """Per-tensor int8 SpMM == f32 SpMM over the dequantized features within
    bf16 scatter rounding, and tracks the unquantized result within
    per-tensor int8 error (coarser than per-row)."""
    from sldm_gnn_tpu.ops.quant import quantize_tensor_xla
    from sldm_gnn_tpu.ops.spmm import spmm_pallas_int8_pt

    n, e, d = 250, 2000, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    n_pad = pad_nodes(n)
    w = mean_weights(dst, n_pad)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)

    blocked = block_edges(src, dst, n_pad, weight=w)
    xq, scale = quantize_tensor_xla(jnp.array(x_np))
    out = np.asarray(spmm_pallas_int8_pt(xq, scale, blocked, n_pad, interpret=True))

    deq = np.asarray(xq, np.float32) * float(scale[0])
    want_q = naive_weighted_sum(deq, src, dst, w, n_pad)
    np.testing.assert_allclose(out, want_q, rtol=5e-2, atol=5e-3)

    want = naive_weighted_sum(x_np, src, dst, w, n_pad)
    ref_scale = np.abs(want).max()
    assert np.abs(out - want).max() / ref_scale < 5e-2


def test_pallas_int8_pertensor_k_per_step(rng):
    from sldm_gnn_tpu.ops.quant import quantize_tensor_xla
    from sldm_gnn_tpu.ops.spmm import spmm_pallas_int8_pt

    n, e, d = 200, 1200, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    n_pad = pad_nodes(n)
    w = mean_weights(dst, n_pad)
    x_np = rng.standard_normal((n_pad, d)).astype(np.float32)
    xq, scale = quantize_tensor_xla(jnp.array(x_np))

    b1 = block_edges(src, dst, n_pad, weight=w)
    b2 = block_edges(src, dst, n_pad, weight=w, step_chunks=2)
    o1 = np.asarray(spmm_pallas_int8_pt(xq, scale, b1, n_pad, interpret=True))
    o2 = np.asarray(spmm_pallas_int8_pt(xq, scale, b2, n_pad, interpret=True, k_per_step=2))
    np.testing.assert_allclose(o2, o1, rtol=1e-5, atol=1e-6)
