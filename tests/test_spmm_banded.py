"""Banded dense SpMM (ops/spmm_banded.py): XLA-reference / interpreted-
kernel / VJP parity against the edge-list aggregation, native-vs-numpy
builder equality, and non-banded rejection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import mean_weights
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.ops.spmm_banded import (
    build_banded_blocks,
    prepare_banded_mean_aggregate,
    spmm_banded_apply,
    spmm_banded_pallas,
    spmm_banded_xla,
    widen_banded,
)


def _banded_graph(rng, n=3000, deg=8, reach=100):
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("dtype", [np.int8, np.float32])
def test_banded_matches_edge_list(rng, dtype, wide):
    n, tile, d, K = 3000, 64, 16, 4
    src, dst = _banded_graph(rng)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=K, dtype=dtype,
                                                    wide=wide)
    fj, rj = jax.tree.map(jnp.asarray, (fwd, rev))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))

    np.testing.assert_allclose(np.asarray(spmm_banded_xla(x, fj)), want,
                               rtol=1e-5, atol=1e-5)
    got = np.asarray(spmm_banded_pallas(x, fj, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # custom VJP == transpose aggregation
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    gx = jax.grad(lambda x: jnp.sum(spmm_banded_apply(x, fj, rj, False) * t))(x)
    want_g = np.asarray(spmm_xla(t, jnp.asarray(dst), jnp.asarray(src), w, n_pad))
    np.testing.assert_allclose(np.asarray(gx), want_g, rtol=1e-4, atol=1e-4)


def test_banded_native_matches_numpy(rng):
    from sldm_gnn_tpu.build.native import available
    import sldm_gnn_tpu.build.native as native_mod

    if not available():
        pytest.skip("native library not built")
    n, deg, tile = 20_000, 6, 64
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-40, 41, n * deg), 0, n - 1)
    src[:60] = src[0]
    dst[:60] = dst[0]  # duplicates exercise the count cells
    assert len(src) >= 100_000

    fn, rn, npn = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    orig = native_mod.native_banded_blocks_i8
    native_mod.native_banded_blocks_i8 = lambda *a, **k: None
    try:
        fp, rp, npp = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    finally:
        native_mod.native_banded_blocks_i8 = orig
    assert npn == npp
    for a, b in ((fn, fp), (rn, rp)):
        for f in ("a", "bo", "woff", "off"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)))
        assert a.wsz == b.wsz and a.s_span == b.s_span
    np.testing.assert_array_equal(fn.row_scale, fp.row_scale)
    np.testing.assert_array_equal(rn.col_scale, rp.col_scale)


def test_banded_tail_block_rebase(rng):
    """Tail blocks whose min source block exceeds nb - s_span get their
    slot base clamped (slots shifted); both kernel layouts stay exact even
    though the full s_span slot range must fit the window."""
    n, tile, d = 1024, 64, 8
    nb = n // tile
    # one wide-span destination block (span = 6 tiles) + diagonal-only tail
    # blocks whose bo would otherwise sit at nb-1 > nb - s_span
    dst = np.concatenate([np.zeros(400, np.int64),
                          np.arange(n - 3 * tile, n, dtype=np.int64)])
    src = np.concatenate([rng.integers(0, 6 * tile, 400).astype(np.int64),
                          np.arange(n - 3 * tile, n, dtype=np.int64)])
    for wide in (False, True):
        fwd, rev, n_pad = prepare_banded_mean_aggregate(
            src, dst, n, tile=tile, k=2, wide=wide)
        assert fwd.s_span == 6
        # every block's full slot range fits its window
        assert int(np.asarray(fwd.off).max()) + fwd.s_span <= fwd.wsz
        assert int(np.asarray(fwd.bo).max()) <= nb - fwd.s_span
        x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
        w = jnp.asarray(mean_weights(dst, n_pad))
        want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
        fj = jax.tree.map(jnp.asarray, fwd)
        np.testing.assert_allclose(np.asarray(spmm_banded_xla(x, fj)), want,
                                   rtol=1e-5, atol=1e-5)
        got = np.asarray(spmm_banded_pallas(x, fj, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_widen_banded_equivalent(rng):
    """widen_banded is a pure layout change: same math, wide=True."""
    n, tile, d = 2000, 64, 8
    src, dst = _banded_graph(rng, n=n, deg=4, reach=80)
    fwd, _, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4, wide=False)
    wfwd = widen_banded(fwd)
    assert wfwd.wide and wfwd.s_span == fwd.s_span
    assert widen_banded(wfwd) is wfwd
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    a = np.asarray(spmm_banded_xla(x, jax.tree.map(jnp.asarray, fwd)))
    b = np.asarray(spmm_banded_xla(x, jax.tree.map(jnp.asarray, wfwd)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_banded_rejects_non_banded(rng):
    n, e = 4096, 20000
    src = rng.integers(0, n, e).astype(np.int64)  # uniform random: full span
    dst = rng.integers(0, n, e).astype(np.int64)
    with pytest.raises(ValueError, match="span"):
        build_banded_blocks(src, dst, n, tile=64, max_span=4)


def test_banded_empty_and_boundary_blocks(rng):
    """Blocks with zero edges and the clamped final window stay exact."""
    n, tile, d = 1024, 64, 8
    # edges only in the first quarter; last blocks empty
    e = 3000
    dst = rng.integers(0, n // 4, e).astype(np.int64)
    src = np.clip(dst + rng.integers(-50, 51, e), 0, n - 1)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    fj = jax.tree.map(jnp.asarray, fwd)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
    got = np.asarray(spmm_banded_pallas(x, fj, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert not np.asarray(got[n // 4 * 2:]).any() or True  # empty rows are zero
    np.testing.assert_allclose(got[n // 2:], 0.0, atol=1e-6)


def test_blocked_sage_dispatches_banded(rng):
    """BlockedSageConv consumes a BandedBlocks layout end-to-end."""
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageBlock

    n, tile, d = 2000, 64, 8
    src, dst = _banded_graph(rng, n=n, deg=4, reach=60)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    fj, rj = jax.tree.map(jnp.asarray, (fwd, rev))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    m = BlockedSageBlock(hidden_dims=(8,), negative_slope=0.1, use_pallas=False)
    params = m.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    out = m.apply(params, x, fj, rj, n_pad)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x, fj, rj, n_pad) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_banded_int8_matches_dequantized_reference(rng):
    """Fully-int8 banded aggregation == f32 aggregation of the dequantized
    features EXACTLY (integer math; the only error is x quantization),
    and tracks the unquantized result within per-tensor int8 error."""
    from sldm_gnn_tpu.ops.quant import quantize_tensor_xla
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_int8_pallas

    n, tile, d = 3000, 64, 16
    src, dst = _banded_graph(rng)
    fwd, _, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    fj = jax.tree.map(jnp.asarray, fwd)
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    xq, scale = quantize_tensor_xla(jnp.asarray(x))

    got = np.asarray(spmm_banded_int8_pallas(xq, scale, fj, interpret=True))

    deq = np.asarray(xq, np.int64)
    w = mean_weights(dst, n_pad)
    want_int = np.zeros((n_pad, d), np.int64)
    np.add.at(want_int, dst, deq[src])
    want = want_int.astype(np.float64) * float(scale[0]) * (
        np.asarray(fwd.row_scale).astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6, atol=1e-6)

    full = np.asarray(spmm_xla(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                               jnp.asarray(w), n_pad))
    ref_scale = np.abs(full).max()
    assert np.abs(got - full).max() / ref_scale < 5e-2


def test_banded_infer_int8_wrapper(rng):
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_infer_int8

    n, tile, d = 1500, 64, 8
    src, dst = _banded_graph(rng, n=n, deg=4, reach=60)
    fwd, _, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    fj = jax.tree.map(jnp.asarray, fwd)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    got = np.asarray(spmm_banded_infer_int8(x, fj, interpret=True))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
    ref_scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / ref_scale < 5e-2


def test_banded_counts_native_matches_numpy_forced_min(rng):
    """build_banded_counts with forced s_span_min/wsz_min (the halo
    planner's stacking contract) — native fill == numpy fill."""
    from sldm_gnn_tpu.build.native import available
    import sldm_gnn_tpu.build.native as native_mod
    from sldm_gnn_tpu.ops.spmm_banded import build_banded_counts

    if not available():
        pytest.skip("native library not built")
    n, deg, tile = 30_000, 4, 64
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-100, 101, n * deg), 0, n - 1)
    assert len(src) >= 100_000

    kw = dict(tile=tile, k=4, s_span_min=9, wsz_min=14)
    a = build_banded_counts(src, dst, n, **kw)
    orig = native_mod.native_banded_blocks_i8
    native_mod.native_banded_blocks_i8 = lambda *a_, **k_: None
    try:
        b = build_banded_counts(src, dst, n, **kw)
    finally:
        native_mod.native_banded_blocks_i8 = orig
    assert a.s_span == b.s_span == 9  # forced floor (natural span is ~4)
    assert a.wsz == b.wsz >= 14
    assert a.wsz == b.wsz
    for f in ("a", "bo", "woff", "off"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)))


def test_banded_counts_native_matches_numpy_sources_above(rng):
    """Regression: a dst block whose sources ALL live in higher-numbered
    blocks — the native fill bases slots at the true min source block while
    the numpy builder includes the block's own id; the unified base (min of
    both, pre-clamp) must make the two paths byte-identical."""
    from sldm_gnn_tpu.build.native import available
    import sldm_gnn_tpu.build.native as native_mod
    from sldm_gnn_tpu.ops.spmm_banded import build_banded_counts

    if not available():
        pytest.skip("native library not built")
    n, deg, tile = 30_000, 4, 64
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-80, 81, n * deg), 0, n - 1)
    # block 0's sources forced entirely into blocks 2-3
    blk0 = dst < tile
    src[blk0] = rng.integers(2 * tile, 4 * tile, int(blk0.sum()))
    assert len(src) >= 100_000

    a = build_banded_counts(src, dst, n, tile=tile, k=4)
    orig = native_mod.native_banded_blocks_i8
    native_mod.native_banded_blocks_i8 = lambda *a_, **k_: None
    try:
        b = build_banded_counts(src, dst, n, tile=tile, k=4)
    finally:
        native_mod.native_banded_blocks_i8 = orig
    assert a.s_span == b.s_span and a.wsz == b.wsz
    assert int(np.asarray(a.bo)[0]) == 0  # arange-inclusive base
    for f in ("a", "bo", "woff", "off"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)

    # and the layout aggregates correctly
    from sldm_gnn_tpu.graph.csr import mean_weights
    from sldm_gnn_tpu.ops.spmm_banded import BandedBlocks, spmm_banded_xla

    n_pad = a.num_dst_blocks * tile
    degv = np.bincount(dst, minlength=n_pad)
    scale = (1.0 / np.maximum(degv, 1)).astype(np.float32).reshape(-1, 1)
    lay = BandedBlocks(a=a.a, bo=a.bo, woff=a.woff, off=a.off, row_scale=scale,
                       tile=tile, wsz=a.wsz, k=a.k)
    x = jnp.asarray(rng.standard_normal((n_pad, 8)).astype(np.float32))
    got = np.asarray(spmm_banded_xla(x, jax.tree.map(jnp.asarray, lay)))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
    np.testing.assert_allclose(got[: n], want[: n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wide", [False, True])
def test_banded_xla_chunked_exact(rng, wide):
    """The O(chunk)-memory lax.map fallback (chunk_blocks / env
    SLDM_XLA_AGG_CHUNK) is bit-identical to the one-shot einsum,
    including the non-divisible tail and through the custom VJP."""
    import os

    n, tile, d, K = 3000, 64, 16, 4
    src, dst = _banded_graph(rng)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(
        src, dst, n, tile=tile, k=K, wide=wide)
    fj, rj = jax.tree.map(jnp.asarray, (fwd, rev))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    want = np.asarray(spmm_banded_xla(x, fj))
    nb = fj.num_dst_blocks
    for c in (1, 7, nb - 1, nb):  # 7 and nb-1 leave tails
        got = np.asarray(spmm_banded_xla(x, fj, chunk_blocks=c))
        np.testing.assert_array_equal(got, want, err_msg=f"chunk={c}")

    # env-gated, and through the differentiable wrapper's backward
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    loss = lambda x: jnp.sum(spmm_banded_apply(x, fj, rj, False) * t)
    want_g = np.asarray(jax.grad(loss)(x))
    os.environ["SLDM_XLA_AGG_CHUNK"] = "5"
    try:
        got_g = np.asarray(jax.grad(loss)(x))
    finally:
        del os.environ["SLDM_XLA_AGG_CHUNK"]
    np.testing.assert_array_equal(got_g, want_g)
