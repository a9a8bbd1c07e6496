"""Banded + compact-residual SpMM (ops/banded_residual.py): split
correctness (span bounds both directions, full-degree mean weights),
aggregation/VJP parity against the edge-list reference, fused-kernel
parity with the residual injected through the scalar-prefetch BlockSpec,
and the near-banded acceptance / non-banded rejection policy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import mean_weights
from sldm_gnn_tpu.ops.banded_residual import (
    BandedResidualLayout,
    banded_residual_sage_apply,
    prepare_banded_residual_mean_aggregate,
    residual_fwd_compact,
    spmm_banded_residual_apply,
    split_banded_residual,
)
from sldm_gnn_tpu.ops.spmm import spmm_xla


def _near_banded_graph(rng, n=3000, deg=6, reach=80, n_outliers=40):
    """Local graph plus a few long-range edges — the shape a reordered
    real graph takes (tight band + noisy tail)."""
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    o_dst = rng.integers(0, n, n_outliers)
    o_src = (o_dst + n // 2) % n  # maximally non-local
    return (np.concatenate([src, o_dst]), np.concatenate([dst, o_src]))


def test_split_and_layout_invariants(rng):
    n, tile, k = 3000, 64, 4
    src, dst = _near_banded_graph(rng)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    assert layout.banded_fwd.s_span <= 4
    assert layout.banded_rev.s_span <= 4
    e_band = int(np.asarray(layout.banded_fwd.a, np.int64).sum())
    assert e_band + len(layout.r_src) == len(src)
    assert len(layout.r_src) > 0  # the outliers landed in the residual
    assert layout.resid_frac < 0.05
    # compact maps: every residual row lies inside a real (non-dummy) slot
    assert layout.r_row_fwd.min() >= layout.group_rows
    assert layout.r_row_rev.min() >= layout.group_rows
    # slot 0 of the compact aggregate is the zeros dummy
    x = jnp.asarray(rng.standard_normal((n_pad, 8)).astype(np.float32))
    r = residual_fwd_compact(x, jax.tree.map(jnp.asarray, layout))
    np.testing.assert_array_equal(np.asarray(r[0]), 0.0)


@pytest.mark.parametrize("span", [4, None])
def test_aggregation_matches_edge_list(rng, span):
    n, tile, k, d = 3000, 64, 4, 16
    src, dst = _near_banded_graph(rng)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=span, resid_frac=0.01)
    lj = jax.tree.map(jnp.asarray, layout)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))

    got = np.asarray(spmm_banded_residual_apply(x, lj, False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradient == transpose aggregation (banded custom VJP + residual AD)
    t = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    gx = jax.grad(lambda x: jnp.sum(spmm_banded_residual_apply(x, lj, False) * t))(x)
    want_g = np.asarray(spmm_xla(t, jnp.asarray(dst), jnp.asarray(src), w, n_pad))
    np.testing.assert_allclose(np.asarray(gx), want_g, rtol=1e-4, atol=1e-4)


def _fused_ref(x, wl, wr, b, lj, slope):
    y = spmm_banded_residual_apply(x, lj, False) @ wl + x @ wr
    if b is not None:
        y = y + b
    if slope is not None:
        y = jnp.where(y > 0, y, slope * y)
    return y


@pytest.mark.parametrize("slope", [None, 0.0])
@pytest.mark.parametrize("bias", [True, False])
def test_fused_forward_with_residual(rng, slope, bias):
    n, tile, k, d, h = 2000, 64, 4, 16, 24
    src, dst = _near_banded_graph(rng, n=n, n_outliers=25)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    lj = jax.tree.map(jnp.asarray, layout)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    wl = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    wr = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1) if bias else None

    want = np.asarray(_fused_ref(x, wl, wr, b, lj, slope))
    got_xla = np.asarray(banded_residual_sage_apply(x, wl, wr, b, lj, False, slope))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-5)
    # interpreted kernel: residual rides the scalar-prefetch BlockSpec;
    # MXU operands round to bf16 (DEFAULT-precision invariant)
    got_k = np.asarray(banded_residual_sage_apply(
        x, wl, wr, b, lj, True, slope, True))
    np.testing.assert_allclose(got_k, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("slope", [None, 0.0])
def test_fused_vjp_with_residual(rng, slope):
    n, tile, k, d, h = 2000, 64, 4, 12, 20
    src, dst = _near_banded_graph(rng, n=n, n_outliers=25)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    lj = jax.tree.map(jnp.asarray, layout)
    rng2 = np.random.default_rng(5)
    x = jnp.asarray(rng2.standard_normal((n_pad, d)).astype(np.float32))
    wl = jnp.asarray(rng2.standard_normal((d, h)).astype(np.float32) * 0.2)
    wr = jnp.asarray(rng2.standard_normal((d, h)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng2.standard_normal((h,)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng2.standard_normal((n_pad, h)).astype(np.float32))

    def loss_fused(x, wl, wr, b):
        return jnp.sum(banded_residual_sage_apply(x, wl, wr, b, lj, False, slope) * t)

    def loss_ref(x, wl, wr, b):
        return jnp.sum(_fused_ref(x, wl, wr, b, lj, slope) * t)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wl, wr, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wl, wr, b)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-4, atol=1e-4)

    # interpreted-kernel VJP (fused reverse kernel with compact residual).
    # sum(y^2) loss + global-scale max-error criterion (as
    # tests/test_sage_fused.py): the bf16 forward can flip the ReLU mask
    # on near-zero pre-activations; with this loss the cotangent is ~0
    # exactly there, so the check measures the kernel, not the flips
    got_k = jax.grad(
        lambda x, wl, wr, b: jnp.sum(
            banded_residual_sage_apply(x, wl, wr, b, lj, True, slope, True) ** 2),
        argnums=(0, 1, 2, 3))(x, wl, wr, b)
    want_k = jax.grad(
        lambda x, wl, wr, b: jnp.sum(_fused_ref(x, wl, wr, b, lj, slope) ** 2),
        argnums=(0, 1, 2, 3))(x, wl, wr, b)
    for g, w_, name in zip(got_k, want_k, ("dx", "dwl", "dwr", "db")):
        g, w_ = np.asarray(g), np.asarray(w_)
        scale = np.abs(w_).max() + 1e-9
        assert np.abs(g - w_).max() / scale < 5e-2, name


def test_empty_residual_degenerates_gracefully(rng):
    """A perfectly banded graph through the residual builder: empty
    residual arrays, parity intact."""
    n, tile, k, d = 1500, 64, 4, 8
    dst = np.repeat(np.arange(n, dtype=np.int64), 4)
    src = np.clip(dst + rng.integers(-30, 31, len(dst)), 0, n - 1)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    assert len(layout.r_src) == 0 and layout.m_fwd == 1
    lj = jax.tree.map(jnp.asarray, layout)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
    np.testing.assert_allclose(np.asarray(spmm_banded_residual_apply(x, lj, False)),
                               want, rtol=1e-5, atol=1e-5)


def test_rejects_non_banded(rng):
    n = 1024
    src = rng.integers(0, n, 8 * n)
    dst = rng.integers(0, n, 8 * n)
    with pytest.raises(ValueError, match="not near-banded"):
        prepare_banded_residual_mean_aggregate(src, dst, n, tile=32, max_span=4)


def test_auto_selection_lands_on_residual_tier(rng):
    """prepare_auto_mean_aggregate: a near-banded graph (tight band +
    outliers) gets the residual split — the outliers must not widen every
    block's span (pure banded) or force the dense tier."""
    from sldm_gnn_tpu.ops.spmm_hybrid import prepare_auto_mean_aggregate

    n = 3000
    src, dst = _near_banded_graph(rng, n=n)
    fwd, rev, n_pad = prepare_auto_mean_aggregate(src, dst, n, tile=64)
    assert isinstance(fwd, BandedResidualLayout)
    assert rev is None
    assert fwd.banded_fwd.s_span < 20  # span stayed tight


@pytest.mark.slow
def test_blocked_model_through_residual_layout(rng):
    """BlockedSageClassifier forward+grad over the residual layout, fused
    and unfused, against the pure-XLA edge-list aggregation."""
    import flax.linen as nn
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageClassifier

    n, tile, k, d = 1200, 64, 4, 12
    src, dst = _near_banded_graph(rng, n=n, deg=4, reach=60, n_outliers=15)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=3)
    assert len(layout.r_src) > 0
    lj = jax.tree.map(jnp.asarray, layout)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    model = BlockedSageClassifier(hidden_dims=(16, 16), num_classes=3,
                                  use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), x, lj, None, n_pad)

    def loss(p, blocked):
        return jnp.sum(model.apply(p, x, blocked, None, n_pad) ** 2)

    # reference: same params through the one-hot blocked path
    from sldm_gnn_tpu.ops.spmm import prepare_mean_aggregate

    of, orv, n_pad2 = prepare_mean_aggregate(src, dst, n_pad)
    assert n_pad2 == n_pad
    ofj, orvj = jax.tree.map(jnp.asarray, (of, orv))
    ref_model = BlockedSageClassifier(hidden_dims=(16, 16), num_classes=3,
                                      use_pallas=False)
    want = np.asarray(ref_model.apply(params, x, ofj, orvj, n_pad))
    got = np.asarray(model.apply(params, x, lj, None, n_pad))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    g = jax.grad(loss)(params, lj)
    g_ref = jax.grad(lambda p: jnp.sum(ref_model.apply(p, x, ofj, orvj, n_pad) ** 2))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3), g, g_ref)

    # fused variant (XLA composition path) matches too
    fused_model = BlockedSageClassifier(hidden_dims=(16, 16), num_classes=3,
                                        use_pallas=False, fused=True)
    got_f = np.asarray(fused_model.apply(params, x, lj, None, n_pad))
    np.testing.assert_allclose(got_f, want, rtol=1e-4, atol=1e-4)


def test_window_choice_beats_min_base(rng):
    """The per-block densest-window choice keeps more edges in-band than
    the min-source base would for blocks with a sparse low tail."""
    n, tile = 512, 32
    # block 0 dst nodes with sources mostly near n-1 plus one source at 0
    dst = np.zeros(64, np.int64)
    src = np.concatenate([[0], rng.integers(n - 64, n, 63)]).astype(np.int64)
    keep = split_banded_residual(src, dst, n // tile, tile=tile, span=2)
    assert keep.sum() == 63  # the lone far source is the residual
    assert not keep[0]


def _ln_ref(x, wl, wr, b, gamma, beta, lj, slope, eps=1e-5):
    y = spmm_banded_residual_apply(x, lj, False) @ wl + x @ wr
    if b is not None:
        y = y + b
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return jnp.where(z > 0, z, slope * z)


@pytest.mark.parametrize("slope", [0.0, 0.1])
@pytest.mark.slow
def test_ln_fused_with_residual(rng, slope):
    """banded_residual_sage_ln_apply: XLA fallback at tight tolerance and
    interpreted-kernel fwd+bwd (LN-fused forward, fuse_dw reverse with
    compact residual) at kernel bf16 tolerance."""
    from sldm_gnn_tpu.ops.banded_residual import banded_residual_sage_ln_apply

    n, tile, k, d, h = 2000, 64, 4, 16, 24
    src, dst = _near_banded_graph(rng, n=n, n_outliers=25)
    layout, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    lj = jax.tree.map(jnp.asarray, layout)
    r2 = np.random.default_rng(5)
    x = jnp.asarray(r2.standard_normal((n_pad, d)).astype(np.float32))
    wl = jnp.asarray(r2.standard_normal((d, h)).astype(np.float32) * 0.2)
    wr = jnp.asarray(r2.standard_normal((d, h)).astype(np.float32) * 0.2)
    b = jnp.asarray(r2.standard_normal((h,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(1.0 + 0.2 * r2.standard_normal(h).astype(np.float32))
    beta = jnp.asarray(0.1 * r2.standard_normal(h).astype(np.float32))

    want = np.asarray(_ln_ref(x, wl, wr, b, gamma, beta, lj, slope))
    got = np.asarray(banded_residual_sage_ln_apply(
        x, wl, wr, b, gamma, beta, lj, False, slope))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    args = (x, wl, wr, b, gamma, beta)
    got_g = jax.grad(
        lambda *a: jnp.sum(banded_residual_sage_ln_apply(
            *a, lj, True, slope, 1e-5, True) ** 2),
        argnums=tuple(range(6)))(*args)
    want_g = jax.grad(
        lambda *a: jnp.sum(_ln_ref(*a, lj, slope) ** 2),
        argnums=tuple(range(6)))(*args)
    for g, w_, name in zip(got_g, want_g,
                           ("dx", "dwl", "dwr", "db", "dgamma", "dbeta")):
        g, w_ = np.asarray(g), np.asarray(w_)
        scale = np.abs(w_).max() + 1e-9
        assert np.abs(g - w_).max() / scale < 6e-2, name


def test_count_cap_spills_multiplicity(rng):
    """count_cap=7: duplicated (src, dst) pairs beyond the cap move to the
    residual; banded tiles become int4-safe and the aggregation stays
    EXACT (vs the uncapped layout and the edge-list reference)."""
    from sldm_gnn_tpu.graph.csr import mean_weights
    from sldm_gnn_tpu.ops.spmm_banded import counts_to_int4, int4_count_safe

    n, tile, k, d = 1500, 64, 4, 8
    src, dst = _near_banded_graph(rng, n=n, n_outliers=10)
    # inject heavy multi-edges: one pair repeated 12x, another 9x
    src = np.concatenate([src, np.full(12, 100), np.full(9, 700)])
    dst = np.concatenate([dst, np.full(12, 103), np.full(9, 698)])
    cap, n_pad = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4, count_cap=7)
    unc, _ = prepare_banded_residual_mean_aggregate(
        src, dst, n, tile=tile, k=k, span=4)
    assert int(np.asarray(unc.banded_fwd.a).max()) > 7  # the artifact exists
    assert int4_count_safe(cap.banded_fwd) and int4_count_safe(cap.banded_rev)
    assert len(cap.r_src) > len(unc.r_src)  # excess copies spilled

    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    w = jnp.asarray(mean_weights(dst, n_pad))
    want = np.asarray(spmm_xla(x, jnp.asarray(src), jnp.asarray(dst), w, n_pad))
    got = np.asarray(spmm_banded_residual_apply(
        x, jax.tree.map(jnp.asarray, cap), False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # in-trace int4 view of the capped banded halves: same integer math
    # (ulp-level differences only — XLA reassociates the f32 sums around
    # the convert; the Pallas kernel path measured bit-exact on chip)
    lj = jax.tree.map(jnp.asarray, cap)
    import dataclasses
    got4 = np.asarray(jax.jit(lambda x: spmm_banded_residual_apply(
        x, dataclasses.replace(
            lj, banded_fwd=counts_to_int4(lj.banded_fwd),
            banded_rev=counts_to_int4(lj.banded_rev)), False))(x))
    np.testing.assert_allclose(got4, got, rtol=1e-6, atol=1e-6)
