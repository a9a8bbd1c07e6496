"""Low-degree banded-gather tier (ops/spmm_gather.py): exact mean
aggregation on skewed low-degree graphs (window + slot-cap spills into the
compact residual), Pallas-interpret parity, VJP transpose parity, and the
slot-cap/window invariants of the host builder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.ops.spmm_gather import (
    GatherBlocks,
    prepare_gather_residual_mean_aggregate,
    spmm_gather_pallas,
    spmm_gather_residual_apply,
    spmm_gather_xla,
)


def _city_like(rng, n=3000, reach=150, skew=0.005, skew_extra=12):
    deg = rng.poisson(3, n) + 1
    deg[rng.random(n) < skew] += skew_extra
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, len(dst)), 0, n - 1)
    return src, dst


def _dense_mean(src, dst, x, n_pad):
    deg = np.bincount(dst, minlength=n_pad)
    out = np.zeros((n_pad, x.shape[1]), np.float32)
    np.add.at(out, dst, x[src] / np.maximum(deg, 1)[dst, None])
    return out


def test_gather_residual_exact_mean(rng):
    src, dst = _city_like(rng)
    layout, n_pad = prepare_gather_residual_mean_aggregate(
        src, dst, 3000, tile=64, k=2)
    x = rng.standard_normal((n_pad, 16)).astype(np.float32)
    lj = jax.tree.map(jnp.asarray, layout)
    got = np.asarray(spmm_gather_residual_apply(jnp.asarray(x), lj, False))
    want = _dense_mean(src, dst, x, n_pad)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert layout.resid_frac < 0.08


def test_gather_pallas_interpret_matches_xla(rng):
    src, dst = _city_like(rng, n=1500)
    layout, n_pad = prepare_gather_residual_mean_aggregate(
        src, dst, 1500, tile=64, k=2)
    x = jnp.asarray(rng.standard_normal((n_pad, 16)).astype(np.float32))
    fwd = jax.tree.map(jnp.asarray, layout.gather_fwd)
    got = np.asarray(spmm_gather_pallas(x, fwd, interpret=True))
    want = np.asarray(spmm_gather_xla(x, fwd))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gather_vjp_is_exact_transpose(rng):
    src, dst = _city_like(rng, n=1200)
    layout, n_pad = prepare_gather_residual_mean_aggregate(
        src, dst, 1200, tile=64, k=2)
    lj = jax.tree.map(jnp.asarray, layout)
    g = rng.standard_normal((n_pad, 8)).astype(np.float32)
    x0 = jnp.asarray(rng.standard_normal((n_pad, 8)).astype(np.float32))
    t = jax.vjp(lambda xx: spmm_gather_residual_apply(xx, lj, False),
                x0)[1](jnp.asarray(g))[0]
    deg = np.bincount(dst, minlength=n_pad)
    want = np.zeros((n_pad, 8), np.float32)
    np.add.at(want, src, g[dst] / np.maximum(deg, 1)[dst, None])
    np.testing.assert_allclose(np.asarray(t), want, rtol=1e-5, atol=1e-5)


def test_multi_edges_fold_into_mult(rng):
    """Duplicate (src, dst) pairs fold into the mult array — the gather
    layout stays exact for multigraphs."""
    n = 256
    base_src = rng.integers(0, n, 600)
    base_dst = rng.integers(0, n, 600)
    src = np.concatenate([base_src, base_src[:100]])  # duplicates
    dst = np.concatenate([base_dst, base_dst[:100]])
    # keep it banded
    src = np.clip(dst + (src - dst) % 80 - 40, 0, n - 1)
    layout, n_pad = prepare_gather_residual_mean_aggregate(
        src, dst, n, tile=32, k=2)
    x = rng.standard_normal((n_pad, 8)).astype(np.float32)
    got = np.asarray(spmm_gather_residual_apply(
        jnp.asarray(x), jax.tree.map(jnp.asarray, layout), False))
    want = _dense_mean(src, dst, x, n_pad)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slot_cap_and_window_invariants(rng):
    src, dst = _city_like(rng, n=2000)
    layout, n_pad = prepare_gather_residual_mean_aggregate(
        src, dst, 2000, tile=64, k=2)
    for blocks in (layout.gather_fwd, layout.gather_rev):
        n_g = -(-blocks.r // blocks.wsz)
        assert blocks.codes.shape == (
            blocks.num_dst_blocks, n_g * blocks.wsz * blocks.tile, 1)
        assert (np.asarray(blocks.codes) >= 0).all()
        assert (np.asarray(blocks.codes) < blocks.wsz * blocks.tile).all()
        # padding slots carry zero mult
        assert (np.asarray(blocks.mult) >= 0).all()
    # residual + gather edges account for every input edge (by multiplicity)
    kept_m = float(np.asarray(layout.gather_fwd.mult).sum())
    resid_e = len(np.asarray(layout.r_src))
    # residual arrays may carry zero-weight padding only if empty
    assert kept_m + resid_e == len(src)


def test_not_near_banded_raises(rng):
    src = rng.integers(0, 4000, 12000)
    dst = rng.integers(0, 4000, 12000)
    with pytest.raises(ValueError):
        prepare_gather_residual_mean_aggregate(src, dst, 4000, tile=64, k=2,
                                               max_span=4)
