"""Column-tile-indirect banded tier (ops/spmm_cmap.py): exactness of the
layout split, parity with the dense mean aggregation, Pallas interpret
parity for the plain and fused (epilogue/LN) kernels, and the A-bytes
win over the contiguous banded layout on a low-degree scattered graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.ops.banded_residual import spmm_banded_residual_apply
from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_pallas, spmm_banded_xla
from sldm_gnn_tpu.ops.spmm_cmap import prepare_cmap_residual_mean_aggregate


def _low_degree_graph(rng, n=1024, deg=3, tile=32):
    """deg≈3 graph whose per-block sources are FEW but SCATTERED tiles —
    a contiguous band would need a wide span, the kept tile set is tiny."""
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    # each destination block draws its sources from 4 preferred tiles
    # scattered over a +-8-tile neighbourhood (local both directions,
    # like an RCM/Hilbert-ordered map, but NOT contiguous)
    nb = n // tile
    prefs = np.clip(np.arange(nb)[:, None] + rng.integers(-8, 9, (nb, 4)),
                    0, nb - 1)
    pick = prefs[dst // tile, rng.integers(0, 4, len(dst))]
    src = np.clip(pick * tile + rng.integers(0, tile, len(dst)), 0, n - 1)
    return src.astype(np.int64), dst


def _dense_mean(src, dst, x, n):
    deg = np.bincount(dst, minlength=n)
    out = np.zeros((n, x.shape[1]), np.float32)
    np.add.at(out, dst, x[src] / np.maximum(deg, 1)[dst, None])
    return out


def test_cmap_layout_exact_mean(rng):
    n, tile = 1024, 32
    src, dst = _low_degree_graph(rng, n=n, tile=tile)
    layout, n_pad = prepare_cmap_residual_mean_aggregate(
        src, dst, n, tile=tile, k=2, range_budget=24, resid_frac=0.02)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    xp = np.zeros((n_pad, 16), np.float32)
    xp[:n] = x
    out = spmm_banded_residual_apply(jnp.asarray(xp), layout, False)
    want = _dense_mean(src, dst, x, n)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=1e-5,
                               atol=1e-5)
    # the tier's raison d'être: far fewer slots than the contiguous span
    # the same graph would force (scattered tiles over a wide range)
    db, sb = dst // tile, src // tile
    bo = np.zeros(n_pad // tile, np.int64)
    hi = np.zeros_like(bo)
    np.minimum.at(bo, db, sb)
    np.maximum.at(hi, db, sb)
    forced_span = int((hi - bo + 1).max())
    assert layout.banded_fwd.s_span <= 6 < forced_span


def test_cmap_transpose_is_exact(rng):
    """The reverse cmap layout is the exact transpose: Aᵀ via the rev
    blocks (+ residual) equals the numpy transpose aggregate."""
    n, tile = 512, 32
    src, dst = _low_degree_graph(rng, n=n, tile=tile)
    layout, n_pad = prepare_cmap_residual_mean_aggregate(
        src, dst, n, tile=tile, k=2, range_budget=24, resid_frac=0.02)
    x = rng.standard_normal((n_pad, 8)).astype(np.float32)
    # VJP of the mean aggregation = transpose with the same weights
    f = lambda v: jnp.sum(
        spmm_banded_residual_apply(v, layout, False) * jnp.asarray(x))
    g = jax.grad(f)(jnp.asarray(x))
    deg = np.bincount(dst, minlength=n_pad)
    want = np.zeros((n_pad, 8), np.float32)
    np.add.at(want, src, x[dst] / np.maximum(deg, 1)[dst, None])
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)


def test_cmap_pallas_interpret_parity(rng):
    """spmm_banded_pallas on a cmap'd forward layout (interpret) == XLA."""
    n, tile = 512, 32
    src, dst = _low_degree_graph(rng, n=n, tile=tile)
    layout, n_pad = prepare_cmap_residual_mean_aggregate(
        src, dst, n, tile=tile, k=2, range_budget=24, resid_frac=0.02)
    x = jnp.asarray(rng.standard_normal((n_pad, 16)).astype(np.float32))
    want = spmm_banded_xla(x, layout.banded_fwd)
    got = spmm_banded_pallas(x, layout.banded_fwd, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # reverse (col_scale) direction too
    wantr = spmm_banded_xla(x, layout.banded_rev)
    gotr = spmm_banded_pallas(x, layout.banded_rev, interpret=True)
    np.testing.assert_allclose(np.asarray(gotr), np.asarray(wantr),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["fused", "fused_ln"])
def test_cmap_fused_kernels_interpret(rng, mode):
    """The fused SAGE / SAGE+LN layers over cmap'd layouts: Pallas
    interpret fwd+VJP parity vs the XLA fallback."""
    from sldm_gnn_tpu.ops.banded_residual import (
        banded_residual_sage_apply,
        banded_residual_sage_ln_apply,
    )

    n, tile, d, h = 512, 32, 12, 16
    src, dst = _low_degree_graph(rng, n=n, tile=tile)
    layout, n_pad = prepare_cmap_residual_mean_aggregate(
        src, dst, n, tile=tile, k=2, range_budget=24, resid_frac=0.02)
    xp = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    wl = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    wr = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(
        rng.standard_normal((h,)).astype(np.float32) * 0.3 + 1.0)
    beta = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)

    if mode == "fused":
        def f(use_pallas, *args):
            return banded_residual_sage_apply(
                *args, layout, use_pallas, 0.1, use_pallas)
        args = (xp, wl, wr, b)
        names = ("dx", "dwl", "dwr", "db")
    else:
        def f(use_pallas, *args):
            return banded_residual_sage_ln_apply(
                *args, layout, use_pallas, 0.1, 1e-5, use_pallas)
        args = (xp, wl, wr, b, gamma, beta)
        names = ("dx", "dwl", "dwr", "db", "dgamma", "dbeta")

    def run(use_pallas):
        out = f(use_pallas, *args)
        grads = jax.grad(
            lambda *a: jnp.sum(f(use_pallas, *a) ** 2),
            argnums=tuple(range(len(args))))(*args)
        return out, grads

    out_x, g_x = run(False)
    out_k, g_k = run(True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-2, atol=3e-2)
    for a, bb, name in zip(g_k, g_x, names):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        assert np.abs(a - bb).max() / scale < 5e-2, name


def test_cmap_count_cap_spills_multiplicity(rng):
    """count_cap=7 keeps counts int4-safe by spilling excess copies of
    duplicated edges into the residual — math stays exact."""
    n, tile = 256, 32
    src, dst = _low_degree_graph(rng, n=n, tile=tile)
    # duplicate one edge 12 times
    src = np.concatenate([src, np.full(12, int(src[0]), np.int64)])
    dst = np.concatenate([dst, np.full(12, int(dst[0]), np.int64)])
    layout, n_pad = prepare_cmap_residual_mean_aggregate(
        src, dst, n, tile=tile, k=2, range_budget=24, resid_frac=0.05,
        count_cap=7)
    assert int(np.asarray(layout.banded_fwd.a).max()) <= 7
    x = rng.standard_normal((n, 8)).astype(np.float32)
    xp = np.zeros((n_pad, 8), np.float32)
    xp[:n] = x
    out = spmm_banded_residual_apply(jnp.asarray(xp), layout, False)
    want = _dense_mean(src, dst, x, n)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=1e-5,
                               atol=1e-5)
