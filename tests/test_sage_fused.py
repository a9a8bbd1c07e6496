"""Fused banded SAGE layer (ops/sage_fused.py): forward parity against the
unfused composition, VJP parity against autodiff of the unfused math, and
model-level dispatch through BlockedSageConv(fused=True)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.ops.spmm_banded import (
    prepare_banded_mean_aggregate,
    spmm_banded_apply,
)
from sldm_gnn_tpu.ops.sage_fused import banded_sage_apply, banded_sage_fwd_pallas


def _banded_graph(rng, n=2000, deg=6, reach=90):
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


def _setup(rng, n=2000, d=16, h=24, tile=64, k=4):
    src, dst = _banded_graph(rng, n=n)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=k)
    fj, rj = jax.tree.map(jnp.asarray, (fwd, rev))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    wl = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    wr = jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((h,)).astype(np.float32) * 0.1)
    return fj, rj, x, wl, wr, b


def _unfused(x, wl, wr, b, fj, rj, slope):
    y = spmm_banded_apply(x, fj, rj, False) @ wl + x @ wr
    if b is not None:
        y = y + b
    if slope is not None:
        y = jnp.where(y > 0, y, slope * y)
    return y


@pytest.mark.parametrize("slope", [None, 0.0, 0.1])
@pytest.mark.parametrize("bias", [True, False])
def test_fused_forward_matches_unfused(rng, slope, bias):
    fj, rj, x, wl, wr, b = _setup(rng)
    b = b if bias else None
    want = np.asarray(_unfused(x, wl, wr, b, fj, rj, slope))
    got_xla = np.asarray(banded_sage_apply(x, wl, wr, b, fj, rj, False, slope))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-5)
    got_k = np.asarray(banded_sage_fwd_pallas(
        x, wl, wr, b, fj, negative_slope=slope, interpret=True))
    # kernel rounds MXU operands to bf16 (DEFAULT-precision invariant)
    np.testing.assert_allclose(got_k, want, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("slope", [None, 0.1])
def test_fused_vjp_matches_autodiff(rng, slope):
    fj, rj, x, wl, wr, b = _setup(rng)
    t = jnp.asarray(np.random.default_rng(7).standard_normal(
        (x.shape[0], wl.shape[1])).astype(np.float32))

    def loss_fused(x, wl, wr, b):
        return jnp.sum(banded_sage_apply(x, wl, wr, b, fj, rj, False, slope) * t)

    def loss_ref(x, wl, wr, b):
        return jnp.sum(_unfused(x, wl, wr, b, fj, rj, slope) * t)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wl, wr, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wl, wr, b)
    for a, want, name in zip(g_f, g_r, ("dx", "dwl", "dwr", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_vjp_none_bias(rng):
    fj, rj, x, wl, wr, _ = _setup(rng)
    g = jax.grad(lambda x, wl: jnp.sum(
        banded_sage_apply(x, wl, wr, None, fj, rj, False, 0.0) ** 2))(x, wl)
    assert all(np.isfinite(np.asarray(a)).all() for a in g)


def test_fused_kernel_interpret_full_pipeline(rng):
    """Interpreted Pallas kernel through the custom VJP wrapper: forward and
    backward both ride the kernels (fwd fused, bwd reverse-banded)."""
    fj, rj, x, wl, wr, b = _setup(rng, d=16, h=16)

    def loss(x, wl, wr, b):
        y = banded_sage_apply(x, wl, wr, b, fj, rj, True, 0.0, True)
        return jnp.sum(y ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(x, wl, wr, b)
    ref_val, ref_grads = jax.value_and_grad(
        lambda x, wl, wr, b: jnp.sum(_unfused(x, wl, wr, b, fj, rj, 0.0) ** 2),
        argnums=(0, 1, 2, 3))(x, wl, wr, b)
    rel = abs(float(val) - float(ref_val)) / (abs(float(ref_val)) + 1e-9)
    assert rel < 3e-2, (val, ref_val)
    for a, want, name in zip(grads, ref_grads, ("dx", "dwl", "dwr", "db")):
        a, want = np.asarray(a), np.asarray(want)
        scale = np.abs(want).max() + 1e-9
        assert np.abs(a - want).max() / scale < 5e-2, name


def test_fused_bf16_storage(rng):
    """bf16 x + bf16 params (the bench configuration): fused output stays
    within bf16 tolerance of the f32 unfused math."""
    fj, rj, x, wl, wr, b = _setup(rng, d=32, h=32)
    want = np.asarray(_unfused(x, wl, wr, b, fj, rj, 0.0))
    xb, wlb, wrb, bb = (a.astype(jnp.bfloat16) for a in (x, wl, wr, b))
    got = np.asarray(banded_sage_fwd_pallas(
        xb, wlb, wrb, bb, fj, negative_slope=0.0, interpret=True)
    ).astype(np.float32)
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 5e-2


def test_fused_bwd_kernel_matches_composition(rng):
    """banded_sage_bwd_pallas == (scale pre-pass + reverse agg, then the
    two dx matmuls) to kernel bf16 tolerance."""
    from sldm_gnn_tpu.ops.sage_fused import banded_sage_bwd_pallas
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_xla

    fj, rj, x, wl, wr, _ = _setup(rng, d=16, h=24)
    gq = jnp.asarray(np.random.default_rng(3).standard_normal(
        (x.shape[0], wl.shape[1])).astype(np.float32))
    t_want = np.asarray(spmm_banded_xla(gq, rj))
    dx_want = t_want @ np.asarray(wl).T + np.asarray(gq) @ np.asarray(wr).T
    t, dx = banded_sage_bwd_pallas(gq, wl, wr, rj, interpret=True)
    scale = np.abs(t_want).max() + 1e-9
    assert np.abs(np.asarray(t) - t_want).max() / scale < 3e-2
    scale = np.abs(dx_want).max() + 1e-9
    assert np.abs(np.asarray(dx) - dx_want).max() / scale < 3e-2


def test_fused_bwd_kernel_fuse_dw(rng):
    """banded_sage_bwd_pallas(x=...) returns (dx, dwl, dwr) matching the
    composition (t = Âᵀg̃; dwl = xᵀt; dwr = xᵀg̃) — t never leaves the
    kernel."""
    from sldm_gnn_tpu.ops.sage_fused import banded_sage_bwd_pallas
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_xla

    fj, rj, x, wl, wr, _ = _setup(rng, d=16, h=24)
    gq = jnp.asarray(np.random.default_rng(3).standard_normal(
        (x.shape[0], wl.shape[1])).astype(np.float32))
    t_want = np.asarray(spmm_banded_xla(gq, rj))
    dx_want = t_want @ np.asarray(wl).T + np.asarray(gq) @ np.asarray(wr).T
    dwl_want = np.asarray(x).T @ t_want
    dwr_want = np.asarray(x).T @ np.asarray(gq)
    dx, dwl, dwr = banded_sage_bwd_pallas(gq, wl, wr, rj, x=x, interpret=True)
    for got, want, name in ((dx, dx_want, "dx"), (dwl, dwl_want, "dwl"),
                            (dwr, dwr_want, "dwr")):
        scale = np.abs(want).max() + 1e-9
        assert np.abs(np.asarray(got) - want).max() / scale < 3e-2, name


def _ln_ref(x, wl, wr, b, gamma, beta, fj, rj, slope, eps=1e-5):
    """Plain-AD composition: conv -> LayerNorm(eps) -> (Leaky)ReLU."""
    y = spmm_banded_apply(x, fj, rj, False) @ wl + x @ wr
    if b is not None:
        y = y + b
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return jnp.where(z > 0, z, slope * z)


@pytest.mark.parametrize("slope", [0.0, 0.1])
def test_ln_fused_forward_matches_composition(rng, slope):
    from sldm_gnn_tpu.ops.sage_fused import banded_sage_ln_apply, banded_sage_fwd_pallas

    fj, rj, x, wl, wr, b = _setup(rng)
    h = wl.shape[1]
    r2 = np.random.default_rng(5)
    gamma = jnp.asarray(1.0 + 0.2 * r2.standard_normal(h).astype(np.float32))
    beta = jnp.asarray(0.1 * r2.standard_normal(h).astype(np.float32))
    want = np.asarray(_ln_ref(x, wl, wr, b, gamma, beta, fj, rj, slope))
    got_xla = np.asarray(banded_sage_ln_apply(
        x, wl, wr, b, gamma, beta, fj, rj, False, slope))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-4)
    out_k, xhat_k, rstd_k = banded_sage_fwd_pallas(
        x, wl, wr, b, fj, negative_slope=slope, ln=(gamma, beta),
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), want, rtol=3e-2, atol=3e-2)
    assert xhat_k.shape == x.shape[:1] + (h,) and rstd_k.shape == (x.shape[0], 1)


@pytest.mark.parametrize("slope", [0.0, 0.1])
def test_ln_fused_vjp_matches_autodiff(rng, slope):
    from sldm_gnn_tpu.ops.sage_fused import banded_sage_ln_apply

    fj, rj, x, wl, wr, b = _setup(rng)
    h = wl.shape[1]
    r2 = np.random.default_rng(5)
    gamma = jnp.asarray(1.0 + 0.2 * r2.standard_normal(h).astype(np.float32))
    beta = jnp.asarray(0.1 * r2.standard_normal(h).astype(np.float32))
    t = jnp.asarray(np.random.default_rng(7).standard_normal(
        (x.shape[0], h)).astype(np.float32))

    def loss_f(x, wl, wr, b, gamma, beta):
        return jnp.sum(banded_sage_ln_apply(
            x, wl, wr, b, gamma, beta, fj, rj, False, slope) * t)

    def loss_r(x, wl, wr, b, gamma, beta):
        return jnp.sum(_ln_ref(x, wl, wr, b, gamma, beta, fj, rj, slope) * t)

    g_f = jax.grad(loss_f, argnums=tuple(range(6)))(x, wl, wr, b, gamma, beta)
    g_r = jax.grad(loss_r, argnums=tuple(range(6)))(x, wl, wr, b, gamma, beta)
    for a, want, name in zip(g_f, g_r,
                             ("dx", "dwl", "dwr", "db", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


@pytest.mark.slow
def test_ln_fused_kernel_full_pipeline(rng):
    """Interpreted kernels end-to-end: LN-fused forward + fuse_dw reverse
    through the custom VJP, against plain-AD composition."""
    from sldm_gnn_tpu.ops.sage_fused import banded_sage_ln_apply

    fj, rj, x, wl, wr, b = _setup(rng, d=16, h=16)
    h = wl.shape[1]
    r2 = np.random.default_rng(5)
    gamma = jnp.asarray(1.0 + 0.2 * r2.standard_normal(h).astype(np.float32))
    beta = jnp.asarray(0.1 * r2.standard_normal(h).astype(np.float32))

    def loss(x, wl, wr, b, gamma, beta):
        y = banded_sage_ln_apply(x, wl, wr, b, gamma, beta, fj, rj,
                                 True, 0.0, 1e-5, True)
        return jnp.sum(y ** 2)

    val, grads = jax.value_and_grad(loss, argnums=tuple(range(6)))(
        x, wl, wr, b, gamma, beta)
    ref_val, ref_grads = jax.value_and_grad(
        lambda *a: jnp.sum(_ln_ref(*a, fj, rj, 0.0) ** 2),
        argnums=tuple(range(6)))(x, wl, wr, b, gamma, beta)
    rel = abs(float(val) - float(ref_val)) / (abs(float(ref_val)) + 1e-9)
    assert rel < 3e-2, (val, ref_val)
    for a, want, name in zip(grads, ref_grads,
                             ("dx", "dwl", "dwr", "db", "dgamma", "dbeta")):
        a, want = np.asarray(a), np.asarray(want)
        scale = np.abs(want).max() + 1e-9
        assert np.abs(a - want).max() / scale < 6e-2, name


def test_blocked_sage_fused_dispatch(rng):
    """BlockedSageConv(fused=True) produces the same params tree as the
    unfused layer (checkpoint-compatible) and matching outputs."""
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageConv

    fj, rj, x, _, _, _ = _setup(rng, d=16, h=16)
    n_pad = x.shape[0]
    m_u = BlockedSageConv(16, use_pallas=False, fused=False)
    m_f = BlockedSageConv(16, use_pallas=False, fused=True)
    params = m_u.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    params_f = m_f.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(params_f)):
        assert a.shape == bb.shape
    out_u = np.asarray(m_u.apply(params, x, fj, rj, n_pad))
    out_f = np.asarray(m_f.apply(params, x, fj, rj, n_pad))
    np.testing.assert_allclose(out_f, out_u, rtol=1e-5, atol=1e-5)
    # and gradients flow
    g = jax.grad(lambda p: jnp.sum(m_f.apply(p, x, fj, rj, n_pad) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_blocked_sage_fused_ln_dispatch(rng):
    """BlockedSageBlock(fused_ln=True): identical params tree to the
    unfused block (conv{i} + norm{i}) and matching outputs on the XLA
    path; gradients flow through every param."""
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageBlock

    fj, rj, x, _, _, _ = _setup(rng, d=16, h=16)
    n_pad = x.shape[0]
    m_u = BlockedSageBlock((16, 16), use_pallas=False, fused=False)
    m_f = BlockedSageBlock((16, 16), use_pallas=False, fused=True, fused_ln=True)
    params = m_u.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    params_f = m_f.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    out_u = np.asarray(m_u.apply(params, x, fj, rj, n_pad))
    out_f = np.asarray(m_f.apply(params, x, fj, rj, n_pad))
    np.testing.assert_allclose(out_f, out_u, rtol=1e-4, atol=1e-4)
    g = jax.grad(lambda p: jnp.sum(m_f.apply(p, x, fj, rj, n_pad) ** 2))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # at least one LN gradient is nonzero (the norm params are live)
    import flax
    flat = flax.traverse_util.flatten_dict(g["params"] if "params" in g else g)
    norm_leaves = [v for k, v in flat.items() if any("norm" in p for p in k)]
    assert norm_leaves and any(float(np.abs(np.asarray(v)).max()) > 0
                               for v in norm_leaves)


def test_blocked_sage_fused_ln_nonbanded_fallback(rng):
    """fused_ln with a NON-banded layout (one-hot BlockedEdges): the conv
    falls back to plain XLA math with the same params and still matches
    the unfused block."""
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageBlock
    from sldm_gnn_tpu.ops.spmm import prepare_mean_aggregate

    src, dst = _banded_graph(rng, n=600)
    bf, br, n_pad = prepare_mean_aggregate(src, dst, 600, step_chunks=1)
    bf, br = jax.tree.map(jnp.asarray, (bf, br))
    x = jnp.asarray(rng.standard_normal((n_pad, 16)).astype(np.float32))
    m_u = BlockedSageBlock((16,), use_pallas=False, fused=False)
    m_f = BlockedSageBlock((16,), use_pallas=False, fused=True, fused_ln=True)
    params = m_u.init(jax.random.PRNGKey(0), x, bf, br, n_pad)
    out_u = np.asarray(m_u.apply(params, x, bf, br, n_pad))
    out_f = np.asarray(m_f.apply(params, x, bf, br, n_pad))
    np.testing.assert_allclose(out_f, out_u, rtol=1e-4, atol=1e-4)
