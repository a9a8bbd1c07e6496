"""Fused kernels inside the halo-sharded path (parallel/halo_fused.py):
step-level parity between the fused_ln / fused halo classifiers and the
unfused halo model on the 8-device virtual mesh (identical params, XLA
paths bit-comparable), plus standalone kernel parity of the fused layer
with the boundary resid operand under Pallas interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.parallel.halo import plan_halo_blocked
from sldm_gnn_tpu.parallel.halo_fused import (
    boundary_fwd_compact,
    halo_fused_sage,
    halo_fused_sage_ln,
    plan_halo_fused,
)
from sldm_gnn_tpu.parallel.halo_model import (
    HaloDims,
    HaloSageClassifier,
    build_halo_step_fns,
    shard_node_array,
)
from sldm_gnn_tpu.parallel.mesh import make_mesh
from sldm_gnn_tpu.train.loop import TrainState, make_optimizer


def local_graph(n, deg, reach, seed=0):
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


def _setup(n=96, deg=4, d=12, ncls=3, hidden=(16, 16), ep=8):
    src, dst = local_graph(n, deg, reach=10)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n)
    mask = np.ones(n, np.float32)
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    plan_u = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16,
                               backend="banded", banded_k=2)
    plan_f = plan_halo_fused(src, dst, n, ep, tile=8, banded_k=2)
    return src, dst, x, y, mask, mesh, plan_u, plan_f


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fused_ln", "fused"])
def test_halo_fused_step_matches_unfused(mode):
    """Same init params, 3 Adam steps: losses and trained params agree
    between the fused and unfused halo classifiers (both XLA fallback on
    the virtual mesh — same f32 math, so tolerances are tight)."""
    n, ncls, hidden = 96, 3, (16, 16)
    src, dst, x, y, mask, mesh, plan_u, plan_f = _setup(n=n, ncls=ncls,
                                                       hidden=hidden)
    ep = plan_u.send_idx.shape[0]
    kw = dict(hidden_dims=hidden, num_classes=ncls, negative_slope=0.1,
              use_pallas=False)
    model_u = HaloSageClassifier(dims=HaloDims.of(plan_u), **kw)
    model_f = HaloSageClassifier(dims=HaloDims.of(plan_f),
                                 fused_ln=mode == "fused_ln",
                                 fused=mode == "fused", **kw)

    opt = make_optimizer(1e-2, 0.0)
    fns_u = build_halo_step_fns(model_u, opt, mesh, plan_u)
    fns_f = build_halo_step_fns(model_f, opt, mesh, plan_f)

    x_stack = jax.device_put(shard_node_array(x, ep, plan_u.n_local),
                             fns_u.node_sharding)
    y_stack = jax.device_put(
        shard_node_array(y.astype(np.int32), ep, plan_u.n_local),
        fns_u.node_sharding)
    m_stack = jax.device_put(shard_node_array(mask, ep, plan_u.n_local),
                             fns_u.node_sharding)

    state_u = fns_u.init(jax.random.PRNGKey(0), x_stack)
    # identical initial params: the trees are name-compatible
    state_f = TrainState(
        params=jax.device_put(state_u.params, fns_f.repl_sharding),
        opt_state=jax.device_put(state_u.opt_state, fns_f.repl_sharding),
        step=state_u.step)

    for _ in range(3):
        state_u, mu = fns_u.train_step(state_u, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        state_f, mf = fns_f.train_step(state_f, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        np.testing.assert_allclose(float(mf["loss"]), float(mu["loss"]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_u.params)),
                    jax.tree.leaves(jax.device_get(state_f.params))):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-5)


def _one_shard_setup(rng, ep=2, n=512, deg=4, reach=40, d=16, h=24, p=0):
    """Extract shard p's unstacked fused layouts + its received halo table
    (built host-side from send_idx) for standalone kernel-level tests."""
    src, dst = local_graph(n, deg, reach, seed=2)
    plan = plan_halo_fused(src, dst, n, ep, tile=64, banded_k=2)
    unstack = lambda t: jax.tree.map(lambda a: jnp.asarray(a[p]), t)
    int_fwd = unstack(plan.int_fwd)
    int_rev = unstack(plan.int_rev)
    bnd = unstack(plan.bnd)
    x_global = rng.standard_normal((n, d)).astype(np.float32)
    stacks = shard_node_array(x_global, ep, plan.n_local)
    hm = plan.send_idx.shape[2]
    halo = np.stack([stacks[q][plan.send_idx[q, p]] for q in range(ep)])
    halo = halo.reshape(ep * hm, d)
    xp = np.zeros((plan.n_pad_local, d), np.float32)
    xp[: plan.n_local] = stacks[p]
    wl = rng.standard_normal((d, h)).astype(np.float32) * 0.2
    wr = rng.standard_normal((d, h)).astype(np.float32) * 0.2
    b = rng.standard_normal((h,)).astype(np.float32) * 0.1
    gamma = rng.standard_normal((h,)).astype(np.float32) * 0.3 + 1.0
    beta = rng.standard_normal((h,)).astype(np.float32) * 0.1
    return (plan, int_fwd, int_rev, bnd, jnp.asarray(xp), jnp.asarray(halo),
            jnp.asarray(wl), jnp.asarray(wr), jnp.asarray(b),
            jnp.asarray(gamma), jnp.asarray(beta))


def test_halo_fused_ln_kernel_interpret(rng):
    """Pallas (interpret) vs XLA fallback for the LN-fused halo layer:
    forward and full VJP — validates the boundary partial riding the
    fused kernel's resid operand and the kernel-side LN backward."""
    (plan, int_fwd, int_rev, bnd, xp, halo, wl, wr, b, gamma,
     beta) = _one_shard_setup(rng)

    def run(use_pallas):
        # loss = sum(out²): smooth at the activation boundary, so bf16-
        # level output shifts can't flip act masks into O(1) grad diffs
        def f(xp, halo, wl, wr, b, gamma, beta):
            out = halo_fused_sage_ln(xp, halo, wl, wr, b, gamma, beta,
                                     int_fwd, int_rev, bnd, use_pallas,
                                     0.1, 1e-5, use_pallas)
            return out[: plan.n_local]
        out = f(xp, halo, wl, wr, b, gamma, beta)
        grads = jax.grad(
            lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(7))
        )(xp, halo, wl, wr, b, gamma, beta)
        return out, grads

    out_x, g_x = run(False)
    out_k, g_k = run(True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-2, atol=3e-2)
    for a, bb, name in zip(g_k, g_x,
                           ("dx", "dhalo", "dwl", "dwr", "db", "dgamma",
                            "dbeta")):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        assert np.abs(a - bb).max() / scale < 5e-2, name


def test_halo_fused_kernel_interpret(rng):
    """Pallas (interpret) vs XLA fallback for the epilogue-fused (non-LN)
    halo layer: forward + VJP."""
    (plan, int_fwd, int_rev, bnd, xp, halo, wl, wr, b, _gamma,
     _beta) = _one_shard_setup(rng)

    def run(use_pallas):
        def f(xp, halo, wl, wr, b):
            out = halo_fused_sage(xp, halo, wl, wr, b, int_fwd, int_rev,
                                  bnd, use_pallas, 0.1, use_pallas)
            return out[: plan.n_local]
        out = f(xp, halo, wl, wr, b)
        grads = jax.grad(
            lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(5))
        )(xp, halo, wl, wr, b)
        return out, grads

    out_x, g_x = run(False)
    out_k, g_k = run(True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-2, atol=3e-2)
    for a, bb, name in zip(g_k, g_x, ("dx", "dhalo", "dwl", "dwr", "db")):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        assert np.abs(a - bb).max() / scale < 5e-2, name


def test_boundary_partial_completes_mean(rng):
    """Interior banded aggregate + expanded boundary partial == the exact
    global mean aggregation restricted to one shard's rows."""
    from sldm_gnn_tpu.ops.banded_residual import _expand_compact
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_xla

    n, deg, d, ep, p = 256, 5, 8, 2, 1
    src, dst = local_graph(n, deg, reach=30, seed=4)
    plan = plan_halo_fused(src, dst, n, ep, tile=32, banded_k=2)
    x = rng.standard_normal((n, d)).astype(np.float32)

    deg_full = np.bincount(dst, minlength=n)
    msgs = x[src] / np.maximum(deg_full, 1)[dst, None]
    want = np.zeros((n, d), np.float32)
    np.add.at(want, dst, msgs)

    stacks = shard_node_array(x, ep, plan.n_local)
    hm = plan.send_idx.shape[2]
    halo = np.stack([stacks[q][plan.send_idx[q, p]] for q in range(ep)])
    halo = jnp.asarray(halo.reshape(ep * hm, d))
    xp = np.zeros((plan.n_pad_local, d), np.float32)
    xp[: plan.n_local] = stacks[p]

    unstack = lambda t: jax.tree.map(lambda a: jnp.asarray(a[p]), t)
    int_fwd, bnd = unstack(plan.int_fwd), unstack(plan.bnd)
    agg = spmm_banded_xla(jnp.asarray(xp), int_fwd)
    r = boundary_fwd_compact(jnp.asarray(xp), halo, bnd)
    agg = _expand_compact(agg, r, bnd.rg)
    lo = p * plan.n_local
    hi = min(n, (p + 1) * plan.n_local)
    np.testing.assert_allclose(np.asarray(agg)[: hi - lo], want[lo:hi],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["fused_ln", "fused"])
def test_interior_overflow_rides_residual(mode):
    """A graph with long-range interior outliers + a tight span: the fused
    plan spills them into the compact residual (i_* arrays engaged) and
    the step equals the loose-span plan (resid empty) — same math, both
    XLA fallback, so tolerances are tight. The unfused banded planner
    refuses this graph at the tight span."""
    n, deg, d, ncls = 96, 4, 12, 3
    hidden = (16,)
    rng = np.random.default_rng(2)
    src, dst = local_graph(n, deg, reach=3, seed=2)
    # a handful of long-range INTERIOR edges (kept inside one shard's range)
    out_dst = np.array([1, 2, 3, 49, 50], dtype=np.int64)
    out_src = np.array([10, 11, 9, 58, 59], dtype=np.int64)
    src = np.concatenate([src, out_src])
    dst = np.concatenate([dst, out_dst])
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n)
    mask = np.ones(n, np.float32)

    ep = 8
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    plan_tight = plan_halo_fused(src, dst, n, ep, tile=4, banded_k=2,
                                 span=2, resid_frac=0.05)
    assert (np.asarray(plan_tight.bnd.i_w_f) > 0).any(), "overflow not engaged"
    plan_loose = plan_halo_fused(src, dst, n, ep, tile=4, banded_k=2,
                                 span=3)
    assert not (np.asarray(plan_loose.bnd.i_w_f) > 0).any()
    # the unfused banded planner cannot take the tight span at all
    with pytest.raises(ValueError):
        plan_halo_blocked(src, dst, n, ep, tile=4, edge_chunk=16,
                          backend="banded", banded_k=2, banded_max_span=2)

    kw = dict(hidden_dims=hidden, num_classes=ncls, negative_slope=0.1,
              use_pallas=False, fused_ln=mode == "fused_ln",
              fused=mode == "fused")
    model_t = HaloSageClassifier(dims=HaloDims.of(plan_tight), **kw)
    model_l = HaloSageClassifier(dims=HaloDims.of(plan_loose), **kw)
    opt = make_optimizer(1e-2, 0.0)
    fns_t = build_halo_step_fns(model_t, opt, mesh, plan_tight)
    fns_l = build_halo_step_fns(model_l, opt, mesh, plan_loose)
    x_stack = jax.device_put(shard_node_array(x, ep, plan_tight.n_local),
                             fns_t.node_sharding)
    y_stack = jax.device_put(
        shard_node_array(y.astype(np.int32), ep, plan_tight.n_local),
        fns_t.node_sharding)
    m_stack = jax.device_put(shard_node_array(mask, ep, plan_tight.n_local),
                             fns_t.node_sharding)
    state_t = fns_t.init(jax.random.PRNGKey(0), x_stack)
    state_l = TrainState(
        params=jax.device_put(state_t.params, fns_l.repl_sharding),
        opt_state=jax.device_put(state_t.opt_state, fns_l.repl_sharding),
        step=state_t.step)
    for _ in range(3):
        state_t, mt = fns_t.train_step(state_t, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        state_l, ml = fns_l.train_step(state_l, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        np.testing.assert_allclose(float(mt["loss"]), float(ml["loss"]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_t.params)),
                    jax.tree.leaves(jax.device_get(state_l.params))):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
