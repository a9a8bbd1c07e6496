"""Collective/compute overlap in the fused halo path (parallel/halo_fused.py
halo_fused_sage_ov / halo_fused_sage_ln_ov).

Three properties:
  1. Math parity: the overlap variants equal the non-overlap fused layers
     (standalone kernel interpret-mode VJP parity + virtual-mesh train-step
     parity against the unfused halo classifier).
  2. Dependence: in the traced program the interior fused kernel takes NO
     input derived from its layer's all-to-all, while the layer output
     does — the structural precondition for XLA's latency-hiding scheduler
     to run collective and kernel concurrently. Proven by taint
     propagation over the jaxpr (negative control: the non-overlap layer's
     kernel IS tainted).
  3. The separated boundary/io maps added for overlap agree with the
     combined ones (boundary_fwd_sep ∘ patch == boundary_fwd_compact path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.parallel.halo_fused import (
    halo_fused_sage,
    halo_fused_sage_ln,
    halo_fused_sage_ln_ov,
    halo_fused_sage_ov,
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
from tests.test_halo_fused import _one_shard_setup, _setup, local_graph


# --------------------------------------------------------- jaxpr taint


def _taint_pallas_calls(closed, source_prim="all_to_all"):
    """Propagate taint from ``source_prim`` outputs through a jaxpr
    (recursing into sub-jaxprs); returns (kernel_taints, out_tainted):
    the taint of each pallas_call eqn's inputs, in trace order, and of
    the jaxpr's outputs."""
    kernels = []

    def visit(jaxpr, env):
        def taint_of(v):
            if isinstance(v, jax.extend.core.Literal):
                return False
            return env.get(v, False)

        for eqn in jaxpr.eqns:
            tin = any(taint_of(v) for v in eqn.invars)
            name = eqn.primitive.name
            if name == "pallas_call":
                kernels.append(tin)
            subs = [p for p in eqn.params.values()
                    if hasattr(p, "jaxpr") or hasattr(p, "eqns")]
            inner = None
            if len(subs) == 1:
                inner = subs[0]
                inner_open = getattr(inner, "jaxpr", inner)
            if name == source_prim:
                for v in eqn.outvars:
                    env[v] = True
            elif inner is not None and len(inner_open.invars) == len(eqn.invars):
                ienv = dict(zip(inner_open.invars,
                                (taint_of(v) for v in eqn.invars)))
                for cv in inner_open.constvars:
                    ienv[cv] = False
                visit(inner_open, ienv)
                for ov, iv in zip(eqn.outvars, inner_open.outvars):
                    env[ov] = (ienv.get(iv, False)
                               if not isinstance(iv, jax.extend.core.Literal)
                               else False)
            else:
                for v in eqn.outvars:
                    env[v] = tin
        return env

    env = {v: False for v in closed.jaxpr.invars}
    for cv in closed.jaxpr.constvars:
        env[cv] = False
    env = visit(closed.jaxpr, env)
    out = any(env.get(v, False) for v in closed.jaxpr.outvars
              if not isinstance(v, jax.extend.core.Literal))
    return kernels, out


@pytest.mark.parametrize("mode", ["fused_ln", "fused"])
def test_overlap_kernel_independent_of_collective(mode):
    """The overlap layer's fused interior kernel takes no all-to-all-
    derived input (so the scheduler may overlap them); the non-overlap
    layer's kernel does (negative control). Single layer, single shard
    semantics via shard_map over the virtual mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n, d, ncls, ep = 96, 12, 3, 8
    src, dst = local_graph(n, 4, reach=10, seed=0)
    plan = plan_halo_fused(src, dst, n, ep, tile=8, banded_k=2)
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    layouts = jax.tree.map(jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd))
    l_specs = jax.tree.map(lambda _: P("ep"), layouts)
    x = np.random.default_rng(0).standard_normal((n, d)).astype(np.float32)
    x_stack = shard_node_array(x, ep, plan.n_local)

    def trace(overlap):
        kw = dict(hidden_dims=(16,), num_classes=ncls,
                  dims=HaloDims.of(plan), negative_slope=0.1,
                  fused=mode == "fused", fused_ln=mode == "fused_ln",
                  overlap=overlap)
        model = HaloSageClassifier(use_pallas=True, **kw)
        # init with the XLA-fallback twin (same param tree; Pallas kernels
        # can't EXECUTE on the CPU backend, and make_jaxpr only traces)
        fns = build_halo_step_fns(HaloSageClassifier(use_pallas=False, **kw),
                                  make_optimizer(1e-2, 0.0), mesh, plan)
        params = fns.init(
            jax.random.PRNGKey(0),
            jax.device_put(x_stack, fns.node_sharding)).params

        def body(xs, send, lts):
            return model.apply({"params": params}, xs[0], send, lts,
                               train=False)

        f = shard_map(body, mesh=mesh,
                      in_specs=(P("ep"), P("ep"), l_specs),
                      out_specs=P("ep"))
        return jax.make_jaxpr(f)(
            jnp.asarray(x_stack), jnp.asarray(plan.send_idx), layouts)

    kt, out_t = _taint_pallas_calls(trace(True))
    assert len(kt) == 1 and not kt[0], (
        "overlap interior kernel must not consume the all-to-all")
    assert out_t, "layer output must depend on the all-to-all"

    kt_n, out_n = _taint_pallas_calls(trace(False))
    assert len(kt_n) == 1 and kt_n[0], (
        "negative control: non-overlap kernel waits on the all-to-all")
    assert out_n


# ----------------------------------------------------------- math parity


def test_overlap_ln_kernel_interpret(rng):
    """Overlap LN layer (Pallas interpret) vs the NON-overlap XLA fallback:
    forward + full VJP parity."""
    (plan, int_fwd, int_rev, bnd, xp, halo, wl, wr, b, gamma,
     beta) = _one_shard_setup(rng)

    def run(fn, use_pallas):
        def f(xp, halo, wl, wr, b, gamma, beta):
            out = fn(xp, halo, wl, wr, b, gamma, beta,
                     int_fwd, int_rev, bnd, use_pallas, 0.1, 1e-5,
                     use_pallas)
            return out[: plan.n_local]
        out = f(xp, halo, wl, wr, b, gamma, beta)
        grads = jax.grad(
            lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(7))
        )(xp, halo, wl, wr, b, gamma, beta)
        return out, grads

    out_x, g_x = run(halo_fused_sage_ln, False)
    out_k, g_k = run(halo_fused_sage_ln_ov, True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-2, atol=3e-2)
    for a, bb, name in zip(g_k, g_x,
                           ("dx", "dhalo", "dwl", "dwr", "db", "dgamma",
                            "dbeta")):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        assert np.abs(a - bb).max() / scale < 5e-2, name


def test_overlap_kernel_interpret(rng):
    """Overlap non-LN layer (Pallas interpret) vs non-overlap XLA."""
    (plan, int_fwd, int_rev, bnd, xp, halo, wl, wr, b, _gamma,
     _beta) = _one_shard_setup(rng)

    def run(fn, use_pallas):
        def f(xp, halo, wl, wr, b):
            out = fn(xp, halo, wl, wr, b, int_fwd, int_rev, bnd,
                     use_pallas, 0.1, use_pallas)
            return out[: plan.n_local]
        out = f(xp, halo, wl, wr, b)
        grads = jax.grad(
            lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(5))
        )(xp, halo, wl, wr, b)
        return out, grads

    out_x, g_x = run(halo_fused_sage, False)
    out_k, g_k = run(halo_fused_sage_ov, True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=3e-2, atol=3e-2)
    for a, bb, name in zip(g_k, g_x, ("dx", "dhalo", "dwl", "dwr", "db")):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = np.abs(bb).max() + 1e-9
        assert np.abs(a - bb).max() / scale < 5e-2, name


def test_overlap_xla_exact_vs_fused(rng):
    """Both paths on XLA fallback (pure f32): the overlap restructure is
    algebraically the same layer, so outputs agree tightly."""
    (plan, int_fwd, int_rev, bnd, xp, halo, wl, wr, b, gamma,
     beta) = _one_shard_setup(rng)
    out_a = halo_fused_sage_ln(xp, halo, wl, wr, b, gamma, beta,
                               int_fwd, int_rev, bnd, False, 0.1)
    out_b = halo_fused_sage_ln_ov(xp, halo, wl, wr, b, gamma, beta,
                                  int_fwd, int_rev, bnd, False, 0.1)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fused_ln", "fused"])
def test_overlap_step_matches_unfused(mode):
    """3 Adam steps on the virtual mesh: the overlap classifier's losses
    and trained params equal the UNFUSED halo classifier's (both XLA
    fallback — f32 math end to end)."""
    n, ncls, hidden = 96, 3, (16, 16)
    src, dst, x, y, mask, mesh, plan_u, plan_f = _setup(n=n, ncls=ncls,
                                                       hidden=hidden)
    ep = plan_u.send_idx.shape[0]
    kw = dict(hidden_dims=hidden, num_classes=ncls, negative_slope=0.1,
              use_pallas=False)
    model_u = HaloSageClassifier(dims=HaloDims.of(plan_u), **kw)
    model_o = HaloSageClassifier(dims=HaloDims.of(plan_f),
                                 fused_ln=mode == "fused_ln",
                                 fused=mode == "fused", overlap=True, **kw)
    opt = make_optimizer(1e-2, 0.0)
    fns_u = build_halo_step_fns(model_u, opt, mesh, plan_u)
    fns_o = build_halo_step_fns(model_o, opt, mesh, plan_f)
    x_stack = jax.device_put(shard_node_array(x, ep, plan_u.n_local),
                             fns_u.node_sharding)
    y_stack = jax.device_put(
        shard_node_array(y.astype(np.int32), ep, plan_u.n_local),
        fns_u.node_sharding)
    m_stack = jax.device_put(shard_node_array(mask, ep, plan_u.n_local),
                             fns_u.node_sharding)
    state_u = fns_u.init(jax.random.PRNGKey(0), x_stack)
    state_o = TrainState(
        params=jax.device_put(state_u.params, fns_o.repl_sharding),
        opt_state=jax.device_put(state_u.opt_state, fns_o.repl_sharding),
        step=state_u.step)
    for _ in range(3):
        state_u, mu = fns_u.train_step(state_u, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        state_o, mo = fns_o.train_step(state_o, x_stack, y_stack, m_stack,
                                       jax.random.PRNGKey(9))
        np.testing.assert_allclose(float(mo["loss"]), float(mu["loss"]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_u.params)),
                    jax.tree.leaves(jax.device_get(state_o.params))):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-5)


def test_separated_boundary_maps_complete_mean(rng):
    """boundary_fwd_sep + patch-by-slot_grp reproduces the combined-path
    aggregate: interior banded + io resid + separated boundary == exact
    global mean restricted to the shard."""
    from sldm_gnn_tpu.ops.banded_residual import _expand_compact
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_xla
    from sldm_gnn_tpu.parallel.halo_fused import (
        _patch_groups,
        boundary_fwd_sep,
        io_fwd_compact,
    )

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
    agg = _expand_compact(agg, io_fwd_compact(jnp.asarray(xp), bnd),
                          bnd.rg_io)
    # separated boundary partial patched in by group
    r_b = boundary_fwd_sep(halo, bnd)
    steps = bnd.rg_b.shape[0]
    base = agg.reshape(steps, bnd.kt, d)[
        jnp.clip(bnd.slot_grp, 0, steps - 1)]
    agg = _patch_groups(agg, base + r_b, bnd.slot_grp, bnd.kt)
    lo = p * plan.n_local
    hi = min(n, (p + 1) * plan.n_local)
    np.testing.assert_allclose(np.asarray(agg)[: hi - lo], want[lo:hi],
                               rtol=1e-5, atol=1e-5)
