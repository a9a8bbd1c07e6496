"""Halo-exchange node-sharded aggregation: exactness vs the dense reference
and gradient parity, on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sldm_gnn_tpu.graph.csr import mean_weights
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.parallel.halo import (
    HaloPlan,
    halo_aggregate,
    make_halo_sage_step,
    plan_halo_partition,
)
from sldm_gnn_tpu.parallel.mesh import make_mesh


def _stack_x(x, ep, n_local):
    n, d = x.shape
    pad = ep * n_local - n
    xp = np.concatenate([x, np.zeros((pad, d), x.dtype)])
    return xp.reshape(ep, n_local, d)


def test_halo_aggregate_matches_dense(rng):
    ep = 8
    mesh = make_mesh(dp=1, ep=ep)
    n, e, d = 100, 700, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan, n_local = plan_halo_partition(src, dst, n, ep)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, n_local))
    plan_j = jax.tree.map(jnp.asarray, plan)
    plan_specs = jax.tree.map(lambda _: P("ep"), plan_j)

    agg = shard_map(
        lambda xs, pl: halo_aggregate(xs[0], pl, n_local)[None],
        mesh=mesh,
        in_specs=(P("ep"), plan_specs),
        out_specs=P("ep"),
    )
    out = np.asarray(agg(x_stack, plan_j)).reshape(ep * n_local, d)[:n]

    w = mean_weights(dst, n)
    want = np.asarray(spmm_xla(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), n))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_halo_sage_grads_match_reference(rng):
    ep = 4
    mesh = make_mesh(dp=2, ep=ep)
    n, e, d = 64, 400, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan, n_local = plan_halo_partition(src, dst, n, ep)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, n_local))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_sage_step(mesh, jax.tree.map(jnp.asarray, plan), n_local)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    n_pad = ep * n_local
    xp = jnp.asarray(np.concatenate([x, np.zeros((n_pad - n, d), np.float32)]))

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded,
        grads_ref,
    )
    np.testing.assert_allclose(
        np.asarray(dx_sharded).reshape(n_pad, d), np.asarray(dx_ref), rtol=2e-4, atol=2e-5
    )


def test_plan_no_cross_shard_edges_zero_halo():
    """A graph whose edges never cross shard boundaries needs no halo."""
    ep = 4
    # 16 nodes, 4 per shard, ring edges within each shard
    src, dst = [], []
    for p in range(ep):
        base = p * 4
        for k in range(4):
            src.append(base + k)
            dst.append(base + (k + 1) % 4)
    plan, n_local = plan_halo_partition(np.array(src), np.array(dst), 16, ep)
    assert n_local == 4
    # all remapped sources are local (< n_local)
    valid = plan.weight > 0
    assert (np.asarray(plan.src_local)[np.asarray(valid)] < n_local).all()


@pytest.mark.slow
def test_overlapped_split_matches_unsplit(rng):
    """Interior/boundary-split aggregation (overlappable all-to-all) is
    exactly the unsplit halo aggregation, forward and backward."""
    from sldm_gnn_tpu.parallel.halo import halo_aggregate_overlapped, split_halo_plan

    ep = 8
    mesh = make_mesh(dp=1, ep=ep)
    n, e, d = 120, 900, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan, n_local = plan_halo_partition(src, dst, n, ep)
    splan = split_halo_plan(plan, n_local)
    # every edge lands in exactly one of the two lists
    assert (np.asarray(splan.int_w) > 0).sum() + (np.asarray(splan.hal_w) > 0).sum() == e

    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, n_local))
    plan_j = jax.tree.map(jnp.asarray, plan)
    splan_j = jax.tree.map(jnp.asarray, splan)

    agg_u = shard_map(
        lambda xs, pl: halo_aggregate(xs[0], pl, n_local)[None],
        mesh=mesh, in_specs=(P("ep"), jax.tree.map(lambda _: P("ep"), plan_j)),
        out_specs=P("ep"),
    )
    agg_s = shard_map(
        lambda xs, pl: halo_aggregate_overlapped(xs[0], pl, n_local)[None],
        mesh=mesh, in_specs=(P("ep"), jax.tree.map(lambda _: P("ep"), splan_j)),
        out_specs=P("ep"),
    )
    out_u = np.asarray(agg_u(x_stack, plan_j))
    out_s = np.asarray(agg_s(x_stack, splan_j))
    np.testing.assert_allclose(out_s, out_u, rtol=1e-5, atol=1e-6)


def test_overlapped_sage_step_matches_reference(rng):
    from sldm_gnn_tpu.parallel.halo import split_halo_plan

    ep = 4
    mesh = make_mesh(dp=2, ep=ep)
    n, e, d = 64, 400, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan, n_local = plan_halo_partition(src, dst, n, ep)
    splan = jax.tree.map(jnp.asarray, split_halo_plan(plan, n_local))
    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, n_local))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_sage_step(mesh, splan, n_local, overlap=True)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    n_pad = ep * n_local
    xp = jnp.asarray(np.concatenate([x, np.zeros((n_pad - n, d), np.float32)]))

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded,
        grads_ref,
    )
    np.testing.assert_allclose(
        np.asarray(dx_sharded).reshape(n_pad, d), np.asarray(dx_ref), rtol=2e-4, atol=2e-5
    )


def test_halo_blocked_pallas_step_matches_reference(rng):
    """Per-shard blocked-SpMM halo aggregation (interior/boundary layouts,
    spmm_apply custom VJPs) == single-device dense reference, fwd+bwd, on
    the 8-device CPU mesh (XLA dispatch of the same blocked layouts)."""
    from sldm_gnn_tpu.parallel.halo import make_halo_pallas_sage_step, plan_halo_blocked

    ep = 4
    mesh = make_mesh(dp=2, ep=ep)
    n, e, d = 72, 500, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16, step_chunks=2)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, plan.n_local))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_pallas_sage_step(mesh, plan, use_pallas=False)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    n_pad = ep * plan.n_local
    xp = jnp.asarray(np.concatenate([x, np.zeros((n_pad - n, d), np.float32)]))

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded,
        grads_ref,
    )
    np.testing.assert_allclose(
        np.asarray(dx_sharded).reshape(n_pad, d), np.asarray(dx_ref), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_halo_blocked_layouts_interpret_kernel(rng):
    """The per-shard blocked layouts drive the actual Pallas kernel
    (interpret mode) to the same sums as the XLA dispatch."""
    from sldm_gnn_tpu.ops.spmm import _spmm_dispatch, spmm_pallas
    from sldm_gnn_tpu.parallel.halo import plan_halo_blocked

    ep = 4
    n, e, d = 60, 400, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16, step_chunks=2)
    for p in range(ep):
        for group, npad in ((plan.int_fwd, plan.n_pad_local), (plan.bnd_fwd, plan.n_pad_bnd)):
            blk = jax.tree.map(lambda a: a[p], group)
            x = jnp.asarray(rng.standard_normal((npad, d)).astype(np.float32))
            got = np.asarray(
                spmm_pallas(x, blk, npad, interpret=True, k_per_step=plan.k_per_step,
                            precision=jax.lax.Precision.HIGHEST)
            )
            want = np.asarray(_spmm_dispatch(x, blk, npad, False, plan.k_per_step))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_halo_dense_backend_matches_reference(rng):
    """Dense-tile per-shard halo aggregation == dense single-device
    reference, fwd+bwd (XLA dispatch of the same dense layouts)."""
    from sldm_gnn_tpu.parallel.halo import make_halo_pallas_sage_step, plan_halo_blocked

    ep = 4
    mesh = make_mesh(dp=2, ep=ep)
    n, e, d = 72, 500, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, backend="dense")
    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, plan.n_local))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_pallas_sage_step(mesh, plan, use_pallas=False)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    n_pad = ep * plan.n_local
    xp = jnp.asarray(np.concatenate([x, np.zeros((n_pad - n, d), np.float32)]))

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded,
        grads_ref,
    )
    np.testing.assert_allclose(
        np.asarray(dx_sharded).reshape(n_pad, d), np.asarray(dx_ref), rtol=2e-4, atol=2e-5
    )


def test_halo_banded_backend_matches_reference(rng):
    """backend='banded': banded interior layouts (windowed-DMA kernel
    class) + one-hot boundary == dense single-device reference, fwd+bwd
    (XLA dispatch of the same layouts on the virtual mesh)."""
    from sldm_gnn_tpu.ops.spmm_banded import BandedBlocks
    from sldm_gnn_tpu.parallel.halo import make_halo_pallas_sage_step, plan_halo_blocked

    ep = 4
    mesh = make_mesh(dp=2, ep=ep)
    n, d = 256, 8
    # locality graph: banded per-shard interiors under contiguous sharding
    deg = 6
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-20, 21, n * deg), 0, n - 1)
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16,
                             backend="banded", banded_k=2)
    assert isinstance(plan.int_fwd, BandedBlocks)
    assert plan.int_fwd.a.dtype == np.int8
    # all shards share static layout shapes
    assert plan.int_fwd.a.shape[0] == ep

    x = rng.standard_normal((n, d)).astype(np.float32)
    x_stack = jnp.asarray(_stack_x(x, ep, plan.n_local))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_pallas_sage_step(mesh, plan, use_pallas=False)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    n_pad = ep * plan.n_local
    xp = jnp.asarray(np.concatenate([x, np.zeros((n_pad - n, d), np.float32)]))

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded,
        grads_ref,
    )
    np.testing.assert_allclose(
        np.asarray(dx_sharded).reshape(n_pad, d), np.asarray(dx_ref), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_halo_banded_layouts_interpret_kernel(rng):
    """The stacked per-shard banded layouts drive the actual Pallas
    banded kernel (interpret mode) to the same sums as its XLA dispatch."""
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_pallas, spmm_banded_xla
    from sldm_gnn_tpu.parallel.halo import plan_halo_blocked

    ep = 4
    n, d = 192, 8
    deg = 5
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-15, 16, n * deg), 0, n - 1)
    plan = plan_halo_blocked(src, dst, n, ep, tile=8, edge_chunk=16,
                             backend="banded", banded_k=2)
    for p in range(ep):
        for group in (plan.int_fwd, plan.int_rev):
            blk = jax.tree.map(lambda a: jnp.asarray(a[p]), group)
            x = jnp.asarray(rng.standard_normal((plan.n_pad_local, d)).astype(np.float32))
            got = np.asarray(spmm_banded_pallas(x, blk, interpret=True))
            want = np.asarray(spmm_banded_xla(x, blk))
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_halo_banded_rejects_non_banded(rng):
    from sldm_gnn_tpu.parallel.halo import plan_halo_blocked

    n, e = 512, 4000
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    with pytest.raises(ValueError, match="span"):
        plan_halo_blocked(src, dst, n, 4, tile=8, backend="banded",
                          banded_max_span=2)
