"""Streamed halo-plan construction (parallel/streamed.py): chunked build
== the in-memory plan_halo_blocked(backend='banded') bit-for-bit, subset
loading for multi-host workers, manifest accounting, and the virtual-mesh
aggregation parity through a streamed plan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.parallel.halo import plan_halo_blocked
from sldm_gnn_tpu.parallel.streamed import StreamedHaloPlanner, load_streamed_halo_plan


def _banded_graph(rng, n=4096, deg=5, reach=60):
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src, dst


def _stream_build(src, dst, n, ep, out, chunk=7_000, **kw):
    planner = StreamedHaloPlanner(n, ep, out, **kw)
    for s in range(0, len(src), chunk):
        planner.consume(src[s:s + chunk], dst[s:s + chunk])
    return planner.finalize()


def test_streamed_matches_in_memory(rng, tmp_path):
    n, ep = 4096, 4
    src, dst = _banded_graph(rng)
    want = plan_halo_blocked(src, dst, n, ep, backend="banded", tile=64,
                             banded_k=4)
    man = _stream_build(src, dst, n, ep, tmp_path / "plan", tile=64, banded_k=4)
    got = load_streamed_halo_plan(tmp_path / "plan")

    assert man["num_edges"] == len(src)
    assert man["h_max"] == want.send_idx.shape[2]
    assert (got.n_local, got.n_pad_local, got.n_pad_bnd, got.k_per_step) == \
        (want.n_local, want.n_pad_local, want.n_pad_bnd, want.k_per_step)
    for field in ("send_idx", "int_fwd", "int_rev", "bnd_fwd", "bnd_rev"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            getattr(got, field), getattr(want, field))


def test_streamed_subset_load(rng, tmp_path):
    """A multi-host worker loads only its shards: stacked leading dim is
    the subset size; send_idx keeps the full pair map."""
    n, ep = 2048, 4
    src, dst = _banded_graph(rng, n=n)
    _stream_build(src, dst, n, ep, tmp_path / "plan", tile=64, banded_k=4)
    full = load_streamed_halo_plan(tmp_path / "plan")
    sub = load_streamed_halo_plan(tmp_path / "plan", shards=[1, 3])
    assert sub.int_fwd.a.shape[0] == 2
    assert sub.send_idx.shape == (ep, ep, full.send_idx.shape[2])
    np.testing.assert_array_equal(np.asarray(sub.int_fwd.a),
                                  np.asarray(full.int_fwd.a[[1, 3]]))
    # one-hot chunk counts pad to the subset's own max — compare the
    # common prefix (the tail is all-dummy padding in both)
    wsub = sub.bnd_fwd.weight.shape[1]
    np.testing.assert_array_equal(
        np.asarray(sub.bnd_fwd.weight),
        np.asarray(full.bnd_fwd.weight[[1, 3], :wsub]))
    assert np.all(np.asarray(full.bnd_fwd.weight[[1, 3], wsub:]) == 0)


def test_streamed_manifest_accounting(rng, tmp_path):
    n, ep = 2048, 4
    src, dst = _banded_graph(rng, n=n)
    man = _stream_build(src, dst, n, ep, tmp_path / "plan", tile=64, banded_k=4)
    assert man["peak_rss_mb"] > 0
    assert man["deg_array_mb"] == round(n * 4 / 1e6, 1)
    assert man["banded_a_mb_per_shard_dir"] > 0
    assert sum(man["per_shard_edges"]) == len(src)


def test_streamed_plan_drives_mesh_step(rng, tmp_path):
    """A streamed-built plan drives the halo SAGE step on the virtual mesh
    and matches the single-device dense reference, fwd+bwd — the full
    multi-chip path through a plan that was never in memory at once."""
    from sldm_gnn_tpu.graph.csr import mean_weights
    from sldm_gnn_tpu.ops.spmm import spmm_xla
    from sldm_gnn_tpu.parallel.halo import make_halo_pallas_sage_step
    from sldm_gnn_tpu.parallel.mesh import make_mesh

    n, ep, d = 1024, 4, 8
    src, dst = _banded_graph(rng, n=n, deg=4, reach=30)
    _stream_build(src, dst, n, ep, tmp_path / "plan", tile=32, banded_k=2)
    plan = load_streamed_halo_plan(tmp_path / "plan")
    mesh = make_mesh(dp=2, ep=ep)

    x = rng.standard_normal((n, d)).astype(np.float32)
    n_local = plan.n_local
    n_pad = ep * n_local
    xp = np.concatenate([x, np.zeros((n_pad - n, d), np.float32)])
    x_stack = jnp.asarray(xp.reshape(ep, n_local, d))
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }

    step = make_halo_pallas_sage_step(mesh, plan, use_pallas=False)
    grads_sharded, dx_sharded = step(params, x_stack)

    w = jnp.asarray(mean_weights(dst, n))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    xpj = jnp.asarray(xp)

    def ref(params, xfull):
        a1 = spmm_xla(xfull, srcj, dstj, w, n_pad)
        h = jnp.maximum(a1 @ params["w0a"] + xfull @ params["w0b"], 0.0)
        a2 = spmm_xla(h, srcj, dstj, w, n_pad)
        return jnp.sum(jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0))

    grads_ref, dx_ref = jax.grad(ref, argnums=(0, 1))(params, xpj)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        grads_sharded, grads_ref)
    np.testing.assert_allclose(np.asarray(dx_sharded).reshape(n_pad, d),
                               np.asarray(dx_ref), rtol=2e-4, atol=2e-5)


def test_streaming_hilbert_matches_batch(rng):
    """Two-pass streaming Hilbert == the in-memory hilbert_order."""
    from sldm_gnn_tpu.graph.reorder import StreamingHilbert, hilbert_order

    n = 5000
    coords = rng.standard_normal((n, 2)) * 100
    sh = StreamingHilbert(n)
    for s in range(0, n, 700):
        sh.observe_bounds(coords[s:s + 700])
    for s in range(0, n, 700):
        sh.add_keys(np.arange(s, min(s + 700, n)), coords[s:s + 700])
    np.testing.assert_array_equal(sh.order(), hilbert_order(coords))


def test_streamed_plan_file_order_input(rng, tmp_path):
    """File-order (shuffled-id) input streams through via node_order: the
    planner relabels on consume and produces the same plan as the in-memory
    build on the pre-relabeled edges; without node_order the same stream
    raises at the span check."""
    from sldm_gnn_tpu.graph.reorder import StreamingHilbert, relabel_edges

    n, ep = 4096, 4
    # spatially-banded graph whose IDS arrive in file (random) order:
    # build on a line, then scramble ids
    src0, dst0 = _banded_graph(rng)
    scramble = rng.permutation(n)  # file_id = scramble[spatial_id]
    src = scramble[src0]
    dst = scramble[dst0]
    coords = np.zeros((n, 2))
    coords[scramble, 0] = np.arange(n, dtype=np.float64)  # x = spatial pos
    coords[:, 1] = 0.0

    # streamed reorder: two coordinate passes
    sh = StreamingHilbert(n)
    for s in range(0, n, 900):
        sh.observe_bounds(coords[s:s + 900])
    for s in range(0, n, 900):
        sh.add_keys(np.arange(s, min(s + 900, n)), coords[s:s + 900])
    perm = sh.order()

    man = _stream_build(src, dst, n, ep, tmp_path / "plan", tile=64,
                        banded_k=4, node_order=perm)
    got = load_streamed_halo_plan(tmp_path / "plan")

    rs, rd = relabel_edges(src, dst, perm)
    want = plan_halo_blocked(rs, rd, n, ep, backend="banded", tile=64,
                             banded_k=4)
    # stacked layout: a is [ep, nb, s_span, T, T]
    assert man["s_common"] == want.int_fwd.a.shape[2]
    for field in ("send_idx", "int_fwd", "int_rev", "bnd_fwd", "bnd_rev"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            getattr(got, field), getattr(want, field))

    # the same stream WITHOUT the reorder is not banded -> loud failure
    # (shard interiors of a scrambled-id graph span every block)
    with pytest.raises(ValueError):
        _stream_build(src, dst, n, ep, tmp_path / "plan2", tile=64,
                      banded_k=4, banded_max_span=8)


def test_streamed_fused_plan_matches_in_memory(rng, tmp_path):
    """Streamed build -> load_streamed_halo_fused_plan: a train step over
    the loaded FUSED plan equals the in-memory plan_halo_fused step
    (same span, same params). A tight span engages the interior-overflow
    residual on both sides."""
    import jax.numpy as jnp

    from sldm_gnn_tpu.parallel.halo_fused import plan_halo_fused
    from sldm_gnn_tpu.parallel.halo_model import (
        HaloDims, HaloSageClassifier, build_halo_step_fns, shard_node_array)
    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.parallel.streamed import load_streamed_halo_fused_plan
    from sldm_gnn_tpu.train.loop import TrainState, make_optimizer

    n, ep = 4096, 4
    src, dst = _banded_graph(rng, deg=4, reach=40)
    # a few long-range interior outliers
    src = np.concatenate([src, np.array([200, 300, 2248])])
    dst = np.concatenate([dst, np.array([10, 80, 2060])])

    _stream_build(src, dst, n, ep, tmp_path / "plan", tile=64, banded_k=2)
    got = load_streamed_halo_fused_plan(tmp_path / "plan", span=2,
                                        resid_frac=0.05)
    assert (np.asarray(got.bnd.i_w_f) > 0).any(), "overflow not engaged"
    want = plan_halo_fused(src, dst, n, ep, tile=64, banded_k=2, span=2,
                           resid_frac=0.05)
    np.testing.assert_array_equal(np.asarray(got.int_fwd.a),
                                  np.asarray(want.int_fwd.a))

    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    rngd = np.random.default_rng(3)
    x = rngd.standard_normal((n, 8)).astype(np.float32)
    y = rngd.integers(0, 3, n)
    mask = np.ones(n, np.float32)

    losses = []
    for plan in (got, want):
        model = HaloSageClassifier(hidden_dims=(8,), num_classes=3,
                                   dims=HaloDims.of(plan),
                                   negative_slope=0.1, use_pallas=False,
                                   fused_ln=True)
        fns = build_halo_step_fns(model, make_optimizer(1e-2, 0.0), mesh, plan)
        x_stack = jax.device_put(shard_node_array(x, ep, plan.n_local),
                                 fns.node_sharding)
        y_stack = jax.device_put(
            shard_node_array(y.astype(np.int32), ep, plan.n_local),
            fns.node_sharding)
        m_stack = jax.device_put(shard_node_array(mask, ep, plan.n_local),
                                 fns.node_sharding)
        state = fns.init(jax.random.PRNGKey(0), x_stack)
        _, m = fns.train_step(state, x_stack, y_stack, m_stack,
                              jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # subset load: same statics as the full load (multi-host program parity)
    sub = load_streamed_halo_fused_plan(tmp_path / "plan", shards=[1, 3],
                                        span=2, resid_frac=0.05)
    assert np.asarray(sub.int_fwd.a).shape[0] == 2
    assert (sub.bnd.m, sub.bnd.m_rev, sub.bnd.kt) == \
        (got.bnd.m, got.bnd.m_rev, got.bnd.kt)
    assert sub.bnd.src_f.shape[1] == got.bnd.src_f.shape[1]
    assert sub.bnd.i_src_f.shape[1] == got.bnd.i_src_f.shape[1]
    assert sub.int_fwd.wsz == got.int_fwd.wsz
    np.testing.assert_array_equal(np.asarray(sub.int_fwd.a),
                                  np.asarray(got.int_fwd.a)[[1, 3]])


def test_materialized_fused_plan_fast_load(rng, tmp_path):
    """materialize_fused_plan caches floors + per-shard fused layouts on
    disk; subsequent loads (full and subset) skip both passes and must be
    field-identical to the from-scratch build. A different requested span
    falls back to the slow path."""
    import dataclasses

    from sldm_gnn_tpu.parallel.streamed import (
        load_streamed_halo_fused_plan, materialize_fused_plan)

    def assert_same(a, b, path=""):
        if dataclasses.is_dataclass(a):
            for f in dataclasses.fields(a):
                assert_same(getattr(a, f.name), getattr(b, f.name),
                            f"{path}.{f.name}")
        elif hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)
        else:
            assert a == b, (path, a, b)

    src, dst = _banded_graph(rng, n=2048, deg=4, reach=40)
    out = tmp_path / "plan"
    _stream_build(src, dst, 2048, 4, out, tile=64, banded_k=2)
    slow = load_streamed_halo_fused_plan(out)
    floors = materialize_fused_plan(out)
    assert (out / "fused_manifest.json").exists()
    assert (out / "fused_int_fwd_p3.npz").exists()
    fast = load_streamed_halo_fused_plan(out)
    assert_same(slow, fast)

    sub_slow = load_streamed_halo_fused_plan(out, shards=[1, 3],
                                             span=floors["span"] - 1,
                                             resid_frac=0.05)
    # tighter span than the cache: must rebuild, not reuse stale files
    assert sub_slow.int_fwd.a.shape[2] == floors["span"] - 1
    sub_fast = load_streamed_halo_fused_plan(out, shards=[1, 3])
    assert sub_fast.int_fwd.a.shape[1:] == fast.int_fwd.a.shape[1:]
    np.testing.assert_array_equal(np.asarray(sub_fast.int_fwd.a),
                                  np.asarray(fast.int_fwd.a)[[1, 3]])
    np.testing.assert_array_equal(np.asarray(sub_fast.bnd.src_f),
                                  np.asarray(fast.bnd.src_f)[[1, 3]])


def test_fused_cache_invalidation(rng, tmp_path):
    """The fused-layout cache must NOT survive anything that changes what
    it was materialized from: a plan rebuild into the same directory
    (different graph, same n/ep/span), a missing/stale fingerprint, or a
    caller demanding a stricter interior-overflow bound than the recorded
    one satisfies (advisor round 4)."""
    import json

    from sldm_gnn_tpu.parallel.streamed import (
        _fused_floors_cached, load_streamed_halo_fused_plan,
        materialize_fused_plan)

    src, dst = _banded_graph(rng, n=2048, deg=4, reach=40)
    out = tmp_path / "plan"
    _stream_build(src, dst, 2048, 4, out, tile=64, banded_k=2)
    floors = materialize_fused_plan(out)
    span = floors["span"]
    assert _fused_floors_cached(out, span, 0.01) is not None
    # e_tot counts interior edges only (boundary edges live elsewhere)
    assert floors["overflow_tot"] == 0 and 0 < floors["e_tot"] <= len(src)

    # rebuild the SAME directory from a different graph: finalize deletes
    # fused_* files, so the fast path cannot resurrect the old layouts
    src2, dst2 = _banded_graph(rng, n=2048, deg=3, reach=40)
    _stream_build(src2, dst2, 2048, 4, out, tile=64, banded_k=2)
    assert not (out / "fused_manifest.json").exists()
    assert not (out / "fused_int_fwd_p0.npz").exists()
    plan2 = load_streamed_halo_fused_plan(out)  # slow path, new graph
    materialize_fused_plan(out)
    fast2 = load_streamed_halo_fused_plan(out)
    np.testing.assert_array_equal(np.asarray(plan2.int_fwd.a),
                                  np.asarray(fast2.int_fwd.a))

    # a fused manifest whose fingerprint does not match the plan build is
    # rejected even when span/shape statics coincide
    fm = json.loads((out / "fused_manifest.json").read_text())
    fm["plan_fingerprint"] = "not-this-build"
    (out / "fused_manifest.json").write_text(json.dumps(fm))
    assert _fused_floors_cached(out, fm["span"], 0.01) is None

    # a recorded overflow fraction above the caller's 4*resid_frac bound
    # must raise from the cached path exactly like the slow path would
    fm = json.loads((out / "fused_manifest.json").read_text())
    from sldm_gnn_tpu.parallel.streamed import _plan_fingerprint
    fm["plan_fingerprint"] = _plan_fingerprint(out)
    fm["overflow_tot"] = fm["e_tot"] // 2
    (out / "fused_manifest.json").write_text(json.dumps(fm))
    with pytest.raises(ValueError, match="overflow fraction"):
        _fused_floors_cached(out, fm["span"], 0.01)
