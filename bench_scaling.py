"""Edge-partitioned scaling harness (BASELINE configs 4-5).

Runs ep-sharded GraphSAGE fwd+bwd steps over meshes of increasing size and
reports edges/s per point, plus scaling efficiency relative to the first
point. On real multi-chip hardware this is the ≥80% edges/s scaling study;
on a single host it validates the harness over the virtual CPU device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``).

Timing follows the house standard established for bench.py (BASELINE.md
timing-iteration correction): every measured point runs ≥SCALE_ITERS
(default 100) iterations inside ONE jitted ``fori_loop`` with a parameter
fold-back dependency chain (no per-step dispatch, no request-level caching)
and closes the window with a VALUE FETCH — ``block_until_ready`` alone has
reported early on the remote relay. Large inputs (layouts, features) ship
as traced jit arguments, not closure constants (remote-compile payload
limits).

Modes (SCALE_MODE):
  replicated  — features replicated, partial aggregates psum'd
  halo        — node-sharded, segment-sum per shard (XLA)
  halo_pallas — node-sharded, per-shard blocked Pallas kernels
                (SCALE_HALO_BACKEND = banded|dense|onehot), toy 2-layer SAGE
  halo_model  — node-sharded FULL MODEL training step: HaloSageClassifier
                (LayerNorm + dropout + head + masked CE + Adam), the real
                multi-chip configuration of record

Prints one JSON line per mesh size.

Env knobs: SCALE_NODES, SCALE_DEG, SCALE_DIM, SCALE_POINTS (comma list),
SCALE_ITERS, SCALE_MODE, SCALE_HALO_BACKEND, SCALE_HIDDEN, SCALE_CLASSES,
SCALE_FUSED (halo_model only: fused-kernel plan + fused_ln model).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _time_inloop(step_fn, carry, iters, *extra):
    """All iterations inside ONE jitted fori_loop; warm run feeds the timed
    run (never a byte-identical request); value fetch closes the window.
    Returns seconds/iteration."""
    import jax

    @jax.jit
    def run(carry, *extra):
        return jax.lax.fori_loop(0, iters, lambda _, c: step_fn(c, *extra), carry)

    def fetch_scalar(tree):
        # device-side slice FIRST, then float(): fetching np.asarray(leaf)
        # pulls the whole array over the remote tunnel (tens of MB — at
        # ~14 MB/s that once charged ~40 ms/iter to a 50-iter window)
        leaf = jax.tree.leaves(tree)[0]
        return float(leaf.ravel()[0])

    warm = run(carry, *extra)
    jax.tree.map(lambda a: a.block_until_ready(), warm)
    fetch_scalar(warm)  # warm the value-fetch path
    t0 = time.perf_counter()
    out = run(warm, *extra)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    # the container's sitecustomize registers the axon TPU backend at
    # interpreter start, so the JAX_PLATFORMS env var alone is too late —
    # honor it (and SCALE_CPU=1) via the config API before the first jax op
    if os.environ.get("SCALE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.parallel.edge_partition import partition_edges, make_sharded_sage_step
    from sldm_gnn_tpu.parallel.halo import (
        halo_aggregate_pallas,
        halo_aggregate,
        plan_halo_blocked,
        plan_halo_partition,
    )
    from sldm_gnn_tpu.parallel.halo_model import (
        HaloDims,
        HaloSageClassifier,
        build_halo_step_fns,
        shard_node_array,
    )
    from sldm_gnn_tpu.train.loop import make_optimizer

    n = int(os.environ.get("SCALE_NODES", 100_000))
    deg = int(os.environ.get("SCALE_DEG", 16))
    d = int(os.environ.get("SCALE_DIM", 128))
    iters = int(os.environ.get("SCALE_ITERS", 100))
    hidden = tuple(int(h) for h in os.environ.get("SCALE_HIDDEN", f"{d},{d}").split(","))
    ncls = int(os.environ.get("SCALE_CLASSES", 16))
    n_dev = len(jax.devices())
    points = [
        int(p)
        for p in os.environ.get("SCALE_POINTS", "1,2,4,8").split(",")
        if int(p) <= n_dev
    ]

    mode = os.environ.get("SCALE_MODE", "replicated")
    halo_backend = os.environ.get("SCALE_HALO_BACKEND", "banded")
    rng = np.random.default_rng(0)
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-256, 257, n * deg), 0, n - 1)
    e = len(src)
    use_pallas = jax.default_backend() not in ("cpu",)

    base_rate = base_ep = None
    for ep in points:
        mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
        params = {
            k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.05)
            for k in ("w0a", "w0b", "w1a", "w1b")
        }

        if mode == "halo_model":
            # SCALE_FUSED=1: the fused-kernel halo plan (parallel/halo_fused.py)
            # — boundary partial riding the fused banded kernels' resid
            # operand; fused_ln folds conv+LN+act into one kernel each way
            fused = bool(int(os.environ.get("SCALE_FUSED", 0)))
            try:
                if fused:
                    from sldm_gnn_tpu.parallel.halo_fused import plan_halo_fused

                    plan = plan_halo_fused(src, dst, n, ep, banded_k=8)
                else:
                    plan = plan_halo_blocked(src, dst, n, ep, backend=halo_backend,
                                             banded_k=8)
            except ValueError as err:
                print(json.dumps({"devices": ep, "error": str(err)}))
                continue
            model = HaloSageClassifier(
                hidden_dims=hidden, num_classes=ncls, dims=HaloDims.of(plan),
                dropout=0.25, negative_slope=0.1, use_pallas=use_pallas,
                fused_ln=fused)
            fns = build_halo_step_fns(model, make_optimizer(1e-3, 1e-5), mesh, plan)
            x_stack = jax.device_put(
                shard_node_array(
                    rng.standard_normal((n, d)).astype(np.float32), ep, plan.n_local),
                fns.node_sharding)
            y_stack = jax.device_put(
                shard_node_array(rng.integers(0, ncls, n).astype(np.int32),
                                 ep, plan.n_local), fns.node_sharding)
            m_stack = jax.device_put(
                shard_node_array(np.ones(n, np.float32), ep, plan.n_local),
                fns.node_sharding)
            state = fns.init(jax.random.PRNGKey(0), x_stack)

            def model_step(carry, x_s, y_s, m_s):
                state, key = carry
                key, sub = jax.random.split(key)
                # jit-of-jit inlines: the whole timing loop stays one program
                state, _ = fns.train_step(state, x_s, y_s, m_s, sub)
                return state, key

            t = _time_inloop(model_step, (state, jax.random.PRNGKey(1)), iters,
                             x_stack, y_stack, m_stack)
        elif mode == "halo_pallas":
            try:
                bplan = plan_halo_blocked(src, dst, n, ep, backend=halo_backend,
                                          banded_k=8)
            except ValueError as err:  # non-banded under this sharding
                print(json.dumps({"devices": ep, "error": str(err)}))
                continue
            x = jnp.asarray(
                rng.standard_normal((ep, bplan.n_local, d)).astype(np.float32))
            send_idx = jnp.asarray(bplan.send_idx)
            layouts = jax.tree.map(
                jnp.asarray,
                (bplan.int_fwd, bplan.int_rev, bplan.bnd_fwd, bplan.bnd_rev))
            l_specs = jax.tree.map(lambda _: P("ep"), layouts)
            dims = HaloDims.of(bplan)

            def fwd(params, x_stack, send, lts):
                xl = x_stack[0]
                agg = lambda h: halo_aggregate_pallas(
                    h, send, *lts, dims, use_pallas=use_pallas)
                h = jnp.maximum(agg(xl) @ params["w0a"] + xl @ params["w0b"], 0.0)
                h2 = jnp.maximum(agg(h) @ params["w1a"] + h @ params["w1b"], 0.0)
                return jax.lax.psum(jnp.sum(h2), "ep")

            sharded = shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P("ep"), P("ep"), l_specs), out_specs=P())
            grad_fn = jax.grad(sharded, argnums=(0, 1))

            def toy_step(carry, send, lts):
                params, x = carry
                gp, gx = grad_fn(params, x, send, lts)
                return (jax.tree.map(lambda p, g: p - 1e-9 * g, params, gp),
                        x - 1e-9 * gx)

            t = _time_inloop(toy_step, (params, x), iters, send_idx, layouts)
        elif mode == "halo":
            plan, n_local = plan_halo_partition(src, dst, n, ep)
            x = jnp.asarray(
                rng.standard_normal((ep, n_local, d)).astype(np.float32))
            plan_dev = jax.tree.map(jnp.asarray, plan)
            plan_specs = jax.tree.map(lambda _: P("ep"), plan_dev)

            def fwd(params, x_stack, plan_l):
                xl = x_stack[0]
                a1 = halo_aggregate(xl, plan_l, n_local)
                h = jnp.maximum(a1 @ params["w0a"] + xl @ params["w0b"], 0.0)
                a2 = halo_aggregate(h, plan_l, n_local)
                h2 = jnp.maximum(a2 @ params["w1a"] + h @ params["w1b"], 0.0)
                return jax.lax.psum(jnp.sum(h2), "ep")

            sharded = shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P("ep"), plan_specs), out_specs=P())
            grad_fn = jax.grad(sharded, argnums=(0, 1))

            def halo_step(carry, plan_l):
                params, x = carry
                gp, gx = grad_fn(params, x, plan_l)
                return (jax.tree.map(lambda p, g: p - 1e-9 * g, params, gp),
                        x - 1e-9 * gx)

            t = _time_inloop(halo_step, (params, x), iters, plan_dev)
        else:
            sf, sr, n_pad = partition_edges(src, dst, n, ep)
            x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
            step = make_sharded_sage_step(
                mesh, jax.tree.map(jnp.asarray, sf), jax.tree.map(jnp.asarray, sr),
                n_pad, use_pallas=use_pallas
            )

            def repl_step(carry):
                params, x = carry
                gp, gx = step(params, x)
                return (jax.tree.map(lambda p, g: p - 1e-9 * g, params, gp),
                        x - 1e-9 * gx)

            t = _time_inloop(repl_step, (params, x), iters)

        eps_rate = e / t
        if base_rate is None:
            base_rate, base_ep = eps_rate, ep
        # efficiency = per-device rate relative to the first measured point's
        # per-device rate (exact when the sweep starts at 1 device)
        eff = (eps_rate / ep) / (base_rate / base_ep)
        print(
            json.dumps(
                {
                    "metric": f"edges/s ({mode} ep-sharded SAGE fwd+bwd)",
                    "devices": ep,
                    "value": round(eps_rate, 1),
                    "unit": "edges/s",
                    "step_ms": round(t * 1e3, 3),
                    "iters": iters,
                    "scaling_efficiency": round(eff, 3),
                    "backend": jax.default_backend(),
                    "halo_backend": halo_backend if mode.startswith("halo") else None,
                    "fused": bool(int(os.environ.get("SCALE_FUSED", 0)))
                    if mode == "halo_model" else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
