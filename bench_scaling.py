"""Edge-partitioned scaling harness (BASELINE configs 4-5).

Runs the ep-sharded 2-layer GraphSAGE fwd+bwd step over meshes of
increasing size and reports edges/s per point, plus scaling efficiency
relative to 1 device. On real multi-chip hardware this is the ≥80%
edges/s scaling study; on a single host it validates the harness over the
virtual CPU device mesh (set
``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu``).

Prints one JSON line per mesh size.

Env knobs: SCALE_NODES, SCALE_DEG, SCALE_DIM, SCALE_POINTS (comma list).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # the container's sitecustomize registers the axon TPU backend at
    # interpreter start, so the JAX_PLATFORMS env var alone is too late —
    # honor it (and SCALE_CPU=1) via the config API before the first jax op
    if os.environ.get("SCALE_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.parallel.edge_partition import partition_edges, make_sharded_sage_step
    from sldm_gnn_tpu.parallel.halo import (
        make_halo_pallas_sage_step,
        make_halo_sage_step,
        plan_halo_blocked,
        plan_halo_partition,
    )

    n = int(os.environ.get("SCALE_NODES", 100_000))
    deg = int(os.environ.get("SCALE_DEG", 16))
    d = int(os.environ.get("SCALE_DIM", 128))
    n_dev = len(jax.devices())
    points = [
        int(p)
        for p in os.environ.get("SCALE_POINTS", "1,2,4,8").split(",")
        if int(p) <= n_dev
    ]

    # 'replicated' | 'halo' (segment-sum) | 'halo_pallas' (per-shard blocked
    # kernels; SCALE_HALO_BACKEND picks banded/dense/onehot layouts)
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
        if mode == "halo_pallas":
            try:
                bplan = plan_halo_blocked(src, dst, n, ep, backend=halo_backend,
                                          banded_k=8)
            except ValueError as err:  # non-banded under this sharding
                print(json.dumps({"devices": ep, "error": str(err)}))
                continue
            x = jnp.asarray(
                rng.standard_normal((ep, bplan.n_local, d)).astype(np.float32)
            )
            step = make_halo_pallas_sage_step(mesh, bplan, use_pallas=use_pallas)
        elif mode == "halo":
            plan, n_local = plan_halo_partition(src, dst, n, ep)
            x = jnp.asarray(
                rng.standard_normal((ep, n_local, d)).astype(np.float32)
            )
            step = make_halo_sage_step(mesh, jax.tree.map(jnp.asarray, plan), n_local)
        else:
            sf, sr, n_pad = partition_edges(src, dst, n, ep)
            x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
            step = make_sharded_sage_step(
                mesh, jax.tree.map(jnp.asarray, sf), jax.tree.map(jnp.asarray, sr),
                n_pad, use_pallas=use_pallas
            )
        out = step(params, x)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(params, x)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        t = (time.perf_counter() - t0) / iters
        eps_rate = e / t
        if base_rate is None:
            base_rate, base_ep = eps_rate, ep
        # efficiency = per-device rate relative to the first measured point's
        # per-device rate (exact when the sweep starts at 1 device)
        eff = (eps_rate / ep) / (base_rate / base_ep)
        print(
            json.dumps(
                {
                    "metric": f"edges/s ({mode} ep-sharded 2-layer SAGE fwd+bwd)",
                    "devices": ep,
                    "value": round(eps_rate, 1),
                    "unit": "edges/s",
                    "scaling_efficiency": round(eff, 3),
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
