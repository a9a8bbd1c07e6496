"""Diagnose the ep=1 halo-path slowdown on the real chip: time each layer
of the stack separately —

  A  spmm_banded_pallas on the halo plan's interior layout, NO shard_map
  B  the same banded aggregation inside shard_map (ep=1 mesh)
  C  halo_aggregate_pallas (banded interior + one-hot boundary + exchange)
     inside shard_map
  D  C + grad (the toy step's actual content, minus the linears)

House timing: fori_loop in ONE jitted program, value-fetch close.
Prints one JSON line per stage. Env: DIAG_NODES, DIAG_DEG, DIAG_DIM,
DIAG_ITERS, DIAG_STAGES (comma list, default A,B,C,D).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def timed(fn, carry, iters, *extra):
    import jax

    @jax.jit
    def run(c, *e):
        return jax.lax.fori_loop(0, iters, lambda _, cc: fn(cc, *e), c)

    warm = run(carry, *extra)
    jax.tree.map(lambda a: a.block_until_ready(), warm)
    # device-side slice first — np.asarray(leaf) would pull the whole
    # array over the tunnel inside the timing window
    float(jax.tree.leaves(warm)[0].ravel()[0])
    t0 = time.perf_counter()
    out = run(warm, *extra)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sldm_gnn_tpu.parallel.halo import halo_aggregate_pallas, plan_halo_blocked
    from sldm_gnn_tpu.parallel.halo_model import HaloDims
    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.ops.spmm_banded import spmm_banded_apply

    n = int(os.environ.get("DIAG_NODES", 100_000))
    deg = int(os.environ.get("DIAG_DEG", 16))
    d = int(os.environ.get("DIAG_DIM", 128))
    iters = int(os.environ.get("DIAG_ITERS", 50))
    stages = os.environ.get("DIAG_STAGES", "A,B,C,D").split(",")

    rng = np.random.default_rng(0)
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-256, 257, n * deg), 0, n - 1)
    e = len(src)
    plan = plan_halo_blocked(src, dst, n, 1, backend="banded", banded_k=8)
    dims = HaloDims.of(plan)
    mesh = make_mesh(dp=1, ep=1, devices=jax.devices()[:1])

    unstack = lambda t: jax.tree.map(lambda a: jnp.asarray(a[0]), t)
    int_fwd = unstack(plan.int_fwd)
    int_rev = unstack(plan.int_rev)
    x = jnp.asarray(rng.standard_normal((plan.n_pad_local, d)).astype(np.float32))

    def report(stage, t):
        print(json.dumps({"stage": stage, "step_ms": round(t * 1e3, 3),
                          "edges_per_s": round(e / t, 1)}), flush=True)

    if "A" in stages:
        def agg_step(c):
            out = spmm_banded_apply(c, int_fwd, int_rev, True)
            return c + 1e-9 * out
        report("A banded no-shard_map fwd", timed(agg_step, x, iters))

    if "G" in stages:
        # fwd+bwd WITHOUT shard_map: isolates the reverse kernel itself
        gg = jax.grad(lambda c, f, r: jnp.sum(
            spmm_banded_apply(c, f, r, True) ** 2))

        def gstep(c, f, r):
            return c - 1e-9 * gg(c, f, r)
        report("G banded no-shard_map fwd+bwd",
               timed(gstep, x, iters, int_fwd, int_rev))

    layouts = jax.tree.map(
        jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev))
    l_specs = jax.tree.map(lambda _: P("ep"), layouts)
    send_idx = jnp.asarray(plan.send_idx)
    x_stack = x[: plan.n_local][None]

    if "B" in stages:
        def body_b(xs, lts):
            xl = xs[0]
            xp = jnp.pad(xl, ((0, plan.n_pad_local - xl.shape[0]), (0, 0)))
            fwd_l = jax.tree.map(lambda a: a[0], lts[0])
            rev_l = jax.tree.map(lambda a: a[0], lts[1])
            out = spmm_banded_apply(xp, fwd_l, rev_l, True)
            return (xl + 1e-9 * out[: plan.n_local])[None]

        sm_b = shard_map(body_b, mesh=mesh, in_specs=(P("ep"), l_specs),
                         out_specs=P("ep"))
        report("B banded in shard_map fwd",
               timed(lambda c, lts: sm_b(c, lts), x_stack, iters, layouts))

    if "C" in stages:
        def body_c(xs, send, lts):
            xl = xs[0]
            out = halo_aggregate_pallas(xl, send, *lts, dims, use_pallas=True)
            return (xl + 1e-9 * out)[None]

        sm_c = shard_map(body_c, mesh=mesh,
                         in_specs=(P("ep"), P("ep"), l_specs),
                         out_specs=P("ep"))
        report("C halo_aggregate_pallas fwd",
               timed(lambda c, s_, lts: sm_c(c, s_, lts), x_stack, iters,
                     send_idx, layouts))

    if "D" in stages:
        def fwd_d(xs, send, lts):
            xl = xs[0]
            out = halo_aggregate_pallas(xl, send, *lts, dims, use_pallas=True)
            return jax.lax.psum(jnp.sum(out * out), "ep")

        sm_d = shard_map(fwd_d, mesh=mesh,
                         in_specs=(P("ep"), P("ep"), l_specs), out_specs=P())
        gd = jax.grad(sm_d, argnums=0)

        def step_d(c, send, lts):
            return c - 1e-9 * gd(c, send, lts)

        report("D halo agg fwd+bwd",
               timed(step_d, x_stack, iters, send_idx, layouts))

    if "E" in stages:
        # interior-only: banded kernels under shard_map, fwd+bwd — no
        # halo exchange, no boundary kernel
        def fwd_e(xs, lts):
            xl = xs[0]
            xp = jnp.pad(xl, ((0, plan.n_pad_local - xl.shape[0]), (0, 0)))
            fwd_l = jax.tree.map(lambda a: a[0], lts[0])
            rev_l = jax.tree.map(lambda a: a[0], lts[1])
            out = spmm_banded_apply(xp, fwd_l, rev_l, True)[: plan.n_local]
            return jax.lax.psum(jnp.sum(out * out), "ep")

        sm_e = shard_map(fwd_e, mesh=mesh, in_specs=(P("ep"), l_specs),
                         out_specs=P())
        ge = jax.grad(sm_e, argnums=0)
        report("E interior banded fwd+bwd (shard_map)",
               timed(lambda c, lts: c - 1e-9 * ge(c, lts), x_stack, iters,
                     layouts))

    if "H" in stages:
        # H-variants: where does the ~20x shard_map forward overhead live?
        def body_h(xs, lts):
            xl = xs[0]
            xp = jnp.pad(xl, ((0, plan.n_pad_local - xl.shape[0]), (0, 0)))
            fwd_l = jax.tree.map(lambda a: a[0], lts[0])
            rev_l = jax.tree.map(lambda a: a[0], lts[1])
            out = spmm_banded_apply(xp, fwd_l, rev_l, True)
            return (xl + 1e-9 * out[: plan.n_local])[None]

        # H1: check_vma=False (no varying-manual-axes rewrite)
        sm_h1 = shard_map(body_h, mesh=mesh, in_specs=(P("ep"), l_specs),
                          out_specs=P("ep"), check_vma=False)
        report("H1 B with check_vma=False",
               timed(lambda c, lts: sm_h1(c, lts), x_stack, iters, layouts))

        # H2: layouts REPLICATED (P()) instead of ep-sharded — isolates the
        # stacked-layout slicing/copies
        int2 = jax.tree.map(lambda a: a[0], (layouts[0], layouts[1]))

        def body_h2(xs, lts2):
            xl = xs[0]
            xp = jnp.pad(xl, ((0, plan.n_pad_local - xl.shape[0]), (0, 0)))
            out = spmm_banded_apply(xp, lts2[0], lts2[1], True)
            return (xl + 1e-9 * out[: plan.n_local])[None]

        l2_specs = jax.tree.map(lambda _: P(), int2)
        sm_h2 = shard_map(body_h2, mesh=mesh, in_specs=(P("ep"), l2_specs),
                          out_specs=P("ep"))
        report("H2 layouts replicated P()",
               timed(lambda c, l2: sm_h2(c, l2), x_stack, iters, int2))

        # H3: EVERYTHING replicated — shard_map wrapping with zero
        # partitioned operands
        def body_h3(x_, lts2):
            out = spmm_banded_apply(x_, lts2[0], lts2[1], True)
            return x_ + 1e-9 * out

        sm_h3 = shard_map(body_h3, mesh=mesh,
                          in_specs=(P(), l2_specs), out_specs=P())
        report("H3 all operands replicated",
               timed(lambda c, l2: sm_h3(c, l2), x, iters, int2))

    if "F" in stages:
        # boundary-only: halo gather + all_to_all + one-hot kernels fwd+bwd
        from sldm_gnn_tpu.ops.spmm import spmm_apply

        def fwd_f(xs, send, lts):
            xl = xs[0]
            outgoing = xl[send[0]]
            halo = jax.lax.all_to_all(outgoing, "ep", split_axis=0,
                                      concat_axis=0)
            hrows = halo.reshape(-1, xl.shape[1])
            hb = jnp.pad(hrows, ((0, plan.n_pad_bnd - hrows.shape[0]), (0, 0)))
            bf = jax.tree.map(lambda a: a[0], lts[2])
            br = jax.tree.map(lambda a: a[0], lts[3])
            out = spmm_apply(hb, bf, br, plan.n_pad_bnd, True,
                             plan.k_per_step)[: plan.n_local]
            return jax.lax.psum(jnp.sum(out * out), "ep")

        sm_f = shard_map(fwd_f, mesh=mesh,
                         in_specs=(P("ep"), P("ep"), l_specs), out_specs=P())
        gf = jax.grad(sm_f, argnums=0)
        report("F boundary one-hot fwd+bwd (shard_map)",
               timed(lambda c, send, lts: c - 1e-9 * gf(c, send, lts),
                     x_stack, iters, send_idx, layouts))


if __name__ == "__main__":
    main()
