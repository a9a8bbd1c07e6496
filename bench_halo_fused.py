"""Fused halo layer on the real chip — honest single-chip timing.

The ep=1 shard_map timing path is unusable on the axon relay: executing a
mesh-sharded executable costs ~10-20 ms/step EXTRA even though its
optimized HLO is byte-identical to the plain program (see BASELINE.md
round-3 notes; /tmp HLO diff reproduced by bench_halo_diag.py). So this
bench times the fused halo layer's ACTUAL program content — the fused
banded kernels with the boundary partial riding the resid operand, the
compact boundary segment-sums, and the dW/LN fusion — WITHOUT the
shard_map wrapper, which the HLO evidence shows adds nothing on-chip.

Two arms, same graph (headline config: N=200k, deg=16, D=H=128):

  ep1    — plan_halo_fused(ep=1): empty boundary; the halo machinery
           degenerates to the single-chip fused_ln step — directly
           comparable to the bench_ln model-family number (3.394 ms).
  shard0 — plan_halo_fused(ep=2), shard 0 (N/2 rows + real boundary):
           measures what one chip of a 2-chip halo run executes; the
           boundary-resid overhead is the delta vs ep1's per-row cost.

Step = 2 fused_ln SAGE layers fwd+bwd (+ trivial Adam-free fold-back),
house timing (fori_loop, traced args, scalar value fetch).

Prints one JSON line per arm. Env: BHF_NODES, BHF_DEG, BHF_DIM, BHF_ITERS,
BHF_ARMS (comma of ep1,shard0).

Boundary-fraction sweep (round-5 scaling-model input, VERDICT r4 item 1):
``BHF_SWEEP=0.001,0.005,0.01,0.02,0.05`` rewires that fraction of each
shard's edges to uniform-random sources on the OTHER shard (the rest stay
banded-local) and times the shard0/shard0_ov arms per fraction — the
step-time-vs-boundary-fraction curve that, combined with real plan halo
sizes and an ICI/DCN bandwidth model, yields the projected multi-chip
scaling efficiency (bench_scaling_model.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sldm_gnn_tpu.parallel.halo_fused import (
        halo_fused_sage_ln,
        halo_fused_sage_ln_ov,
        plan_halo_fused,
    )
    from sldm_gnn_tpu.parallel.halo_model import shard_node_array

    n = int(os.environ.get("BHF_NODES", 200_000))
    deg = int(os.environ.get("BHF_DEG", 16))
    d = int(os.environ.get("BHF_DIM", 128))
    iters = int(os.environ.get("BHF_ITERS", 100))
    arms = os.environ.get("BHF_ARMS", "ep1,shard0").split(",")

    rng = np.random.default_rng(0)
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-256, 257, n * deg), 0, n - 1)
    x_global = rng.standard_normal((n, d)).astype(np.float32)

    use_pallas = jax.default_backend() not in ("cpu",)

    def cross_wire(src, dst, frac, ep=2):
        """Rewire ``frac`` of each shard's edges to uniform sources on the
        OTHER shard (keeps per-shard edge counts; returns new src)."""
        half = n // ep
        out = src.copy()
        pick = rng.random(len(src)) < frac
        owner = dst // half
        other_lo = np.where(owner == 0, half, 0)
        out[pick] = other_lo[pick] + rng.integers(0, half, int(pick.sum()))
        return out

    def run_arm(name, ep, p, layer_fn=halo_fused_sage_ln, src=src,
                extra=None):
        plan = plan_halo_fused(src, dst, n, ep, banded_k=8)
        unstack = lambda t: jax.tree.map(lambda a: jnp.asarray(a[p]), t)
        int_fwd = unstack(plan.int_fwd)
        int_rev = unstack(plan.int_rev)
        bnd = unstack(plan.bnd)
        stacks = shard_node_array(x_global, ep, plan.n_local)
        hm = plan.send_idx.shape[2]
        halo = np.stack([stacks[q][plan.send_idx[q, p]] for q in range(ep)])
        halo = jnp.asarray(halo.reshape(ep * hm, d)).astype(jnp.bfloat16)
        xp = np.zeros((plan.n_pad_local, d), np.float32)
        xp[: plan.n_local] = stacks[p]
        xj = jnp.asarray(xp).astype(jnp.bfloat16)
        h = d
        params = {
            k: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
            for k, s in (
                ("wl0", (d, h)), ("wr0", (d, h)), ("b0", (h,)),
                ("g0", (h,)), ("be0", (h,)),
                ("wl1", (h, h)), ("wr1", (h, h)), ("b1", (h,)),
                ("g1", (h,)), ("be1", (h,)),
            )
        }

        def loss(pm, xq, hq, f, r, b):
            layer = lambda xx, hh, i: layer_fn(
                xx, hh, pm[f"wl{i}"], pm[f"wr{i}"], pm[f"b{i}"],
                pm[f"g{i}"], pm[f"be{i}"], f, r, b, use_pallas, 0.0)
            h1 = layer(xq, hq, 0)
            h2 = layer(h1, hq * 0, 1)  # layer-2 halo of the toy step: zeros
            return jnp.sum(h2.astype(jnp.float32))

        grad = jax.grad(loss, argnums=(0, 1, 2))

        def step(carry, f, r, b):
            pm, xq, hq = carry
            gp, gx, gh = grad(pm, xq, hq, f, r, b)
            return (jax.tree.map(lambda a, g: a - 1e-9 * g, pm, gp),
                    xq - 1e-9 * gx.astype(xq.dtype),
                    hq - 1e-9 * gh.astype(hq.dtype))

        @jax.jit
        def run(carry, f, r, b):
            return jax.lax.fori_loop(
                0, iters, lambda _, c: step(c, f, r, b), carry)

        carry = (params, xj, halo)
        warm = run(carry, int_fwd, int_rev, bnd)
        jax.tree.map(lambda a: a.block_until_ready(), warm)
        float(jax.tree.leaves(warm)[0].ravel()[0])
        t0 = time.perf_counter()
        out = run(warm, int_fwd, int_rev, bnd)
        float(jax.tree.leaves(out)[0].ravel()[0])
        t = (time.perf_counter() - t0) / iters
        e_local = int(plan.int_fwd.row_scale[p].astype(bool).sum())  # rows
        e_shard = len(src) // ep  # edges this shard owns (approx, uniform)
        rec = {
            "arm": name, "step_ms": round(t * 1e3, 3),
            "edges_per_s": round(e_shard * 2 / t, 1),  # 2 layers
            "n_local": plan.n_local,
            "boundary_edges": int((np.asarray(plan.bnd.w_f[p]) > 0).sum()),
            "resid_slots": plan.bnd.m,
            "boundary_slots": plan.bnd.m_b,
            "halo_rows_max": hm,
            "backend": jax.default_backend(),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    if "ep1" in arms:
        run_arm("ep1 (no boundary == single-chip fused_ln)", 1, 0)
    if "shard0" in arms:
        run_arm("shard0 of ep=2 (real boundary resid)", 2, 0)
    # overlap variants (halo_fused_sage_ln_ov): the interior kernel is
    # data-independent of the collective; single-chip these arms measure
    # the restructure's epilogue overhead (split LN patch + small matmul)
    if "ep1_ov" in arms:
        run_arm("ep1 OVERLAP layer", 1, 0, layer_fn=halo_fused_sage_ln_ov)
    if "shard0_ov" in arms:
        run_arm("shard0 of ep=2 OVERLAP layer", 2, 0,
                layer_fn=halo_fused_sage_ln_ov)

    sweep = os.environ.get("BHF_SWEEP", "")
    if sweep:
        for frac in (float(f) for f in sweep.split(",")):
            src_f = cross_wire(src, dst, frac)
            # actual halo volume: rows of the other shard that shard 0's
            # boundary edges reference (what the all_to_all must move)
            half = n // 2
            b0 = (dst < half) & (src_f >= half)
            uniq = len(np.unique(src_f[b0]))
            extra = {"boundary_frac": frac,
                     "halo_rows_used": uniq,
                     "halo_bytes_bf16": uniq * d * 2}
            for tag, fn in (("nonov", halo_fused_sage_ln),
                            ("ov", halo_fused_sage_ln_ov)):
                run_arm(f"sweep f={frac} {tag}", 2, 0, layer_fn=fn,
                        src=src_f, extra=dict(extra))


if __name__ == "__main__":
    main()
