"""Phase budget for the device-sampled training step (config 3).

Round-4 verdict Weak #2: the 7.5 ms batch-1024 fanout-[25,10] step
(37.5M sampled edges/s) had no time budget. This harness isolates, each
phase as its own jitted fori_loop (device-drawn seeds, carried
dependency chain, scalar value-fetch close — bench_roofline.py's
dispatch-free methodology):

  sample   — device_sample_tree alone (CSR gathers + rng)
  gather   — sample + the per-level feature gathers x[levels]
  fwd      — sample + gather + SampledSage forward + CE loss
  full     — the complete train step (fwd + bwd + Adam)

and prints the deltas (gather-sample = feature-gather cost, etc.) plus
an analytic byte/FLOP budget. Env: BENCH_NODES/DEG/DIM/BATCH/FANOUTS/
HIDDEN/ITERS, BENCH_BF16=1 to store the feature table in bfloat16.

Reference anchor: PyG NeighborLoader's role
(/root/reference/install_dependencies.sh:10); BASELINE.json configs[2].
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_local_graph
from sldm_gnn_tpu.data.sampler import NeighborSampler
from sldm_gnn_tpu.models.sampled_sage import SampledSage
from sldm_gnn_tpu.train.loop import make_optimizer
from sldm_gnn_tpu.train.sampled_loop import (
    csr_device_arrays,
    dense_nbr_table,
    device_sample_tree,
    make_device_sampled_step_fns,
)

HBM_GBPS = 819.0


def main():
    n = int(os.environ.get("BENCH_NODES", 200_000))
    deg = int(os.environ.get("BENCH_DEG", 16))
    d = int(os.environ.get("BENCH_DIM", 128))
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    fanouts = tuple(int(f) for f in
                    os.environ.get("BENCH_FANOUTS", "25,10").split(","))
    hidden = int(os.environ.get("BENCH_HIDDEN", 128))
    iters = int(os.environ.get("BENCH_ITERS", 100))
    bf16 = bool(int(os.environ.get("BENCH_BF16", 0)))
    dense = bool(int(os.environ.get("BENCH_DENSE", 0)))

    src, dst = make_local_graph(n, deg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    if bf16:
        x = x.astype(jnp.bfloat16)
    labels_j = jnp.asarray(
        np.random.default_rng(3).integers(0, 16, n).astype(np.int32))
    sampler = NeighborSampler(src, dst, n)
    indptr, nbr, degj = csr_device_arrays(sampler)
    table = None
    if dense:
        table, degj = dense_nbr_table(sampler)
    key0 = jax.random.PRNGKey(1)

    def seeds_of(ky, salt):
        return jax.random.randint(ky, (batch,), 0, n, dtype=jnp.int32) + salt

    def timeit(body, carry0):
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, iters, body, carry)

        carry = run(carry0)
        float(jnp.asarray(jax.tree.leaves(carry)[0]).ravel()[0]
              .astype(jnp.float32))
        t0 = time.perf_counter()
        carry = run(carry)
        float(jnp.asarray(jax.tree.leaves(carry)[0]).ravel()[0]
              .astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    # ---- sample: tree gathers + rng only; levels feed the carry so no
    # iteration is loop-invariant
    def body_sample(i, carry):
        acc, ky = carry
        ky, s1, s2 = jax.random.split(ky, 3)
        seeds = seeds_of(s1, acc % 1)
        levels, masks = device_sample_tree(seeds, indptr, nbr, degj,
                                           fanouts, s2, nbr_table=table)
        out = sum(l.sum() for l in levels)
        return (acc + out % 1000).astype(jnp.int32), ky

    t_sample = timeit(body_sample, (jnp.zeros((), jnp.int32), key0))

    # ---- gather: + feature rows
    def body_gather(i, carry):
        acc, ky = carry
        ky, s1, s2 = jax.random.split(ky, 3)
        seeds = seeds_of(s1, jnp.int32(0) * (acc.astype(jnp.int32) % 1))
        levels, masks = device_sample_tree(seeds, indptr, nbr, degj,
                                           fanouts, s2, nbr_table=table)
        feats = [x[l] for l in levels]
        out = sum(f.astype(jnp.float32).sum() for f in feats)
        return acc + out * 1e-20, ky

    t_gather = timeit(body_gather, (jnp.zeros(()), key0))

    # ---- fwd: + model + loss
    model = SampledSage(hidden_dims=(hidden,) * len(fanouts), out_dim=16)
    sizes = [batch]
    for f in fanouts:
        sizes.append(sizes[-1] * f)
    params0 = model.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((s, d), x.dtype) for s in sizes],
        [jnp.ones(s, bool) for s in sizes], fanouts)["params"]

    def loss_of(params, seeds, ky):
        levels, masks = device_sample_tree(seeds, indptr, nbr, degj,
                                           fanouts, ky, nbr_table=table)
        feats = [x[l] for l in levels]
        logits = model.apply({"params": params}, feats, masks, fanouts)
        logp = jax.nn.log_softmax(logits)
        y = labels_j[seeds]
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    def body_fwd(i, carry):
        params, ky = carry
        ky, s1, s2 = jax.random.split(ky, 3)
        loss = loss_of(params, seeds_of(s1, 0), s2)
        params = jax.tree.map(lambda a: a + loss * 1e-20, params)
        return params, ky

    t_fwd = timeit(body_fwd, (params0, key0))

    # ---- full train step
    dtrain, _, dinit = make_device_sampled_step_fns(
        model, make_optimizer(1e-3, 5e-5), fanouts, indptr, nbr, degj,
        nbr_table=table)
    dstate = dinit(jax.random.PRNGKey(0), x, batch)

    def body_full(i, carry):
        st, ky = carry
        ky, s1, s2 = jax.random.split(ky, 3)
        seeds = seeds_of(s1, 0)
        st, _ = dtrain.__wrapped__(st, x, seeds, labels_j[seeds], s2) \
            if hasattr(dtrain, "__wrapped__") else dtrain(
                st, x, seeds, labels_j[seeds], s2)
        return st, ky

    t_full = timeit(body_full, (dstate, key0))

    # ---- analytic budget
    tree_rows = sum(sizes[1:])
    all_rows = sum(sizes)
    fbytes = 2 if bf16 else 4
    gather_bytes = all_rows * d * fbytes
    flops = 0
    reps = sizes[:]
    for layer in range(len(fanouts)):
        for lvl in range(len(fanouts) - layer):
            k = reps[lvl]
            din = d if layer == 0 else hidden
            flops += 2 * k * din * hidden * 2  # lin_l + lin_r
    out = {
        "metric": "device-sampled step phase budget",
        "batch": batch, "fanouts": list(fanouts), "hidden": hidden,
        "feat_dtype": "bf16" if bf16 else "f32",
        "nbr_layout": "dense_table" if dense else "csr",
        "sample_ms": round(t_sample, 3),
        "gather_ms": round(t_gather, 3),
        "fwd_ms": round(t_fwd, 3),
        "full_ms": round(t_full, 3),
        "delta_feature_gather_ms": round(t_gather - t_sample, 3),
        "delta_model_fwd_ms": round(t_fwd - t_gather, 3),
        "delta_bwd_opt_ms": round(t_full - t_fwd, 3),
        "seeds_per_s": round(batch / t_full * 1e3, 1),
        "budget": {
            "tree_rows": tree_rows,
            "feature_gather_GB": round(gather_bytes / 1e9, 4),
            "gather_hbm_ms": round(gather_bytes / (HBM_GBPS * 1e6), 3),
            "fwd_GFLOP": round(flops / 1e9, 2),
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
