"""Config-3 benchmark: neighbor-sampled mini-batch training throughput.

One chip, fanout [25,10] (BASELINE.json configs[2]) on the headline-class
locality graph: seed batches → host numpy fanout sampling (the PyG
NeighborLoader replacement, data/sampler.py) → jitted SampledSage train
step, with sampling overlapped via the prefetch thread
(train/sampled_loop.py). Reports BOTH the raw host sampling rate (the
2-CPU budget check) and the overlapped steady-state training rate.

Prints exactly ONE JSON line:
  {"metric": "seeds/s (sampled mini-batch train, fanout [25,10])", ...}

Env knobs: BENCH_NODES, BENCH_DEG, BENCH_DIM, BENCH_BATCH, BENCH_FANOUTS
(comma list), BENCH_STEPS, BENCH_HIDDEN, BENCH_SCAN (scan-batched mode:
H pre-sampled trees per jitted call via lax.scan — amortizes the
per-batch dispatch/RTT that dominates the dispatched number; 0 = off),
BENCH_DEVICE=1 (fully device-side sampling: CSR on device, only seed ids
cross the host boundary — the fastest mode, 4.7× measured).
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
from sldm_gnn_tpu.data.prefetch import Prefetcher
from sldm_gnn_tpu.data.sampler import NeighborSampler
from sldm_gnn_tpu.models.sampled_sage import SampledSage
from sldm_gnn_tpu.train.loop import make_optimizer
from sldm_gnn_tpu.train.sampled_loop import (
    make_sampled_scan_step,
    make_sampled_step_fns,
    sampled_batches,
    stack_sampled_batches,
)


def main():
    n = int(os.environ.get("BENCH_NODES", 200_000))
    deg = int(os.environ.get("BENCH_DEG", 16))
    d = int(os.environ.get("BENCH_DIM", 128))
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    fanouts = tuple(int(f) for f in os.environ.get("BENCH_FANOUTS", "25,10").split(","))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    hidden = int(os.environ.get("BENCH_HIDDEN", 128))

    src, dst = make_local_graph(n, deg)
    labels = np.random.default_rng(3).integers(0, 16, n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    sampler = NeighborSampler(src, dst, n)

    # ---- raw host sampling rate (no device work): the 2-CPU budget check
    seeds = rng.permutation(n)[: batch * 8]
    t0 = time.perf_counter()
    for s in range(0, len(seeds), batch):
        sampler.sample(seeds[s:s + batch], fanouts, rng=rng)
    t_sample = (time.perf_counter() - t0) / (len(seeds) / batch)
    host_seeds_s = batch / t_sample

    # ---- overlapped training steady state
    model = SampledSage(hidden_dims=(hidden,) * len(fanouts), out_dim=16)
    train_step, _eval, init = make_sampled_step_fns(
        model, make_optimizer(1e-3, 5e-5), fanouts)
    probe = sampler.sample(seeds[:batch], fanouts, rng=rng)
    levels0 = tuple(jnp.asarray(l) for l in probe.levels)
    masks0 = tuple(jnp.asarray(m) for m in probe.masks)
    state = init(jax.random.PRNGKey(0), x, levels0, masks0)
    key = jax.random.PRNGKey(1)

    def run(n_steps):
        nonlocal state, key
        it = Prefetcher(
            sampled_batches(sampler, np.arange(n), batch, fanouts, labels,
                            rng=rng), depth=4)
        edges = 0
        done = 0
        loss = None
        for levels, masks, y, _, n_edges in it:
            key, sub = jax.random.split(key)
            state, loss = train_step(state, x, levels, masks, y, sub)
            edges += n_edges  # THIS batch's host-counted valid tree edges
            done += 1
            if done >= n_steps:
                break
        float(loss)  # value fetch closes the timing window
        return edges

    if int(os.environ.get("BENCH_DEVICE", 0)):
        # fully device-side sampling (train/sampled_loop.device_sample_tree):
        # CSR resident on device; only [B] seed ids cross the host boundary
        from sldm_gnn_tpu.train.sampled_loop import (
            csr_device_arrays, dense_nbr_table, make_device_sampled_step_fns)

        indptr, nbr, degj = csr_device_arrays(sampler)
        table = None
        if int(os.environ.get("BENCH_DENSE", 0)):
            table, degj = dense_nbr_table(sampler)
        xx_dev = x.astype(jnp.bfloat16) if int(os.environ.get(
            "BENCH_BF16", 0)) else x
        dtrain, _, dinit = make_device_sampled_step_fns(
            model, make_optimizer(1e-3, 5e-5), fanouts, indptr, nbr, degj,
            nbr_table=table)
        dstate = dinit(jax.random.PRNGKey(0), xx_dev, batch)
        labels_j = jnp.asarray(labels.astype(np.int32))
        key_d = jax.random.PRNGKey(1)

        # in-loop window: seeds drawn ON DEVICE per step, all `steps`
        # iterations inside ONE jitted fori_loop — the fully-device
        # config-3 pipeline with zero host round-trips, immune to the
        # relay's per-dispatch drift (the loss-only A/B measured the SAME
        # program at 7.0 ms one day and 10.9-13.8 ms another through
        # dispatched timing; BASELINE.md round-4 note)
        @jax.jit
        def run_k(state, xx, key, k):
            def body(_, carry):
                st, ky, acc = carry
                ky, s1, s2 = jax.random.split(ky, 3)
                seeds = jax.random.randint(s1, (batch,), 0, n,
                                           dtype=jnp.int32)
                st, (loss, n_e) = dtrain(st, xx, seeds, labels_j[seeds], s2)
                return st, ky, acc + n_e  # int32: ~280k edges/step, <2^31
            return jax.lax.fori_loop(
                0, k, body, (state, key, jnp.zeros((), jnp.int32)))

        dstate, key_d, _ = run_k(dstate, xx_dev, key_d, steps)  # compile+warm
        float(jax.tree.leaves(dstate.params)[0].ravel()[0])
        t0 = time.perf_counter()
        dstate, key_d, edges_acc = run_k(dstate, xx_dev, key_d, steps)
        float(jax.tree.leaves(dstate.params)[0].ravel()[0])
        dt = time.perf_counter() - t0
        # MEASURED sampled-edge throughput: valid tree slots counted on
        # device (masked zero-degree slots excluded)
        edges_valid = int(edges_acc)
        print(json.dumps({
            "metric": "seeds/s (DEVICE-sampled mini-batch train, fanout "
                      f"{list(fanouts)})",
            "value": round(steps * batch / dt, 1),
            "unit": "seeds/s",
            "vs_baseline": None,
            "backend": jax.default_backend(),
            "tree_edges_per_s": round(edges_valid / dt, 1),
            "host_sampling_seeds_per_s": round(host_seeds_s, 1),
            "nodes": n, "deg": deg, "feat_dim": d, "batch": batch,
            "hidden": hidden, "steps": steps,
            "dense_table": table is not None,
            "feat_dtype": str(xx_dev.dtype),
            "step_ms": round(dt / steps * 1e3, 3),
        }))
        return

    scan_h = int(os.environ.get("BENCH_SCAN", 0))
    if scan_h:
        # scan-batched mode: H pre-sampled trees per jitted call
        scan_step = make_sampled_scan_step(model, fanouts)

        def sample_group(h):
            bs = [sampler.sample(rng.integers(0, n, batch), fanouts, rng=rng)
                  for _ in range(h)]
            edges = sum(int(m.sum()) for b in bs for m in b.masks[1:])
            return stack_sampled_batches(bs, labels), edges

        def groups():
            while True:
                yield sample_group(scan_h)

        def run_scan(n_groups):
            nonlocal state, key
            it = Prefetcher(groups(), depth=2)
            edges = done = 0
            losses = None
            for (levels_h, masks_h, y_h), ge in it:
                key, sub = jax.random.split(key)
                state, losses = scan_step(state, x, levels_h, masks_h,
                                          y_h, sub)
                edges += ge
                done += 1
                if done >= n_groups:
                    break
            float(losses.ravel()[0])
            return edges

        n_groups = max(1, steps // scan_h)
        run_scan(1)  # compile + warm
        t0 = time.perf_counter()
        edges = run_scan(n_groups)
        dt = time.perf_counter() - t0
        steps_done = n_groups * scan_h
    else:
        run(3)  # compile + warm
        t0 = time.perf_counter()
        edges = run(steps)
        dt = time.perf_counter() - t0
        steps_done = steps
    seeds_s = steps_done * batch / dt
    print(json.dumps({
        "metric": "seeds/s (sampled mini-batch train, fanout "
                  f"{list(fanouts)})",
        "value": round(seeds_s, 1),
        "unit": "seeds/s",
        "vs_baseline": None,
        "backend": jax.default_backend(),
        "sampled_edges_per_s": round(edges / dt, 1),
        "host_sampling_seeds_per_s": round(host_seeds_s, 1),
        "overlap_efficiency": round(seeds_s / host_seeds_s, 3),
        "nodes": n, "deg": deg, "feat_dim": d, "batch": batch,
        "hidden": hidden, "steps": steps_done, "scan": scan_h or None,
        "step_ms": round(dt / steps_done * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
