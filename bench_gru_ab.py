"""Training-convergence A/B: gru_impl='scan' vs 'pallas' end to end.

The fused GRU kernel's per-op error is ~1e-2 rel (bf16 operands); the
deployment question is whether TRAINING on it converges to the same
place. This runs the full flagship recipe (batch 32, frames 100, hidden
96, map branch, dropout 0.25 — /root/reference/main.py:22-54) twice from
identical initial parameters and rng streams, once per GRU impl, and
reports the loss trajectories + final 0.5-threshold accuracy on the
training batch set.

Env: AB_STEPS (default 300), AB_BATCHES (default 8 distinct batches
cycled), AB_BATCH (graphs per batch, default 32). One JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from bench_flagship import synth_graph, synth_map
from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.train.loop import build_step_fns, make_optimizer


def main():
    steps = int(os.environ.get("AB_STEPS", 300))
    n_batches = int(os.environ.get("AB_BATCHES", 8))
    b = int(os.environ.get("AB_BATCH", 32))
    frames, hidden, labels = 100, 96, 4

    rng = np.random.default_rng(0)
    map_data = synth_map(rng, 1000)
    batches = []
    for _ in range(n_batches):
        graphs = [synth_graph(rng, frames, labels) for _ in range(b)]
        vmax = max(g.num_nodes for g in graphs)
        dims = BatchDims(
            node_capacity=((b * vmax + 7) // 8) * 8,
            edge_capacity=((sum(g.num_edges for g in graphs) + 127) // 128)
            * 128,
            graph_capacity=b, num_frames=frames, num_labels=labels)
        batches.append(jax.tree.map(jnp.asarray,
                                    pad_and_batch(graphs, dims)))

    out = {"metric": "GRU impl training A/B (flagship recipe)",
           "steps": steps, "batches": n_batches, "batch": b,
           "backend": jax.default_backend()}
    results = {}
    impls = tuple(os.environ.get("AB_IMPLS", "scan,pallas").split(","))
    for impl in impls:
        cfg = GruSageConfig(
            frames_num=frames, gru_hidden_size=hidden, fc1dims=(hidden,),
            sage_hidden_dims=(hidden, hidden), fc2dims=(32,),
            out_dim=labels, emb_dim=8, dropout=0.25, negative_slope=0.1,
            map_included=True, gru_impl=impl)
        model = GruSage(cfg)
        fns = build_step_fns(model, make_optimizer(1e-3, 5e-5),
                             map_data=map_data)
        state = fns.init(jax.random.PRNGKey(0), batches[0])
        key = jax.random.PRNGKey(1)
        losses, accs = [], []
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = fns.train_step(state, batches[i % n_batches],
                                      jax.random.fold_in(key, i))
            if i % 25 == 0 or i == steps - 1:
                losses.append(round(float(m["loss"]), 5))
        # final 0.5-threshold accuracy over all batches
        tot = cor = 0
        for bt in batches:
            mm = fns.eval_step(state.params, bt)
            cor += float(np.asarray(mm["correct"]).sum())
            tot += float(mm["n_graphs"]) * labels
        results[impl] = {"loss_curve": losses,
                         "final_acc": round(cor / tot, 5),
                         "train_s": round(time.perf_counter() - t0, 1)}
    out.update(results)
    fast = [i for i in impls if i != "scan"][-1]
    out["final_acc_delta"] = round(
        results[fast]["final_acc"] - results["scan"]["final_acc"], 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
