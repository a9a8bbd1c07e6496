"""Flagship training-step benchmark: full GruSage (GRU + map branch +
GraphSAGE) jitted fwd+bwd+Adam at the reference's default recipe
(/root/reference/main.py:22-54 — batch 32, frames 100, hidden 96, emb 8,
dropout 0.25, map top-k 5) on synthetic graphs with a 1000-segment map.

Prints one JSON line with ms/step and graphs/s. Env knobs: FLAG_BATCH,
FLAG_FRAMES, FLAG_HIDDEN, FLAG_SEGMENTS, FLAG_ITERS, FLAG_NO_MAP,
FLAG_GRU_PAD (0 disables the MXU-aligned GRU hidden padding).

Timing mode: DEFAULT is in-loop — one jitted ``lax.fori_loop`` runs all
iterations in a single dispatch, so the remote relay's per-dispatch
latency (which produced the round-3 "flagship drift" scare, BASELINE.md)
never enters the numbers; the window closes with a device-side scalar
fetch. ``FLAG_DISPATCHED=1`` restores the old per-step dispatch timing
(useful only to measure dispatch overhead itself).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from sldm_gnn_tpu.graph.batching import (BatchDims, pad_and_batch,
                                          pad_and_batch_aligned)
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.models.map_modules import MapData, map_zscore_norm
from sldm_gnn_tpu.train.loop import build_step_fns, make_optimizer


def synth_graph(rng, frames, labels):
    v = int(rng.integers(8, 12))
    x = rng.standard_normal((v, frames, 6)).astype(np.float32)
    x[:, :, 5] = 1.0
    src, dst = np.meshgrid(np.arange(v), np.arange(v))
    m = src != dst
    return GraphArrays(
        x=x,
        xsttype=rng.integers(0, 10, v).astype(np.int32),
        xdims=rng.uniform(1.5, 5.0, (v, 2)).astype(np.float32),
        edge_index=np.stack([src[m], dst[m]]).astype(np.int32),
        edge_attr=np.zeros((int(m.sum()), 4), np.float32),
        y=(rng.random(labels) < 0.3).astype(np.float32),
    )


def synth_map(rng, segments):
    feats = rng.standard_normal((segments, 9)).astype(np.float32)
    return MapData(
        feats=map_zscore_norm(jnp.asarray(feats)),
        lane_type_cats=jnp.asarray(rng.integers(0, 8, segments).astype(np.int32)),
        edge_src=jnp.asarray(rng.integers(0, segments, 4 * segments).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, segments, 4 * segments).astype(np.int32)),
        centroids=jnp.asarray(rng.standard_normal((segments, 2)).astype(np.float32) * 100),
    )


def maybe_dense_map(md):
    """FLAG_MAP_DENSE=1: scatter-free map encoder (MapData.adj)."""
    if md is None or not int(os.environ.get("FLAG_MAP_DENSE", 0)):
        return md
    from dataclasses import replace

    from sldm_gnn_tpu.models.map_modules import dense_map_adj

    return replace(md, adj=jnp.asarray(dense_map_adj(md)))


def main():
    b = int(os.environ.get("FLAG_BATCH", 32))
    frames = int(os.environ.get("FLAG_FRAMES", 100))
    hidden = int(os.environ.get("FLAG_HIDDEN", 96))
    segments = int(os.environ.get("FLAG_SEGMENTS", 1000))
    # ms-scale steps: hundreds of iterations amortize the remote relay's
    # per-dispatch latency + the closing value-fetch RTT
    iters = int(os.environ.get("FLAG_ITERS", 300))
    with_map = not int(os.environ.get("FLAG_NO_MAP", 0))
    # default matches GruSageConfig (None = stock width; padding measured
    # neutral-to-slower at corrected timing, see BASELINE.md)
    gru_pad = int(os.environ.get("FLAG_GRU_PAD", 0)) or None
    # 'scan' (f32 parity) or 'pallas' (row-blocked fused kernel)
    gru_impl = os.environ.get("FLAG_GRU_IMPL", "scan")
    # 'topk' (XLA lax.top_k) or 'pallas' (fused distance+select kernel)
    knn_impl = os.environ.get("FLAG_KNN_IMPL", "topk")
    # None (f32) or 'bfloat16' (mixed-precision dense/SAGE stacks)
    cdtype = os.environ.get("FLAG_DTYPE") or None
    labels = 4

    # block-diagonal dense-adjacency layout: scatter-free SAGE + pooling
    dense = bool(int(os.environ.get("FLAG_DENSE", 0)))
    rng = np.random.default_rng(0)
    graphs = [synth_graph(rng, frames, labels) for _ in range(b)]
    vmax = max(g.num_nodes for g in graphs)
    if dense:
        batch = jax.tree.map(jnp.asarray, pad_and_batch_aligned(
            graphs, vmax, num_frames=frames, num_labels=labels))
    else:
        dims = BatchDims(
            node_capacity=((b * vmax + 7) // 8) * 8,
            edge_capacity=((sum(g.num_edges for g in graphs) + 127) // 128) * 128,
            graph_capacity=b,
            num_frames=frames,
            num_labels=labels,
        )
        batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, dims))
    map_data = maybe_dense_map(synth_map(rng, segments)) if with_map else None

    cfg = GruSageConfig(
        frames_num=frames,
        gru_hidden_size=hidden,
        fc1dims=(hidden,),
        sage_hidden_dims=(hidden, hidden),
        fc2dims=(32,),
        out_dim=labels,
        emb_dim=8,
        dropout=0.25,
        negative_slope=0.1,
        map_included=with_map,
        gru_pad_to=gru_pad,
        gru_impl=gru_impl,
        knn_impl=knn_impl,
        compute_dtype=cdtype,
    )
    model = GruSage(cfg)
    opt = make_optimizer(1e-3, 5e-5)
    if int(os.environ.get("FLAG_FLAT_OPT", 0)):
        # single-vector Adam: one fused update kernel instead of ~40
        # per-leaf ones (A/B knob; state structure differs from the
        # checkpoint-parity default)
        import optax
        opt = optax.flatten(opt)
    fns = build_step_fns(model, opt, map_data=map_data)
    state = fns.init(jax.random.PRNGKey(0), batch)

    rkey = jax.random.PRNGKey(1)
    dispatched = bool(int(os.environ.get("FLAG_DISPATCHED", 0)))
    if dispatched:
        state, m = fns.train_step(state, batch, rkey)
        jax.tree.map(lambda a: a.block_until_ready(), state.params)
        float(m["loss"])  # warm the value-fetch path
        t0 = time.perf_counter()
        for i in range(iters):
            rkey = jax.random.fold_in(rkey, i)
            state, m = fns.train_step(state, batch, rkey)
        float(m["loss"])  # close the timing window (remote-relay drain)
        dt = (time.perf_counter() - t0) / iters
    else:
        # in-loop mode: iters steps in ONE dispatch; the relay RTT is paid
        # once, and the close is a device-side scalar fetch (CLAUDE.md)
        @jax.jit
        def run_k(state, batch, key):
            def body(i, st):
                st2, _ = fns.train_step(st, batch, jax.random.fold_in(key, i))
                return st2
            return jax.lax.fori_loop(0, iters, body, state)

        def close(st):
            return float(jax.tree.leaves(st.params)[0].ravel()[0])

        state = run_k(state, batch, rkey)  # compile + warm
        close(state)
        t0 = time.perf_counter()
        state = run_k(state, batch, jax.random.fold_in(rkey, 10**6))
        close(state)
        dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "flagship GruSage train step (fwd+bwd+Adam)",
        "ms_per_step": round(dt * 1e3, 3),
        "graphs_per_s": round(b / dt, 1),
        "batch": b, "frames": frames, "hidden": hidden,
        "map_segments": segments if with_map else 0,
        "gru_pad_to": gru_pad, "gru_impl": gru_impl,
        "compute_dtype": cdtype or "float32", "dense_adj": dense,
        "backend": jax.default_backend(),
        "timing": "dispatched" if dispatched else "in-loop",
    }))


if __name__ == "__main__":
    main()
