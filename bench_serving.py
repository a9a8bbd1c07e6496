"""On-device serving latency, isolated from the relay tunnel + host build.

The round-1 serving number (~47 ms/window) was dominated by the remote
TPU tunnel's per-call transfer (BASELINE.md) — useless as a deployment
number. This harness separates the three real terms of a stride-1
sliding window (/root/reference/rcv.py:69-91 semantics):

  device_ms[bucket]   — the jitted forward (InferenceEngine._fwd program
                        content) timed IN-LOOP per vehicle-count bucket:
                        what a locally-attached chip pays per window.
  host_build_ms       — GraphOnlineCreator full-window rebuild (O(V^2 F))
                        per window, on this host's CPUs.
  host_incr_ms        — IncrementalGraphOnlineCreator.push (O(V^2)) per
                        frame — the steady-state stride-1 cost.
  pad_ms              — pad_and_batch host cost per window.

Env: SERVE_PACK (frames/window, default 8), SERVE_VEHICLES (comma bucket
sweep, default "4,8,16,32"), SERVE_ITERS (default 200), SERVE_SEGMENTS
(map segments baked into the snapshot, default 1000).

Prints one JSON line. Buckets are padded to the same power-of-two node
capacities the engine uses, so each timed program IS the program the
stream triggers (serve/stream.py _score_graph).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.serve.stream import InferenceEngine, _next_pow2
from sldm_gnn_tpu.train.snapshot import save_snapshot


def make_snapshot(path, pack, segments):
    from bench_flagship import synth_map

    rng = np.random.default_rng(0)
    cfg = GruSageConfig(frames_num=pack, map_included=segments > 0,
                        out_dim=4)
    model = GruSage(cfg)
    v = 4
    g_dims = BatchDims(node_capacity=8, edge_capacity=16, graph_capacity=1,
                       num_frames=pack, num_labels=4)
    from sldm_gnn_tpu.graph.containers import GraphArrays

    g = GraphArrays(
        x=rng.standard_normal((v, pack, 6)).astype(np.float32),
        xsttype=np.zeros(v, np.int32), xdims=np.ones((v, 2), np.float32),
        edge_index=np.array([[0, 1], [1, 0]], np.int32),
        edge_attr=np.zeros((2, 4), np.float32),
        y=np.zeros(4, np.float32), pos_raw=None)
    batch = jax.tree.map(jnp.asarray, pad_and_batch([g], g_dims))
    map_data = synth_map(rng, segments) if segments else None
    params = model.init(jax.random.PRNGKey(0), batch, map_data=map_data)[
        "params"]
    emb = cent = None
    if segments:
        emb = np.asarray(model.apply({"params": params}, map_data,
                                     method=GruSage.encode_map))
        cent = np.asarray(map_data.centroids)
    stats = {"mu": {"x": np.zeros(5, np.float32),
                    "xdims": np.zeros(2, np.float32)},
             "sigma": {"x": np.ones(5, np.float32),
                       "xdims": np.ones(2, np.float32)}}
    save_snapshot(path, params=params, config=cfg,
                  norm_stat_dict=stats,
                  map_embeddings=emb, map_centroids=cent)


def frames_df(rng, vehicles, pack, t0=0):
    rows = []
    for t in range(t0, t0 + pack):
        for vid in range(vehicles):
            rows.append(dict(FrameId=t, VehicleId=vid,
                             X=float(rng.uniform(0, 50)),
                             Y=float(rng.uniform(0, 50)),
                             Speed=float(rng.uniform(0, 20)),
                             Angle=float(rng.uniform(0, 360)),
                             Width=2.0, Length=4.5, StationType=1))
    return pd.DataFrame(rows)


def main():
    pack = int(os.environ.get("SERVE_PACK", 8))
    buckets = [int(v) for v in
               os.environ.get("SERVE_VEHICLES", "4,8,16,32").split(",")]
    iters = int(os.environ.get("SERVE_ITERS", 200))
    segments = int(os.environ.get("SERVE_SEGMENTS", 1000))

    snap_path = "/tmp/serve_bench_snapshot.pkl"
    make_snapshot(snap_path, pack, segments)
    eng = InferenceEngine(snap_path, pack_size=pack)
    rng = np.random.default_rng(1)

    out = {"metric": "serving window latency (device vs host terms)",
           "pack_size": pack, "map_segments": segments,
           "backend": jax.default_backend(), "device_ms": {},
           "iters": iters}

    for v in buckets:
        df = frames_df(rng, v, pack)
        g = eng.creator(df)
        dims = BatchDims(
            node_capacity=_next_pow2(g.num_nodes),
            edge_capacity=_next_pow2(max(g.num_edges, 1)),
            graph_capacity=1, num_frames=pack,
            num_labels=eng.config.out_dim)
        batch = jax.tree.map(jnp.asarray, pad_and_batch([g], dims))

        # in-loop: iterate the jitted forward with a carried perturbation
        # so no iteration is loop-invariant; close with a scalar fetch
        @jax.jit
        def run(x0):
            def body(i, xacc):
                b2 = batch.replace(x=batch.x + xacc * 1e-20)
                s = eng._fwd(eng.params, b2)
                return xacc + s.sum()
            return jax.lax.fori_loop(0, iters, body, x0)

        acc = run(jnp.zeros(()))
        float(acc)
        t0 = time.perf_counter()
        acc = run(acc)
        float(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        out["device_ms"][f"V{v}_cap{dims.node_capacity}"] = round(dt, 3)

    # host-side terms at the largest bucket
    v = buckets[-1]
    df = frames_df(rng, v, pack)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        g = eng.creator(df)
    out["host_build_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)

    from sldm_gnn_tpu.build.online import IncrementalGraphOnlineCreator

    inc = IncrementalGraphOnlineCreator(
        frames_num=pack, m_radius=25.0,
        norm_stats={"mu": {"x": np.zeros(5, np.float32),
                           "xdims": np.zeros(2, np.float32)},
                    "sigma": {"x": np.ones(5, np.float32),
                              "xdims": np.ones(2, np.float32)}})
    for t in range(pack):
        inc.push(df[df.FrameId == t])
    t0 = time.perf_counter()
    for k in range(reps):
        nf = frames_df(rng, v, 1, t0=pack + k)
        inc.push(nf)
    out["host_incr_push_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)

    # array-native push (push_arrays — the path the incremental stream
    # consumer feeds from the wire rows; no pandas in the loop)
    arr_frames = []
    for k in range(reps):
        nf = frames_df(rng, v, 1, t0=pack + reps + k)
        arr_frames.append((
            nf["VehicleId"].to_numpy(),
            nf["X"].to_numpy(np.float32), nf["Y"].to_numpy(np.float32),
            nf["Speed"].to_numpy(np.float32), nf["Angle"].to_numpy(np.float32),
            nf["Width"].fillna(0.0).to_numpy(np.float32),
            nf["Length"].fillna(0.0).to_numpy(np.float32),
            nf["StationType"].to_numpy(np.int32)))
    t0 = time.perf_counter()
    for a in arr_frames:
        inc.push_arrays(*a)
    out["host_incr_push_arrays_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)

    t0 = time.perf_counter()
    for _ in range(reps):
        inc.window()
    out["host_incr_window_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)

    t0 = time.perf_counter()
    for _ in range(reps):
        dims = BatchDims(node_capacity=_next_pow2(g.num_nodes),
                         edge_capacity=_next_pow2(max(g.num_edges, 1)),
                         graph_capacity=1, num_frames=pack,
                         num_labels=eng.config.out_dim)
        pad_and_batch([g], dims)
    out["pad_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
