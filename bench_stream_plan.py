"""Config-5 groundwork at scale: stream-build a ~100-200M-edge synthetic
city-map-like graph through the host-memory-bounded StreamedHaloPlanner
(parallel/streamed.py) and record the manifest — peak RSS, per-shard
A-bytes, wall time — the capacity-planning numbers BASELINE.md's config-5
row needs. Optionally loads a shard subset afterwards and runs one
virtual-mesh training step over it (STREAM_STEP=1; forces the CPU backend
+ a virtual device mesh, no TPU needed).

Edges are GENERATED in chunks in FILE order (node ids shuffled, the real
builders' emission order — /root/reference/src/gbuilder.py:392-424) and
relabeled on the fly through the streaming two-pass Hilbert order
(graph/reorder.py StreamingHilbert + planner node_order): the demo
exercises exactly the path real config-5 inputs take.

Prints ONE JSON line: the manifest + timings.

Env knobs: STREAM_NODES (default 12.5M), STREAM_DEG (16), STREAM_EP (16),
STREAM_CHUNK (5M edges), STREAM_DIR (default /tmp/stream_plan),
STREAM_STEP (0), STREAM_REACH (256), STREAM_REUSE (0 — reuse an
already-built plan in STREAM_DIR instead of rebuilding).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def edge_chunks(n, deg, reach, chunk_nodes, scramble, seed=0):
    """File-order edge stream: chunks of spatially-local edges with
    SHUFFLED ids (scramble[spatial_id] = file_id)."""
    rng = np.random.default_rng(seed)
    for s in range(0, n, chunk_nodes):
        e = min(chunk_nodes, n - s)
        dst_sp = np.repeat(np.arange(s, s + e, dtype=np.int64), deg)
        src_sp = np.clip(dst_sp + rng.integers(-reach, reach + 1, len(dst_sp)),
                         0, n - 1)
        yield scramble[src_sp], scramble[dst_sp]


def main():
    n = int(os.environ.get("STREAM_NODES", 12_500_000))
    deg = int(os.environ.get("STREAM_DEG", 16))
    ep = int(os.environ.get("STREAM_EP", 16))
    reach = int(os.environ.get("STREAM_REACH", 256))
    chunk_nodes = int(os.environ.get("STREAM_CHUNK", 5_000_000)) // deg
    out = os.environ.get("STREAM_DIR", "/tmp/stream_plan")
    do_step = bool(int(os.environ.get("STREAM_STEP", 0)))

    from sldm_gnn_tpu.graph.reorder import StreamingHilbert
    from sldm_gnn_tpu.parallel.streamed import StreamedHaloPlanner, _rss_mb

    if int(os.environ.get("STREAM_REUSE", 0)):
        manifest = json.loads(
            open(os.path.join(out, "manifest.json")).read())
        assert manifest["num_nodes"] == n and manifest["ep"] == ep, \
            "STREAM_DIR plan does not match STREAM_NODES/STREAM_EP"
        layout_bytes = sum(
            os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
        result = {
            "metric": "config-5 streamed plan step (reused plan)",
            "value": None, "unit": None, "vs_baseline": None,
            "nodes": n, "edges": manifest["num_edges"], "ep": ep,
            "h_max": manifest["h_max"], "s_common": manifest["s_common"],
            "banded_a_mb_per_shard_dir":
                manifest["banded_a_mb_per_shard_dir"],
            "on_disk_mb": round(layout_bytes / 1e6, 1),
        }
        run_step(result, n, ep, out, do_step=True)
        print(json.dumps(result))
        return

    rng = np.random.default_rng(7)
    scramble = rng.permutation(n)  # file ids

    # streaming Hilbert order from per-node coordinates (two passes; the
    # synthetic coords are the spatial positions, delivered in file order)
    t0 = time.perf_counter()
    sh = StreamingHilbert(n)
    coord_chunk = 10_000_000
    for s in range(0, n, coord_chunk):
        e = min(coord_chunk, n - s)
        xy = np.stack([np.arange(s, s + e, dtype=np.float64),
                       np.zeros(e)], axis=1)
        sh.observe_bounds(xy)
    for s in range(0, n, coord_chunk):
        e = min(coord_chunk, n - s)
        xy = np.stack([np.arange(s, s + e, dtype=np.float64),
                       np.zeros(e)], axis=1)
        sh.add_keys(scramble[s:s + e], xy)
    perm = sh.order()
    t_order = time.perf_counter() - t0

    if os.path.isdir(out):
        shutil.rmtree(out)
    planner = StreamedHaloPlanner(n, ep, out, banded_k=8,
                                  node_order=perm)
    t0 = time.perf_counter()
    consumed = 0
    for src_c, dst_c in edge_chunks(n, deg, reach, chunk_nodes, scramble):
        planner.consume(src_c, dst_c)
        consumed += len(src_c)
    t_pass1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    manifest = planner.finalize()
    t_finalize = time.perf_counter() - t0

    layout_bytes = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))

    result = {
        "metric": "config-5 streamed plan build",
        "value": round(consumed / (t_pass1 + t_finalize), 1),
        "unit": "edges/s (host build)",
        "vs_baseline": None,
        "nodes": n, "edges": consumed, "ep": ep,
        "order_s": round(t_order, 1),
        "pass1_s": round(t_pass1, 1),
        "finalize_s": round(t_finalize, 1),
        "peak_rss_mb": manifest["peak_rss_mb"],
        "banded_a_mb_per_shard_dir": manifest["banded_a_mb_per_shard_dir"],
        "h_max": manifest["h_max"],
        "s_common": manifest["s_common"],
        "on_disk_mb": round(layout_bytes / 1e6, 1),
    }

    run_step(result, n, ep, out, do_step=do_step)
    print(json.dumps(result))


def run_step(result, n, ep, out, *, do_step):
    if not do_step:
        return
    from sldm_gnn_tpu.parallel.streamed import _rss_mb

    os.environ.setdefault("XLA_FLAGS",
                          f"--xla_force_host_platform_device_count={ep}")
    # O(chunk)-memory XLA aggregation fallback: at 200M edges the
    # unchunked int8->f32 A upcast alone (~90 GB) would OOM the host
    os.environ.setdefault("SLDM_XLA_AGG_CHUNK", "256")
    import gc

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sldm_gnn_tpu.parallel.halo_model import (
        HaloDims, HaloSageClassifier, build_halo_step_fns,
        shard_node_array)
    from sldm_gnn_tpu.parallel.mesh import make_mesh
    from sldm_gnn_tpu.parallel.streamed import load_streamed_halo_plan
    from sldm_gnn_tpu.train.loop import make_optimizer

    t0 = time.perf_counter()
    plan = load_streamed_halo_plan(out)
    t_load = time.perf_counter() - t0
    d = 16
    mesh = make_mesh(dp=1, ep=ep, devices=jax.devices()[:ep])
    model = HaloSageClassifier(hidden_dims=(d,), num_classes=4,
                               dims=HaloDims.of(plan),
                               negative_slope=0.1, use_pallas=False)
    fns = build_halo_step_fns(model, make_optimizer(1e-3, 0.0), mesh, plan)
    n_loc = plan.n_local
    del plan  # step fns hold jax copies of the layouts; free the numpy ones
    gc.collect()
    rng2 = np.random.default_rng(1)
    x_stack = shard_node_array(
        rng2.standard_normal((n, d)).astype(np.float32), ep, n_loc)
    y_stack = shard_node_array(
        rng2.integers(0, 4, n).astype(np.int32), ep, n_loc)
    m_stack = shard_node_array(np.ones(n, np.float32), ep, n_loc)
    state = fns.init(jax.random.PRNGKey(0), x_stack)
    t0 = time.perf_counter()
    state, m = fns.train_step(state, x_stack, y_stack, m_stack,
                              jax.random.PRNGKey(1))
    loss = float(m["loss"])
    result["mesh_step_ok"] = bool(np.isfinite(loss))
    result["mesh_step_loss"] = round(loss, 4)
    result["mesh_step_s"] = round(time.perf_counter() - t0, 1)
    result["plan_load_s"] = round(t_load, 1)
    result["peak_rss_mb"] = round(_rss_mb(), 1)


if __name__ == "__main__":
    main()
