"""Phase isolation for the flagship GruSage train step at TPU-native batch.

Round-4 verdict (Weak #1): the batch-2048 step runs ~60 ms while the SpMM
underneath the same repo hits 93% of its HBM roofline — nobody had split
the step into phases to see where the time goes. This harness times, each
as its OWN jitted ``lax.fori_loop`` (zero per-step dispatch, value-fetch
closed, grads folded back so no iteration is loop-invariant):

  full    — the train step of record (fwd+bwd+Adam, map branch on)
  nomap   — same without the map branch       -> map cost = full - nomap
  gru     — standalone GRU fwd+bwd at the same [N, T, 6] shapes
  opt     — Adam update alone on the full param tree
  rest    = nomap - gru - opt  (st_emb + concats + FC stacks + SAGE +
            pooling + head + loss, fwd+bwd)

plus GRU implementation variants (scan block sizes, bf16 compute, and the
row-blocked fused Pallas scan) and an analytic FLOP/byte budget for the
GRU phase so the measured number can be read against its roofline.

Env knobs: FLAG_BATCH, FLAG_ITERS, FLAG_FRAMES, FLAG_HIDDEN,
FLAG_SEGMENTS. Reference anchors: the GRU is the reference's
``nn.GRU(batch_first=True)`` (/root/reference/src/models/grusage.py:53-58)
and the recipe is main.py:22-54 scaled in batch.
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
from sldm_gnn_tpu.ops.gru import gru_forward, init_gru_params
from sldm_gnn_tpu.train.loop import build_step_fns, make_optimizer

HBM_GBPS = 819.0  # v5e
MXU_BF16_TFLOPS = 197.0
MXU_F32_TFLOPS = 49.0


def time_inloop(make_body, state0, iters, close):
    """Run ``iters`` iterations of ``make_body`` inside one jitted
    fori_loop; the body must return a state that DEPENDS on the previous
    one (fold grads back) so nothing is loop-invariant."""

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, make_body, state)

    state = run(state0)  # compile + warm
    close(state)
    t0 = time.perf_counter()
    state = run(state)
    close(state)
    return (time.perf_counter() - t0) / iters * 1e3


def close_first_leaf(state):
    leaf = jax.tree.leaves(state)[0]
    return float(jnp.ravel(leaf)[0])


def main():
    b = int(os.environ.get("FLAG_BATCH", 2048))
    frames = int(os.environ.get("FLAG_FRAMES", 100))
    hidden = int(os.environ.get("FLAG_HIDDEN", 96))
    segments = int(os.environ.get("FLAG_SEGMENTS", 1000))
    iters = int(os.environ.get("FLAG_ITERS", 50))
    labels = 4

    rng = np.random.default_rng(0)
    graphs = [synth_graph(rng, frames, labels) for _ in range(b)]
    vmax = max(g.num_nodes for g in graphs)
    dims = BatchDims(
        node_capacity=((b * vmax + 7) // 8) * 8,
        edge_capacity=((sum(g.num_edges for g in graphs) + 127) // 128) * 128,
        graph_capacity=b,
        num_frames=frames,
        num_labels=labels,
    )
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, dims))
    from bench_flagship import maybe_dense_map
    map_data = maybe_dense_map(synth_map(rng, segments))
    knn_impl = os.environ.get("FLAG_KNN_IMPL", "topk")
    N = dims.node_capacity

    out = {"batch": b, "frames": frames, "hidden": hidden, "rows": N,
           "iters": iters, "backend": jax.default_backend(),
           "knn_impl": knn_impl,
           "map_dense": bool(int(os.environ.get("FLAG_MAP_DENSE", 0)))}

    def step_arm(with_map):
        cfg = GruSageConfig(
            frames_num=frames, gru_hidden_size=hidden, fc1dims=(hidden,),
            sage_hidden_dims=(hidden, hidden), fc2dims=(32,), out_dim=labels,
            emb_dim=8, dropout=0.25, negative_slope=0.1,
            map_included=with_map, knn_impl=knn_impl,
        )
        model = GruSage(cfg)
        fns = build_step_fns(model, make_optimizer(1e-3, 5e-5),
                             map_data=map_data if with_map else None)
        state = fns.init(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(1)

        def body(i, st):
            st2, _ = fns.train_step(st, batch, jax.random.fold_in(key, i))
            return st2

        return time_inloop(body, state, iters,
                           lambda st: close_first_leaf(st.params))

    out["full_ms"] = round(step_arm(True), 3)
    out["nomap_ms"] = round(step_arm(False), 3)

    # ---- standalone GRU fwd+bwd at the same shapes
    x = batch.x  # [N, T, 6]
    gparams = init_gru_params(jax.random.PRNGKey(2), 6, hidden, 1)

    def gru_arm(fwd_fn, cast=None):
        xx = x if cast is None else x.astype(cast)

        def loss(p):
            _, h = fwd_fn(p, xx)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.grad(loss)

        def body(i, p):
            return jax.tree.map(lambda a, d: a - 1e-12 * d.astype(a.dtype),
                                p, g(p))

        return time_inloop(body, gparams, iters, close_first_leaf)

    out["gru_ms"] = round(gru_arm(gru_forward), 3)

    # ---- Adam update alone on the full model's param tree
    cfg = GruSageConfig(
        frames_num=frames, gru_hidden_size=hidden, fc1dims=(hidden,),
        sage_hidden_dims=(hidden, hidden), fc2dims=(32,), out_dim=labels,
        emb_dim=8, dropout=0.25, negative_slope=0.1, map_included=True,
    )
    fns = build_step_fns(GruSage(cfg), make_optimizer(1e-3, 5e-5),
                         map_data=map_data)
    st0 = fns.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(1e-3, 5e-5)

    def opt_body(i, st):
        import optax

        grads = jax.tree.map(lambda a: a * 1e-6, st.params)
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    out["opt_ms"] = round(time_inloop(
        opt_body, st0, iters, lambda st: close_first_leaf(st.params)), 3)

    out["map_ms"] = round(out["full_ms"] - out["nomap_ms"], 3)
    out["rest_ms"] = round(out["nomap_ms"] - out["gru_ms"] - out["opt_ms"], 3)

    # ---- GRU variants
    for blk in (2, 5, 10):
        out[f"gru_block{blk}_ms"] = round(
            gru_arm(lambda p, xx, _b=blk: gru_forward(p, xx, block=_b)), 3)
    try:
        from sldm_gnn_tpu.ops.gru_pallas import gru_last_forward

        out["gru_pallas_ms"] = round(gru_arm(
            lambda p, xx: (None, gru_last_forward(p, xx))), 3)
        out["gru_pallas_nodx_ms"] = round(gru_arm(
            lambda p, xx: (None, gru_last_forward(p, xx, with_dx=False))), 3)
        out["gru_pallas_sg_ms"] = round(gru_arm(
            lambda p, xx: (None, gru_last_forward(p, xx, with_dx=False,
                                                  store_gates=True))), 3)
    except Exception as e:
        out["gru_pallas_ms"] = f"failed: {type(e).__name__}"

    # ---- analytic budget for the GRU phase (fwd+bwd, f32 scan path)
    T, H, D = frames, hidden, 6
    gemm_flops = 2 * N * T * (3 * H) * (D + H)       # xproj + hproj, fwd
    bwd_flops = 2 * gemm_flops                        # dx-side + dW-side
    xproj_bytes = N * T * 3 * H * 4                   # materialized f32
    hs_bytes = N * T * H * 4                          # saved carries
    gate_bytes = N * T * 3 * H * 4                    # saved gate residuals
    # fwd: write xproj+hs(+gates); bwd: read them + write dxproj + read for dW
    traffic = 2 * xproj_bytes + 2 * hs_bytes + 2 * gate_bytes + 2 * xproj_bytes
    out["gru_budget"] = {
        "flops_G": round((gemm_flops + bwd_flops) / 1e9, 1),
        "mxu_f32_ms": round((gemm_flops + bwd_flops) / (MXU_F32_TFLOPS * 1e9), 3),
        "mxu_bf16_ms": round((gemm_flops + bwd_flops) / (MXU_BF16_TFLOPS * 1e9), 3),
        "xproj_GB": round(xproj_bytes / 1e9, 3),
        "est_traffic_GB": round(traffic / 1e9, 3),
        "hbm_ms_at_peak": round(traffic / (HBM_GBPS * 1e6), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
