"""End-to-end accuracy of the int8 inference path (round-4 Missing #4).

The fully-int8 banded kernel ships with a per-op error bound (0.70% max
rel on chip, BASELINE.md) but the deployment question is the METRIC
delta: train a real multi-label snapshot, then evaluate the SAME
parameters through three inference paths —

  f32    — BlockedSageClassifier, float32 features (parity reference)
  bf16   — float32 params, bfloat16 feature storage (the training dtype)
  int8   — BlockedSageClassifier(int8_features=True): per-tensor int8
           features on the MXU int8 x int8 -> int32 path
           (ops/spmm_banded.spmm_banded_int8_pallas)

— and report micro/macro F1 (threshold 0.5) plus sigmoid-score MAE for
each vs f32. This is the number that licenses (or prices) the int8
path's 4x feature-memory cut for serving.

Trains on-device when a TPU is present (a few hundred jitted steps of
multi-label BCE on a synthetic locality graph whose labels depend on
neighborhood feature sums — learnable, so F1 is far from chance).

Env: I8_NODES (default 100k), I8_DEG (16), I8_DIM (128), I8_STEPS (300),
I8_LABELS (4). Prints one JSON line; PARITY.md records the table.

Reference anchor: /root/reference/test.py:136-193 (the offline eval whose
metric a quantized deployment must preserve).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from bench import make_local_graph
from sldm_gnn_tpu.graph.csr import pad_nodes
from sldm_gnn_tpu.models.blocked_sage import BlockedSageClassifier
from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate


def f1s(gt, pred):
    tp = int(((gt == 1) & (pred == 1)).sum())
    fp = int(((gt == 0) & (pred == 1)).sum())
    fn = int(((gt == 1) & (pred == 0)).sum())
    micro = 2 * tp / max(2 * tp + fp + fn, 1)
    macros = []
    for c in range(gt.shape[1]):
        tp = int(((gt[:, c] == 1) & (pred[:, c] == 1)).sum())
        fp = int(((gt[:, c] == 0) & (pred[:, c] == 1)).sum())
        fn = int(((gt[:, c] == 1) & (pred[:, c] == 0)).sum())
        macros.append(2 * tp / max(2 * tp + fp + fn, 1))
    return micro, float(np.mean(macros))


def main():
    n = int(os.environ.get("I8_NODES", 100_000))
    deg = int(os.environ.get("I8_DEG", 16))
    d = int(os.environ.get("I8_DIM", 128))
    steps = int(os.environ.get("I8_STEPS", 300))
    nlab = int(os.environ.get("I8_LABELS", 4))

    src, dst = make_local_graph(n, deg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)

    # labels from neighborhood structure: label c fires when the mean of
    # feature channel c over in-neighbors exceeds its 70th percentile —
    # only a model that aggregates can learn it
    agg = np.zeros((n, nlab), np.float32)
    cnt = np.zeros(n, np.float32)
    np.add.at(agg, dst, x[src][:, :nlab])
    np.add.at(cnt, dst, 1.0)
    agg /= np.maximum(cnt, 1.0)[:, None]
    thr = np.quantile(agg, 0.7, axis=0)
    y = (agg > thr).astype(np.float32)

    fwd_l, rev_l, n_pad = prepare_banded_mean_aggregate(
        src, dst, n, k=8)
    xp = np.zeros((n_pad, d), np.float32)
    xp[:n] = x
    xj = jnp.asarray(xp)
    yj = jnp.asarray(y)
    mask = jnp.zeros(n_pad, jnp.float32).at[:n].set(1.0)
    use_pallas = jax.default_backend() == "tpu"

    def make_model(**kw):
        return BlockedSageClassifier(
            hidden_dims=(d, d), num_classes=nlab, negative_slope=0.1,
            use_pallas=use_pallas, fused_ln=use_pallas, **kw)

    model = make_model()
    params = model.init(jax.random.PRNGKey(0), xj, fwd_l, rev_l, n_pad)[
        "params"]
    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def train_k(params, ost, k):
        def loss_fn(p):
            logits = model.apply({"params": p}, xj, fwd_l, rev_l, n_pad,
                                 train=False)[:, :nlab]
            ll = optax.sigmoid_binary_cross_entropy(
                logits, jnp.pad(yj, ((0, n_pad - n), (0, 0))))
            return (ll.sum(axis=1) * mask).sum() / mask.sum()

        def body(i, c):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o

        return jax.lax.fori_loop(0, k, body, (params, ost))

    t0 = time.perf_counter()
    params, ost = train_k(params, ost, steps)
    float(jax.tree.leaves(params)[0].ravel()[0])
    t_train = time.perf_counter() - t0

    def eval_path(name, m, xx):
        logits = jax.jit(lambda p: m.apply(
            {"params": p}, xx, fwd_l, rev_l, n_pad, train=False))(params)
        scores = np.asarray(jax.nn.sigmoid(logits[:n, :nlab]),
                            dtype=np.float32)
        pred = (scores >= 0.5).astype(np.int32)
        micro, macro = f1s(y.astype(np.int32), pred)
        return {"micro_f1": round(micro, 5), "macro_f1": round(macro, 5),
                "scores": scores}

    out = {"metric": "int8 inference F1 delta", "nodes": n, "deg": deg,
           "dim": d, "labels": nlab, "train_steps": steps,
           "train_s": round(t_train, 1),
           "backend": jax.default_backend()}
    r_f32 = eval_path("f32", make_model(), xj)
    r_bf16 = eval_path("bf16", make_model(), xj.astype(jnp.bfloat16))
    res = {"f32": r_f32, "bf16": r_bf16}
    if use_pallas:
        res["int8"] = eval_path("int8", make_model(int8_features=True), xj)
    for k, r in res.items():
        out[k] = {"micro_f1": r["micro_f1"], "macro_f1": r["macro_f1"],
                  "score_mae_vs_f32": round(float(np.mean(np.abs(
                      r["scores"] - r_f32["scores"]))), 6)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
