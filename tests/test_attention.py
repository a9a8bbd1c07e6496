"""Attention conv: edge softmax semantics vs dense reference, masking,
GruSage with sage_type='attention', metrics logger."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.models.attention import AttentionConv, edge_softmax
from sldm_gnn_tpu.models import GruSage, GruSageConfig
from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.utils.logging import MetricsLogger


def test_edge_softmax_matches_dense(rng):
    n, e = 10, 40
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    scores = rng.standard_normal(e).astype(np.float32)
    mask = rng.random(e) > 0.2

    alpha = np.asarray(
        edge_softmax(jnp.array(scores), jnp.array(dst), jnp.array(mask), n)
    )
    for i in range(n):
        m = (dst == i) & mask
        if m.any():
            s = scores[m]
            ex = np.exp(s - s.max())
            np.testing.assert_allclose(alpha[m], ex / ex.sum(), rtol=1e-5)
    np.testing.assert_allclose(alpha[~mask], 0.0)


def test_attention_conv_matches_dense_attention(rng):
    n, e, d, h = 9, 30, 6, 5
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, d)).astype(np.float32)
    conv = AttentionConv(h, qk_dim=4)
    vs = conv.init(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(src), jnp.array(dst),
        jnp.ones(e, bool), n,
    )
    out = np.asarray(
        conv.apply(vs, jnp.array(x), jnp.array(src), jnp.array(dst), jnp.ones(e, bool), n)
    )

    p = vs["params"]
    q = x @ np.asarray(p["q"]["kernel"]) + np.asarray(p["q"]["bias"])
    k = x @ np.asarray(p["k"]["kernel"]) + np.asarray(p["k"]["bias"])
    agg = np.zeros((n, d), np.float32)
    for i in range(n):
        m = dst == i
        if not m.any():
            continue
        s = (q[i] * k[src[m]]).sum(axis=1) / np.sqrt(4.0)
        ex = np.exp(s - s.max())
        a = ex / ex.sum()
        agg[i] = (x[src[m]] * a[:, None]).sum(axis=0)
    want = (
        agg @ np.asarray(p["lin_l"]["kernel"]) + np.asarray(p["lin_l"]["bias"])
        + x @ np.asarray(p["lin_r"]["kernel"])
    )
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_grusage_attention_variant_trains(rng):
    from sldm_gnn_tpu.train.loop import train_model

    F, L = 5, 2
    gs = []
    for i in range(8):
        v = 4
        y = np.zeros(L, np.float32)
        y[i % L] = 1.0
        x = rng.standard_normal((v, F, 6)).astype(np.float32) * 0.1
        x[:, :, 0] += (i % L) * 2.0
        gs.append(
            GraphArrays(
                x=x, xsttype=np.zeros(v, np.int32), xdims=np.ones((v, 2), np.float32),
                edge_index=np.array([[0, 1, 2, 3], [1, 2, 3, 0]], np.int32),
                edge_attr=np.zeros((4, 4), np.float32), y=y,
            )
        )
    dims = BatchDims(node_capacity=32, edge_capacity=32, graph_capacity=8, num_frames=F, num_labels=L)
    batch = pad_and_batch(gs, dims)
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=12, fc1dims=(12,), sage_hidden_dims=(12,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        sage_type="attention", attention_qk_dim=8,
    )
    model = GruSage(cfg)
    state, res = train_model(
        model, lambda: [batch], lambda: [batch], epochs=30, lr=5e-3,
        weight_decay=0.0, active_labels=[0, 1],
    )
    assert res.total_val_acc[0, -1] >= 0.9


def test_bad_sage_type_raises(rng):
    cfg = GruSageConfig(sage_type="magic", dropout=None)
    model = GruSage(cfg)
    g = GraphArrays(
        x=np.zeros((2, 100, 6), np.float32), xsttype=np.zeros(2, np.int32),
        xdims=np.zeros((2, 2), np.float32), edge_index=np.zeros((2, 0), np.int32),
        edge_attr=np.zeros((0, 4), np.float32), y=np.zeros(1, np.float32),
    )
    b = pad_and_batch([g], BatchDims(8, 8, 1, 100, 1))
    with pytest.raises(ValueError, match="sage_type"):
        model.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, b), train=False)


def test_metrics_logger(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with MetricsLogger(p, context={"run": "test"}) as lg:
        lg.log({"epoch": 0, "loss": 1.5})
        lg.log({"epoch": 1, "loss": 0.5})
    lines = [json.loads(l) for l in p.read_text().strip().split("\n")]
    assert len(lines) == 2
    assert lines[0]["run"] == "test" and lines[1]["loss"] == 0.5
    assert "ts" in lines[0]
