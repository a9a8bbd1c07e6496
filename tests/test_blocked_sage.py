"""BlockedSageBlock (Pallas-path SAGE) equals the segment-op SageBlock with
shared weights, and trains a big-graph node classifier."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sldm_gnn_tpu.graph.csr import pad_nodes
from sldm_gnn_tpu.models.blocks import SageBlock
from sldm_gnn_tpu.models.blocked_sage import BlockedSageBlock, BlockedSageClassifier
from sldm_gnn_tpu.ops.spmm import prepare_mean_aggregate


def test_blocked_equals_segment_sage(rng):
    n, e, d = 150, 900, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n)
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    # padding rows must be zero so both paths see the same features
    x[n:] = 0.0
    hdims = (8, 8)

    seg = SageBlock(hdims, dropout=None, negative_slope=0.1)
    vs = seg.init(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(src), jnp.array(dst),
        jnp.ones(e, bool), n_pad,
    )
    out_seg = seg.apply(
        vs, jnp.array(x), jnp.array(src), jnp.array(dst), jnp.ones(e, bool), n_pad
    )

    blk = BlockedSageBlock(hdims, dropout=None, negative_slope=0.1, use_pallas=False)
    out_blk = blk.apply({"params": vs["params"]}, jnp.array(x), fwd, rev, n_pad)
    np.testing.assert_allclose(
        np.asarray(out_blk)[:n], np.asarray(out_seg)[:n], rtol=2e-4, atol=2e-5
    )


def test_blocked_classifier_trains(rng):
    # two communities on a big-ish graph; node classification
    n = 600
    half = n // 2
    src, dst, y = [], [], np.zeros(n, np.int32)
    for i in range(n):
        com = i >= half
        y[i] = int(com)
        base = half if com else 0
        for k in range(1, 5):
            src.append(base + (i - base + k * 7) % half)
            dst.append(i)
    src, dst = np.array(src), np.array(dst)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n)
    x = np.zeros((n_pad, 8), np.float32)
    x[:n] = rng.standard_normal((n, 8)) * 0.1
    x[half:n, 0] += 1.0

    model = BlockedSageClassifier((16, 16), num_classes=2, dropout=None,
                                  negative_slope=0.1, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.array(x), fwd, rev, n_pad)["params"]
    opt = optax.adam(1e-2)
    st = opt.init(params)
    yj = jnp.array(y)

    @jax.jit
    def step(params, st):
        def lf(p):
            logits = model.apply({"params": p}, jnp.array(x), fwd, rev, n_pad)[:n]
            oh = jax.nn.one_hot(yj, 2)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, axis=1))

        l, g = jax.value_and_grad(lf)(params)
        u, st = opt.update(g, st)
        return optax.apply_updates(params, u), st, l

    losses = []
    for _ in range(40):
        params, st, loss = step(params, st)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    logits = model.apply({"params": params}, jnp.array(x), fwd, rev, n_pad)[:n]
    acc = float((np.asarray(logits).argmax(1) == y).mean())
    assert acc > 0.95


def test_blocked_sage_dense_backend_matches(rng):
    """Same SAGE math through the dense-block layouts (shared weights with
    the edge-list blocked path)."""
    from sldm_gnn_tpu.ops.spmm_dense import prepare_dense_mean_aggregate

    n, e, d = 150, 900, 16
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    fwd, rev, n_pad = prepare_mean_aggregate(src, dst, n)
    dfwd, drev, n_pad_d = prepare_dense_mean_aggregate(src, dst, n)
    assert n_pad_d == n_pad
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    x[n:] = 0.0
    hdims = (8, 8)

    blk = BlockedSageBlock(hdims, dropout=None, negative_slope=0.1, use_pallas=False)
    vs = blk.init(jax.random.PRNGKey(0), jnp.array(x), fwd, rev, n_pad)
    out_edges = blk.apply(vs, jnp.array(x), fwd, rev, n_pad)
    dfwd = jax.tree.map(jnp.asarray, dfwd)
    drev = jax.tree.map(jnp.asarray, drev)
    out_dense = blk.apply(vs, jnp.array(x), dfwd, drev, n_pad)
    np.testing.assert_allclose(
        np.asarray(out_dense)[:n], np.asarray(out_edges)[:n], rtol=2e-4, atol=2e-5
    )

    # gradients flow through the dense custom VJP identically
    def loss(params, layouts):
        return jnp.sum(blk.apply({"params": params}, jnp.array(x), *layouts, n_pad) ** 2)

    g1 = jax.grad(loss)(vs["params"], (fwd, rev))
    g2 = jax.grad(loss)(vs["params"], (dfwd, drev))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5),
        g1, g2,
    )


def test_blocked_classifier_int8_inference_close_to_f32(rng):
    """int8_features=True (per-tensor int8 feature streaming): same weights,
    inference outputs within per-tensor quantization error of the f32 path."""
    from sldm_gnn_tpu.models.blocked_sage import BlockedSageClassifier
    from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate

    n, tile, d = 2000, 64, 16
    deg = 5
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-60, 61, n * deg), 0, n - 1)
    fwd, rev, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=tile, k=4)
    fj, rj = jax.tree.map(jnp.asarray, (fwd, rev))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    m32 = BlockedSageClassifier(hidden_dims=(16, 16), num_classes=3,
                                negative_slope=0.1, use_pallas=False)
    m8 = BlockedSageClassifier(hidden_dims=(16, 16), num_classes=3,
                               negative_slope=0.1, use_pallas=False,
                               int8_features=True)
    params = m32.init(jax.random.PRNGKey(0), x, fj, rj, n_pad)
    out32 = np.asarray(m32.apply(params, x, fj, rj, n_pad))
    out8 = np.asarray(m8.apply(params, x, fj, rj, n_pad))
    scale = np.abs(out32).max() + 1e-9
    assert np.abs(out8 - out32).max() / scale < 5e-2
