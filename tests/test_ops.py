"""Kernel unit tests: segment ops, GRU scan vs torch GRU, KNN vs torch.topk."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from sldm_gnn_tpu.ops.segment import (
    masked_mean_aggregate,
    global_mean_pool,
    global_max_pool,
    segment_mean,
    segment_max,
)
from sldm_gnn_tpu.ops.gru import GRUParams, gru_forward
from sldm_gnn_tpu.ops.knn import knn_topk


def test_masked_mean_aggregate_matches_scatter_mean(rng):
    N, E, D = 13, 40, 7
    x = rng.standard_normal((N, D)).astype(np.float32)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    mask = rng.random(E) > 0.3

    out = np.asarray(masked_mean_aggregate(jnp.array(x), jnp.array(src), jnp.array(dst), jnp.array(mask), N))

    expect = np.zeros((N, D), np.float32)
    deg = np.zeros(N, np.float32)
    for e in range(E):
        if mask[e]:
            expect[dst[e]] += x[src[e]]
            deg[dst[e]] += 1
    expect = expect / np.maximum(deg, 1)[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_padded_edges_dropped(rng):
    """Edges with dst == num_nodes (padding convention) must not contribute."""
    N, D = 5, 3
    x = rng.standard_normal((N, D)).astype(np.float32)
    src = np.array([0, 1, 0], np.int32)
    dst = np.array([2, 2, N], np.int32)  # last edge is padding
    mask = np.array([True, True, False])
    out = np.asarray(masked_mean_aggregate(jnp.array(x), jnp.array(src), jnp.array(dst), jnp.array(mask), N))
    np.testing.assert_allclose(out[2], (x[0] + x[1]) / 2, rtol=1e-5)
    np.testing.assert_allclose(out[0], 0.0)


def test_global_pools(rng):
    N, D, G = 11, 4, 3
    x = rng.standard_normal((N, D)).astype(np.float32)
    node_graph = np.array([0] * 4 + [1] * 3 + [2] * 2 + [G] * 2, np.int32)
    node_mask = node_graph < G
    mean = np.asarray(global_mean_pool(jnp.array(x), jnp.array(node_graph), jnp.array(node_mask), G))
    mx = np.asarray(global_max_pool(jnp.array(x), jnp.array(node_graph), jnp.array(node_mask), G))
    np.testing.assert_allclose(mean[0], x[:4].mean(0), rtol=1e-5)
    np.testing.assert_allclose(mean[1], x[4:7].mean(0), rtol=1e-5)
    np.testing.assert_allclose(mx[2], x[7:9].max(0), rtol=1e-5)


def _torch_gru_to_params(gru: torch.nn.GRU) -> GRUParams:
    sd = {k: v.detach().numpy() for k, v in gru.state_dict().items()}
    L = gru.num_layers
    H = gru.hidden_size

    def t(a):
        return jnp.array(a.T)

    rest_wih = np.stack([sd[f"weight_ih_l{l}"].T for l in range(1, L)]) if L > 1 else np.zeros((0, H, 3 * H), np.float32)
    rest_whh = np.stack([sd[f"weight_hh_l{l}"].T for l in range(1, L)]) if L > 1 else np.zeros((0, H, 3 * H), np.float32)
    rest_bih = np.stack([sd[f"bias_ih_l{l}"] for l in range(1, L)]) if L > 1 else np.zeros((0, 3 * H), np.float32)
    rest_bhh = np.stack([sd[f"bias_hh_l{l}"] for l in range(1, L)]) if L > 1 else np.zeros((0, 3 * H), np.float32)
    return GRUParams(
        w_ih0=t(sd["weight_ih_l0"]),
        w_hh0=t(sd["weight_hh_l0"]),
        b_ih0=jnp.array(sd["bias_ih_l0"]),
        b_hh0=jnp.array(sd["bias_hh_l0"]),
        w_ih=jnp.array(rest_wih),
        w_hh=jnp.array(rest_whh),
        b_ih=jnp.array(rest_bih),
        b_hh=jnp.array(rest_bhh),
    )


def test_gru_matches_torch_single_layer(rng):
    torch.manual_seed(0)
    B, T, D, H = 9, 17, 6, 24
    gru = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        out_t, h_t = gru(torch.tensor(x))
    params = _torch_gru_to_params(gru)
    out_j, h_j = gru_forward(params, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[-1].numpy(), rtol=1e-5, atol=1e-5)


def test_gru_matches_torch_two_layers(rng):
    torch.manual_seed(1)
    B, T, D, H = 4, 12, 5, 16
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        out_t, h_t = gru(torch.tensor(x))
    params = _torch_gru_to_params(gru)
    out_j, h_j = gru_forward(params, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[-1].numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gru_pad_to_matches_unpadded(rng):
    """MXU-aligned hidden padding (pad_to) is exact modulo reduction order,
    including through the backward pass, for 1- and 2-layer stacks."""
    torch.manual_seed(2)
    B, T, D, H = 5, 13, 6, 24
    for layers in (1, 2):
        gru = torch.nn.GRU(D, H, num_layers=layers, batch_first=True)
        params = _torch_gru_to_params(gru)
        x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
        out0, h0 = gru_forward(params, x)
        out1, h1 = gru_forward(params, x, pad_to=32)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-6, atol=1e-6)

        g0 = jax.grad(lambda p: jnp.sum(gru_forward(p, x)[1] ** 2))(params)
        g1 = jax.grad(lambda p: jnp.sum(gru_forward(p, x, pad_to=32)[1] ** 2))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)

        # already-aligned width: pad_to is a no-op
        out2, h2 = gru_forward(params, x, pad_to=24)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h0), rtol=0, atol=0)


def test_knn_matches_torch_topk(rng):
    V, S, K = 20, 57, 5
    pts = rng.standard_normal((V, 2)).astype(np.float32)
    cents = rng.standard_normal((S, 2)).astype(np.float32)
    d_j, idx_j = knn_topk(jnp.array(pts), jnp.array(cents), K)

    d_t = torch.cdist(torch.tensor(pts), torch.tensor(cents))
    neg, idx_t = torch.topk(-d_t, k=K, dim=1)
    np.testing.assert_allclose(np.asarray(d_j), (-neg).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())


def test_knn_pallas_matches_topk(rng):
    from sldm_gnn_tpu.ops.knn_pallas import knn_topk_pallas

    # odd V (row-block padding), non-128 S (lane padding), exact ties
    V, S, K = 333, 1000, 5
    pts = (rng.standard_normal((V, 2)) * 100).astype(np.float32)
    cents = (rng.standard_normal((S, 2)) * 100).astype(np.float32)
    cents[500] = cents[10]
    cents[777] = cents[10]  # duplicate centroids: lowest-index tie rule
    d0, i0 = knn_topk(jnp.asarray(pts), jnp.asarray(cents), K)
    d1, i1 = knn_topk_pallas(jnp.asarray(pts), jnp.asarray(cents), K,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    # distances agree to FMA-association rounding of the squared sum
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-6, atol=1e-4)


def test_knn_pallas_small_shapes(rng):
    from sldm_gnn_tpu.ops.knn_pallas import knn_topk_pallas

    # V smaller than one row block; S smaller than one lane tile
    V, S, K = 7, 57, 5
    pts = rng.standard_normal((V, 2)).astype(np.float32)
    cents = rng.standard_normal((S, 2)).astype(np.float32)
    d0, i0 = knn_topk(jnp.asarray(pts), jnp.asarray(cents), K)
    d1, i1 = knn_topk_pallas(jnp.asarray(pts), jnp.asarray(cents), K,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-6, atol=1e-5)
    with pytest.raises(ValueError):
        knn_topk_pallas(jnp.asarray(pts), jnp.asarray(cents), S + 1,
                        interpret=True)


def test_map_attention_knn_impl_parity(rng):
    """MapSpatialAttention(knn_impl='pallas') matches the topk path in
    outputs AND in the attention-MLP parameter gradients (the selection
    carries no cotangent — positions/centroids are input data)."""
    from sldm_gnn_tpu.models.map_modules import MapSpatialAttention

    V, S, D, K = 50, 120, 8, 5
    pts = jnp.asarray(rng.standard_normal((V, 2)).astype(np.float32) * 10)
    cents = jnp.asarray(rng.standard_normal((S, 2)).astype(np.float32) * 10)
    emb = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))

    m0 = MapSpatialAttention(k_neighbors=K, knn_impl="topk")
    m1 = MapSpatialAttention(k_neighbors=K, knn_impl="pallas")
    params = m0.init(jax.random.PRNGKey(0), pts, cents, emb)

    out0 = m0.apply(params, pts, cents, emb)
    out1 = m1.apply(params, pts, cents, emb)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)

    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply(p, pts, cents, emb) ** 2)
        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    # atol covers near-zero grad elements perturbed by the scatter-free
    # combine's different (but exact-in-structure) reduction order
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
