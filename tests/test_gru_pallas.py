"""Fused Pallas GRU scan: forward + BPTT backward parity with the XLA scan
(which itself is torch-GRU-parity-tested in test_ops.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.ops.gru import gru_forward, init_gru_params
from sldm_gnn_tpu.ops.gru_pallas import gru_forward_pallas


@pytest.mark.parametrize("layers", [1, 2])
def test_forward_matches_xla(rng, layers):
    B, T, D, H = 16, 12, 6, 8
    params = init_gru_params(jax.random.PRNGKey(0), D, H, layers)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    out_x, h_x = gru_forward(params, x)
    out_p, h_p = gru_forward_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)


def test_grads_match_xla(rng):
    B, T, D, H = 8, 10, 5, 8
    params = init_gru_params(jax.random.PRNGKey(1), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    coef = jnp.array(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_xla(p, x):
        out, h = gru_forward(p, x)
        return jnp.sum(out * coef) + jnp.sum(h**2)

    def loss_pl(p, x):
        out, h = gru_forward_pallas(p, x, interpret=True)
        return jnp.sum(out * coef) + jnp.sum(h**2)

    (gx1, gp1) = jax.grad(loss_xla, argnums=(1, 0))(params, x)
    (gx2, gp2) = jax.grad(loss_pl, argnums=(1, 0))(params, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=2e-4, atol=2e-5)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0"):
        np.testing.assert_allclose(
            np.asarray(getattr(gp2, name)), np.asarray(getattr(gp1, name)),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )


@pytest.mark.slow
def test_grads_match_xla_two_layers(rng):
    B, T, D, H = 4, 6, 3, 8
    params = init_gru_params(jax.random.PRNGKey(2), D, H, 2)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))

    def loss_xla(p):
        return jnp.sum(gru_forward(p, x)[1] ** 2)

    def loss_pl(p):
        return jnp.sum(gru_forward_pallas(p, x, interpret=True)[1] ** 2)

    g1 = jax.grad(loss_xla)(params)
    g2 = jax.grad(loss_pl)(params)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0", "w_ih", "w_hh", "b_ih", "b_hh"):
        np.testing.assert_allclose(
            np.asarray(getattr(g2, name)), np.asarray(getattr(g1, name)),
            rtol=5e-4, atol=5e-5, err_msg=name,
        )


# ---- v2: row-blocked fused kernel (gru_last_pallas) ----
# bf16 matmul operands + bf16-stored carry: the contract is a LOOSE
# tolerance vs the f32 scan (~1e-2 rel after many frames), exactness is
# NOT claimed — parity-critical callers use ops/gru.py (module docstring).

from sldm_gnn_tpu.ops.gru_pallas import gru_last_forward, gru_last_pallas


@pytest.mark.parametrize("shape", [(16, 12, 6, 8), (100, 7, 5, 12)])
def test_v2_last_matches_xla(rng, shape):
    B, T, D, H = shape
    params = init_gru_params(jax.random.PRNGKey(0), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    _, h_x = gru_forward(params, x)
    h_p = gru_last_forward(params, x, rb=32, interpret=True)
    assert h_p.shape == (B, H) and h_p.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               rtol=3e-2, atol=3e-2)


def test_v2_multiple_row_blocks_match_single(rng):
    """Row blocking must not change results: rb=16 (several blocks, with
    row padding) == rb covering all rows in one block."""
    B, T, D, H = 40, 9, 4, 8
    params = init_gru_params(jax.random.PRNGKey(3), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    h_1 = gru_last_forward(params, x, rb=64, interpret=True)
    h_k = gru_last_forward(params, x, rb=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_1), np.asarray(h_k))


def test_v2_grads_match_xla(rng):
    B, T, D, H = 24, 8, 5, 8
    params = init_gru_params(jax.random.PRNGKey(1), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    coef = jnp.array(rng.standard_normal((B, H)).astype(np.float32))

    def loss_xla(p, x):
        return jnp.sum(gru_forward(p, x)[1] * coef)

    def loss_pl(p, x):
        return jnp.sum(gru_last_forward(p, x, rb=16, interpret=True) * coef)

    (gx1, gp1) = jax.grad(loss_xla, argnums=(1, 0))(params, x)
    (gx2, gp2) = jax.grad(loss_pl, argnums=(1, 0))(params, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=5e-2, atol=5e-3)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0"):
        g1 = np.asarray(getattr(gp1, name))
        g2 = np.asarray(getattr(gp2, name))
        # relative-to-scale check: bf16 operands bound per-entry error by
        # a fraction of the gradient tensor's magnitude, not entrywise
        np.testing.assert_allclose(g2, g1, rtol=5e-2,
                                   atol=5e-2 * np.abs(g1).max() + 1e-6,
                                   err_msg=name)


def test_v2_multilayer_chains_seq_kernel(rng):
    """num_layers>1: lower layers run gru_seq_pallas (full sequences),
    the top layer gru_last_pallas — all v2 bf16 kernels, so the
    tolerance is the v2 contract, not exactness."""
    B, T, D, H = 8, 6, 4, 8
    params = init_gru_params(jax.random.PRNGKey(2), D, H, 2)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    _, h_x = gru_forward(params, x)
    h_p = gru_last_forward(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               rtol=3e-2, atol=3e-2)

    # gradient flows through BOTH layers (the inter-layer sequence
    # cotangent path of gru_seq_pallas)
    def loss_pl(p):
        return jnp.sum(gru_last_forward(p, x, rb=16, interpret=True) ** 2)

    def loss_x(p):
        return jnp.sum(gru_forward(p, x)[1] ** 2)

    g_p = jax.grad(loss_pl)(params)
    g_x = jax.grad(loss_x)(params)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0", "w_ih", "w_hh",
                 "b_ih", "b_hh"):
        a = np.asarray(getattr(g_p, name))
        b = np.asarray(getattr(g_x, name))
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a, b, rtol=6e-2, atol=6e-2 * scale,
                                   err_msg=name)


def test_v2_seq_matches_xla(rng):
    """gru_seq_pallas's full sequence + its per-frame-cotangent backward
    vs the XLA scan (v2 bf16 tolerance)."""
    from sldm_gnn_tpu.ops.gru_pallas import gru_seq_pallas

    B, T, D, H = 24, 7, 5, 8
    params = init_gru_params(jax.random.PRNGKey(4), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    coef = jnp.array(rng.standard_normal((B, T, H)).astype(np.float32))

    hs_x, _ = gru_forward(params, x)
    hs_p = gru_seq_pallas(x, params.w_ih0, params.b_ih0, params.w_hh0,
                          params.b_hh0, 16, True)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_x),
                               rtol=3e-2, atol=3e-2)

    def loss_pl(p, xx):
        return jnp.sum(gru_seq_pallas(xx, p.w_ih0, p.b_ih0, p.w_hh0,
                                      p.b_hh0, 16, True) * coef)

    def loss_x(p, xx):
        return jnp.sum(gru_forward(p, xx)[0] * coef)

    gp, gxp = jax.grad(loss_pl, argnums=(0, 1))(params, x)
    gx, gxx = jax.grad(loss_x, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxx),
                               rtol=5e-2, atol=5e-3)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0"):
        a = np.asarray(getattr(gp, name))
        b = np.asarray(getattr(gx, name))
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2 * scale,
                                   err_msg=name)


def test_grusage_pallas_impl_matches_scan(rng):
    """gru_impl='pallas' end to end through GruSage: same params, loose
    (bf16-operand) logit tolerance vs the f32 scan default."""
    from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
    from sldm_gnn_tpu.graph.containers import GraphArrays
    from sldm_gnn_tpu.models import GruSage, GruSageConfig

    F, L = 6, 2
    gs = []
    for i in range(4):
        v = 4
        x = rng.standard_normal((v, F, 6)).astype(np.float32) * 0.5
        src = np.array([0, 1, 2, 3], np.int32)
        dst = np.array([1, 2, 3, 0], np.int32)
        y = np.zeros(L, np.float32)
        y[i % L] = 1.0
        gs.append(GraphArrays(
            x=x, xsttype=np.zeros(v, np.int32),
            xdims=np.ones((v, 2), np.float32),
            edge_index=np.stack([src, dst]),
            edge_attr=np.zeros((4, 4), np.float32), y=y,
            pos_raw=x[:, :, :2]))
    dims = BatchDims(node_capacity=24, edge_capacity=24, graph_capacity=4,
                     num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))

    cfg = GruSageConfig(frames_num=F, gru_hidden_size=8, fc1dims=(8,),
                        sage_hidden_dims=(8,), fc2dims=(8,), out_dim=L,
                        dropout=None)
    m_scan = GruSage(cfg)
    params = m_scan.init(jax.random.PRNGKey(0), batch)["params"]
    logits_scan = m_scan.apply({"params": params}, batch)

    import dataclasses
    m_pl = GruSage(dataclasses.replace(cfg, gru_impl="pallas"))
    logits_pl = m_pl.apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(logits_pl),
                               np.asarray(logits_scan), rtol=3e-2,
                               atol=3e-2)

    # gradient path end to end (value_and_grad through the custom VJP)
    def loss(m):
        def f(p):
            lg = m.apply({"params": p}, batch)
            return jnp.mean((lg - batch.y) ** 2)
        return jax.grad(f)(params)

    g_s = loss(m_scan)
    g_p = loss(m_pl)
    leaf_s = jax.tree.leaves(g_s)
    leaf_p = jax.tree.leaves(g_p)
    for a, b in zip(leaf_p, leaf_s):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2 * scale)


def test_v2_with_dx_false_param_grads_match(rng):
    """with_dx=False must leave PARAMETER gradients identical to the
    with_dx=True path (same kernel math, only the input cotangent is
    skipped); dx comes back as zeros by contract."""
    B, T, D, H = 24, 8, 5, 8
    params = init_gru_params(jax.random.PRNGKey(1), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    coef = jnp.array(rng.standard_normal((B, H)).astype(np.float32))

    def loss(with_dx):
        def f(p, xx):
            return jnp.sum(gru_last_forward(
                p, xx, rb=16, interpret=True, with_dx=with_dx) * coef)
        return jax.grad(f, argnums=(0, 1))(params, x)

    g_on, gx_on = loss(True)
    g_off, gx_off = loss(False)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_off, name)),
            np.asarray(getattr(g_on, name)), err_msg=name)
    assert np.abs(np.asarray(gx_on)).max() > 0
    np.testing.assert_array_equal(np.asarray(gx_off), np.zeros_like(gx_off))


def test_v3_store_gates_matches_v2(rng):
    """The store-gates variant (gru_last_sg_pallas): forward BIT-equal to
    v2 (same math, gates additionally streamed out) and gradients within
    the bf16-gate rounding of v2's f32 recompute."""
    from sldm_gnn_tpu.ops.gru_pallas import gru_last_pallas, gru_last_sg_pallas

    B, T, D, H = 48, 10, 5, 8
    p = init_gru_params(jax.random.PRNGKey(1), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    args = (p.w_ih0, p.b_ih0, p.w_hh0, p.b_hh0)

    h2 = gru_last_pallas(x, *args, 16, True, False)
    h3 = gru_last_sg_pallas(x, *args, 16, True, False)
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h2))

    def mk_loss(fn, with_dx):
        def loss(w_ih, b_ih, w_hh, b_hh, x):
            return jnp.sum(fn(x, w_ih, b_ih, w_hh, b_hh, 16, True, with_dx) ** 2)
        return loss

    g2 = jax.grad(mk_loss(gru_last_pallas, False), argnums=(0, 1, 2, 3))(*args, x)
    g3 = jax.grad(mk_loss(gru_last_sg_pallas, False), argnums=(0, 1, 2, 3))(*args, x)
    for a, b, nm in zip(g2, g3, ("dwih", "dbih", "dwhh", "dbhh")):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=5e-2,
                                   atol=2e-2 * np.abs(a).max() + 1e-6,
                                   err_msg=nm)

    # with_dx=True: the input cotangent flows through the same stored gates
    gx2 = jax.grad(mk_loss(gru_last_pallas, True), argnums=4)(*args, x)
    gx3 = jax.grad(mk_loss(gru_last_sg_pallas, True), argnums=4)(*args, x)
    np.testing.assert_allclose(np.asarray(gx3), np.asarray(gx2), rtol=5e-2,
                               atol=2e-2 * np.abs(np.asarray(gx2)).max() + 1e-6)


def test_v3_grads_match_xla(rng):
    """Store-gates grads vs the f32 scan, at the v2 tolerance contract."""
    from sldm_gnn_tpu.ops.gru_pallas import gru_last_forward

    B, T, D, H = 24, 8, 5, 8
    params = init_gru_params(jax.random.PRNGKey(1), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))
    coef = jnp.array(rng.standard_normal((B, H)).astype(np.float32))

    def loss_xla(p):
        return jnp.sum(gru_forward(p, x)[1] * coef)

    def loss_sg(p):
        return jnp.sum(gru_last_forward(p, x, rb=16, interpret=True,
                                        store_gates=True) * coef)

    gp1 = jax.grad(loss_xla)(params)
    gp2 = jax.grad(loss_sg)(params)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0"):
        g1 = np.asarray(getattr(gp1, name))
        g2 = np.asarray(getattr(gp2, name))
        np.testing.assert_allclose(g2, g1, rtol=5e-2,
                                   atol=5e-2 * np.abs(g1).max() + 1e-6,
                                   err_msg=name)


def test_v3_seq_and_multilayer_match_xla(rng):
    """gru_seq_sg_pallas and the two-layer store-gates stack vs the f32
    scan, at the v2 seq tolerance contract."""
    from sldm_gnn_tpu.ops.gru_pallas import gru_last_forward, gru_seq_sg_pallas

    B, T, D, H = 32, 9, 5, 8
    p1 = init_gru_params(jax.random.PRNGKey(2), D, H, 1)
    x = jnp.array(rng.standard_normal((B, T, D)).astype(np.float32))

    hs_x, _ = gru_forward(p1, x)
    hs_sg = gru_seq_sg_pallas(x, p1.w_ih0, p1.b_ih0, p1.w_hh0, p1.b_hh0,
                              16, True, True)
    np.testing.assert_allclose(np.asarray(hs_sg), np.asarray(hs_x),
                               rtol=3e-2, atol=3e-2)

    p2 = init_gru_params(jax.random.PRNGKey(3), D, H, 2)
    _, h2x = gru_forward(p2, x)
    h2sg = gru_last_forward(p2, x, rb=16, interpret=True, store_gates=True)
    np.testing.assert_allclose(np.asarray(h2sg), np.asarray(h2x),
                               rtol=3e-2, atol=3e-2)

    coef = jnp.array(rng.standard_normal((B, H)).astype(np.float32))

    def loss_xla(p):
        return jnp.sum(gru_forward(p, x)[1] * coef)

    def loss_sg(p):
        return jnp.sum(gru_last_forward(p, x, rb=16, interpret=True,
                                        store_gates=True) * coef)

    g1 = jax.grad(loss_xla)(p2)
    g2 = jax.grad(loss_sg)(p2)
    for name in ("w_ih0", "w_hh0", "b_ih0", "b_hh0", "w_ih", "w_hh",
                 "b_ih", "b_hh"):
        a = np.asarray(getattr(g1, name))
        b = np.asarray(getattr(g2, name))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, rtol=6e-2, atol=6e-2 * scale,
                                   err_msg=name)
