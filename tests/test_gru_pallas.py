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
