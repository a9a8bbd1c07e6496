"""Int8 quantization: roundtrip bounds, Pallas/XLA agreement, int8 matmul."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.ops.quant import (
    dequantize_rows,
    int8_matmul,
    quantize_rows_pallas,
    quantize_rows_xla,
)


def test_quantize_roundtrip_bound(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32) * 3
    q, s = quantize_rows_xla(jnp.array(x))
    back = np.asarray(dequantize_rows(q, s))
    # error bounded by half an lsb per element
    lsb = np.asarray(s)
    assert (np.abs(back - x) <= lsb / 2 + 1e-6).all()


def test_pallas_quant_matches_xla(rng):
    x = rng.standard_normal((256, 128)).astype(np.float32)
    q1, s1 = quantize_rows_xla(jnp.array(x))
    q2, s2 = quantize_rows_pallas(jnp.array(x), block_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    # round-to-nearest ties can differ by 1 lsb at exact .5 boundaries
    assert (np.abs(np.asarray(q1).astype(int) - np.asarray(q2).astype(int)) <= 1).all()


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="TPU PRNG primitives (prng_seed/stochastic_round) have no CPU "
    "interpret lowering; covered by the on-chip check in BASELINE.md",
)
def test_stochastic_rounding_unbiased(rng):
    # rows mix a 1.0 absmax anchor with 0.3 entries so the scaled value
    # (0.3 * 127 = 38.1) has a nontrivial fraction — a broken PRNG would
    # bias the mean to 38/127 or 39/127, outside the tolerance
    row = np.full(128, 0.3, np.float32)
    row[0] = 1.0
    x = jnp.asarray(np.tile(row, (8, 1)))
    vals = []
    for seed in range(20):
        q, s = quantize_rows_pallas(x, stochastic=True, seed=seed, block_rows=8)
        vals.append(np.asarray(dequantize_rows(q, s))[:, 1:].mean())
    mean = np.mean(vals)
    np.testing.assert_allclose(mean, 0.3, atol=0.003)
    # and the quantized values actually dither between the two neighbors
    assert np.std(vals) > 0


def test_int8_matmul_close_to_f32(rng):
    x = rng.standard_normal((32, 64)).astype(np.float32)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    qx, sx = quantize_rows_xla(jnp.array(x))
    qw, sw = quantize_rows_xla(jnp.array(w.T))  # per-output-channel
    y = np.asarray(int8_matmul(qx, sx, qw, sw))
    want = x @ w
    # int8 quantization error ~1% relative on well-scaled data
    err = np.abs(y - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 0.05, err.mean()
