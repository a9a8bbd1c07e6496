"""Loss parity vs torch (BCEWithLogits pos_weight, focal BCE) + masking."""

import numpy as np
import jax.numpy as jnp
import torch

from sldm_gnn_tpu.train.losses import bce_with_logits_pos_weight, focal_bce_loss


def test_bce_pos_weight_matches_torch(rng):
    logits = rng.standard_normal((10, 3)).astype(np.float32) * 3
    targets = rng.integers(0, 2, (10, 3)).astype(np.float32)
    pw = 2.7
    expected = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    got = float(bce_with_logits_pos_weight(jnp.array(logits), jnp.array(targets), pw))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_matches_reference_formula(rng):
    logits = rng.standard_normal((12, 2)).astype(np.float32) * 2
    targets = rng.integers(0, 2, (12, 2)).astype(np.float32)
    alpha, gamma = 0.75, 2.0
    # reference formula (src/utils.py:58-63) in torch
    lt, tt = torch.tensor(logits), torch.tensor(targets)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p = torch.sigmoid(lt)
    p_t = p * tt + (1 - p) * (1 - tt)
    alpha_t = alpha * tt + (1 - alpha) * (1 - tt)
    expected = (alpha_t * (1 - p_t) ** gamma * bce).mean().item()
    got = float(focal_bce_loss(jnp.array(logits), jnp.array(targets), alpha, gamma))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_masked_loss_equals_unpadded(rng):
    """Loss over a padded batch (mask) == loss over only the real rows."""
    G, L = 6, 4
    logits = rng.standard_normal((G, L)).astype(np.float32)
    targets = rng.integers(0, 2, (G, L)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], bool)
    full = float(
        bce_with_logits_pos_weight(jnp.array(logits), jnp.array(targets), 1.5, mask=jnp.array(mask))
    )
    sub = float(
        bce_with_logits_pos_weight(jnp.array(logits[:4]), jnp.array(targets[:4]), 1.5)
    )
    np.testing.assert_allclose(full, sub, rtol=1e-6)
