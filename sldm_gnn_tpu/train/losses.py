"""Multi-label classification losses.

Parity targets:
  * ``bce_with_logits_pos_weight`` == torch ``BCEWithLogitsLoss(pos_weight=w)``
    (reference: src/utils.py:187-190), elementwise
    ``w*y*softplus(-x) + (1-y)*softplus(x)`` then mean.
  * ``focal_bce_loss`` == reference focal BCE (src/utils.py:58-63):
    plain BCE elementwise, p_t/alpha_t weighting, mean.

Both are extended with an optional graph-validity mask so padded graphs in a
static-capacity batch do not contribute — the masked mean divides by the
number of *valid* elements, reproducing the reference's per-batch mean over
real graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stable_bce_elems(logits: jax.Array, targets: jax.Array, pos_weight: float | jax.Array | None):
    # log sigmoid(x) = -softplus(-x); log(1 - sigmoid(x)) = -softplus(x)
    pos_term = jax.nn.softplus(-logits)
    neg_term = jax.nn.softplus(logits)
    if pos_weight is None:
        return targets * pos_term + (1.0 - targets) * neg_term
    return pos_weight * targets * pos_term + (1.0 - targets) * neg_term


def bce_with_logits_pos_weight(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: float | jax.Array = 1.0,
    mask: jax.Array | None = None,
) -> jax.Array:
    elems = _stable_bce_elems(logits, targets, pos_weight)
    return _masked_mean(elems, mask)


def focal_bce_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.75,
    gamma: float = 2.0,
    mask: jax.Array | None = None,
) -> jax.Array:
    bce = _stable_bce_elems(logits, targets, None)
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return _masked_mean(alpha_t * (1.0 - p_t) ** gamma * bce, mask)


def _masked_mean(elems: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return jnp.mean(elems)
    w = mask.astype(elems.dtype)
    while w.ndim < elems.ndim:
        w = w[..., None]
    w = jnp.broadcast_to(w, elems.shape)
    return jnp.sum(elems * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_graph_loss(
    logits: jax.Array,
    targets: jax.Array,
    graph_mask: jax.Array,
    *,
    loss_type: str = "bce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
) -> jax.Array:
    """Batch loss over [G, L] logits with padded-graph masking."""
    if loss_type == "bce":
        return bce_with_logits_pos_weight(logits, targets, pos_weight, mask=graph_mask)
    if loss_type == "focal":
        return focal_bce_loss(logits, targets, focal_alpha, focal_gamma, mask=graph_mask)
    raise ValueError(f"unknown loss_type {loss_type}")
