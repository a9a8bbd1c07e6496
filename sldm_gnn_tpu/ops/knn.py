"""Masked K-nearest-segment selection for map spatial attention.

Reference semantics (/root/reference/src/models/map/mapattention.py:33-40):
dense pairwise euclidean distances between vehicle positions [V, 2] and map
segment centroids [S, 2], then ``topk(-dists, k)`` for the K smallest.

TPU-first design: the [V, S] distance matrix is computed as one fused
broadcasted reduction (VPU) and ``jax.lax.top_k`` runs on the negated
distances, exactly mirroring the reference's tie-breaking (torch.topk and
lax.top_k both return the lowest index on ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dists(points: jax.Array, centroids: jax.Array) -> jax.Array:
    """Euclidean distances [V, S] between points [V, 2] and centroids [S, 2]."""
    diff = points[:, None, :] - centroids[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def knn_topk(points: jax.Array, centroids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Return (dists [V, k], indices [V, k]) of the k nearest centroids."""
    d = pairwise_dists(points, centroids)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx
