"""Gradient introspection: per-module gradient norms.

Parity: GruSage.grads() (/root/reference/src/models/grusage.py:194-216) —
total and per-layer-group L2 norms of the gradient, grouped by top-level
module (station embedding, GRU, FC stacks, SAGE stack, output head).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GROUP_LABELS = {
    "st_emb": "StType Embedding",
    "gru": "GRU Layer",
    "fc1s": "FC Layers before SAGE",
    "sage": "GraphSAGE Layers",
    "fc2s": "FC Layers after SAGE",
    "linout": "Final Output Layer",
    "map_encoder": "Map Encoder",
    "map_attention": "Map Spatial Attention",
}


def grad_norms(grads: dict) -> tuple[float, dict[str, float | None]]:
    """Returns (total_norm, {group_label: norm_or_None}) over a GruSage
    gradient pytree."""
    layer_norms: dict[str, float | None] = {}
    total_sq = 0.0
    for key, label in GROUP_LABELS.items():
        if key not in grads:
            continue
        leaves = [np.asarray(g).ravel() for g in jax.tree.leaves(grads[key])]
        leaves = [g for g in leaves if g.size]
        if not leaves:
            layer_norms[label] = None
            continue
        sq = float(sum((g.astype(np.float64) ** 2).sum() for g in leaves))
        layer_norms[label] = float(np.sqrt(sq))
        total_sq += sq
    return float(np.sqrt(total_sq)), layer_norms


def global_grad_norm(grads) -> jax.Array:
    """Device-side total L2 norm (usable inside jitted steps)."""
    leaves = [jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)]
    return jnp.sqrt(sum(leaves))
