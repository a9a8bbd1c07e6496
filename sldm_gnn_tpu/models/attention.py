"""Edge-attention graph convolution (beyond-reference capability).

A GAT-style layer built from the framework's primitives: per-edge scores
via dot-product attention (SDDMM), per-destination masked softmax over
incoming edges (segment ops), then score-weighted mean-free aggregation
(SpMM). On padded batches all three stages respect edge masks, and at
scale the scores/aggregation ride the Pallas blocked kernels.

The reference has no attention message passing — its only attention is the
KNN map-context module (mapattention.py). This layer generalizes the model
zoo to attention GNNs while staying static-shape/jit-native.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_max, segment_sum
from .blocks import _activation

_NEG_BIG = -1e30


def edge_softmax(scores, edge_dst, edge_mask, num_nodes: int):
    """Numerically stable per-destination softmax over incoming edges."""
    scores = jnp.where(edge_mask, scores, _NEG_BIG)
    mx = segment_max(scores, edge_dst, num_nodes)
    shifted = scores - mx[edge_dst]
    ex = jnp.where(edge_mask, jnp.exp(shifted), 0.0)
    denom = segment_sum(ex, edge_dst, num_nodes)
    return ex / jnp.maximum(denom[edge_dst], 1e-20)


class AttentionConv(nn.Module):
    """out = lin_l( sum_e alpha_e * x_src ) + lin_r(x_self), with
    alpha = softmax_dst( <q(x_dst), k(x_src)> / sqrt(d) )."""

    out_dim: int
    qk_dim: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, num_nodes: int):
        q = nn.Dense(self.qk_dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.qk_dim, dtype=self.dtype, name="k")(x)
        scores = jnp.sum(
            (q[edge_dst] * k[edge_src]).astype(jnp.float32), axis=-1
        ) / jnp.sqrt(jnp.float32(self.qk_dim))
        alpha = edge_softmax(scores, edge_dst, edge_mask, num_nodes)
        msgs = x[edge_src] * alpha[:, None]
        agg = segment_sum(msgs, edge_dst, num_nodes)
        out = nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="lin_r")(x)


class AttentionBlock(nn.Module):
    """Stack of AttentionConv layers with LayerNorm -> act -> dropout,
    drop-in alternative to SageBlock."""

    hidden_dims: Sequence[int]
    qk_dim: int = 32
    dropout: float | None = None
    negative_slope: float | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, num_nodes: int, *, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = AttentionConv(h, qk_dim=self.qk_dim, dtype=self.dtype, name=f"conv{i}")(
                x, edge_src, edge_dst, edge_mask, num_nodes
            )
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
            x = _activation(x, self.negative_slope)
            if self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x
