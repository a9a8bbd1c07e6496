"""Tree-structured sampled GraphSAGE (mini-batch path, BASELINE config 3).

Computes L-layer SAGE representations of seed nodes from a fanout-sampled
neighbor tree (data/sampler.py). Aggregation is a reshape + masked mean
over the fanout axis — dense, static-shape, scatter-free:

    layer 1 rep of every level-l node (l < L) is built from the raw
    features of its sampled children at level l+1; layer k reps feed
    layer k+1 until the seeds' level-L rep remains.

Numerics match SageConv (lin_l(mean_children) + lin_r(self), LayerNorm,
(Leaky)ReLU, dropout) so a sampled model's weights are interchangeable
with the full-batch blocks.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import _activation


class SampledSageLayer(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, self_feats, child_feats, child_mask, fanout: int):
        """self_feats [K, D]; child_feats [K*fanout, D]; child_mask [K*fanout]."""
        k = self_feats.shape[0]
        c = child_feats.reshape(k, fanout, -1)
        m = child_mask.reshape(k, fanout, 1).astype(c.dtype)
        agg = jnp.sum(c * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        out = nn.Dense(self.out_dim, use_bias=True, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, name="lin_r")(self_feats)


class SampledSage(nn.Module):
    """L-layer sampled GraphSAGE encoder + optional classification head."""

    hidden_dims: Sequence[int]  # one per layer; len == len(fanouts)
    out_dim: int | None = None
    dropout: float | None = None
    negative_slope: float | None = None

    @nn.compact
    def __call__(self, feats_per_level, masks_per_level, fanouts, *, train: bool = False):
        """feats_per_level[l]: [B * prod(fanouts[:l]), D] raw features of the
        sampled tree's level-l nodes; returns seed representations
        [B, hidden_dims[-1]] (or logits [B, out_dim] with a head)."""
        L = len(fanouts)
        assert len(self.hidden_dims) == L
        # reps[l] = current representation of level-l nodes
        reps = list(feats_per_level)
        for layer in range(L):
            h = self.hidden_dims[layer]
            sage = SampledSageLayer(h, name=f"conv{layer}")
            norm = nn.LayerNorm(epsilon=1e-5, name=f"norm{layer}")
            new_reps = []
            # after layer k, levels 0..L-1-k have layer-(k+1) reps
            for lvl in range(L - layer):
                x = sage(reps[lvl], reps[lvl + 1], masks_per_level[lvl + 1], fanouts[lvl])
                x = norm(x)
                x = _activation(x, self.negative_slope)
                if self.dropout is not None:
                    x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
                new_reps.append(x)
            reps = new_reps
        out = reps[0]
        if self.out_dim is not None:
            out = nn.Dense(self.out_dim, name="head")(out)
        return out
