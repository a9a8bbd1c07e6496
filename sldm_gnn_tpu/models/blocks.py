"""Reusable flax blocks: SAGE convolution, SAGE stacks, MLP stacks.

Numerical parity targets:
  * ``SageConv`` == PyG ``SAGEConv(in, out)`` defaults (aggr='mean',
    root_weight=True, project=False, normalize=False, bias on the neighbor
    branch) as used at /root/reference/src/models/blocks/sageblock.py:8.
  * ``SageBlock`` == SAGEConv -> LayerNorm(eps 1e-5) -> (Leaky)ReLU -> Dropout
    per layer (sageblock.py:9-20).
  * ``MLPStack`` == Linear -> (Leaky)ReLU -> Dropout stacks
    (grusage.py:64-71, 126-133).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import masked_mean_aggregate


def _activation(x: jax.Array, negative_slope: float | None) -> jax.Array:
    if negative_slope is None:
        return nn.relu(x)
    return nn.leaky_relu(x, negative_slope=negative_slope)


class SageConv(nn.Module):
    """GraphSAGE mean-aggregation convolution.

    ``out = lin_l(mean_{j->i} x_j) + lin_r(x_i)`` with bias only on ``lin_l``
    (PyG layout, so torch state dicts map 1:1 for parity tests).

    ``edge_axis``: when set (under shard_map), the edge arrays are a
    per-device partition and aggregation psums over that mesh axis.
    """

    out_dim: int
    edge_axis: str | None = None
    dtype: jnp.dtype | None = None  # computation dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, num_nodes: int,
                 adj=None):
        if adj is not None:
            # dense block-diagonal batch (pad_and_batch_aligned): the
            # mean aggregation is ONE batched matmul over the
            # row-normalized [G, vmax, vmax] adjacency — no scatter
            g, vmax = adj.shape[0], adj.shape[1]
            xg = x.reshape(g, vmax, x.shape[-1])
            agg = jnp.einsum("gij,gjh->gih", adj.astype(x.dtype),
                             xg).reshape(num_nodes, x.shape[-1])
        else:
            agg = masked_mean_aggregate(
                x, edge_src, edge_dst, edge_mask, num_nodes,
                axis_name=self.edge_axis
            )
        out = nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype, name="lin_l")(agg)
        out = out + nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="lin_r")(x)
        return out


class SageBlock(nn.Module):
    """Stack of SAGE layers, each followed by LayerNorm -> act -> dropout."""

    hidden_dims: Sequence[int]
    dropout: float | None = None
    negative_slope: float | None = None
    edge_axis: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, num_nodes: int, *,
                 adj=None, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = SageConv(h, edge_axis=self.edge_axis, dtype=self.dtype, name=f"conv{i}")(
                x, edge_src, edge_dst, edge_mask, num_nodes, adj
            )
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{i}")(x)
            x = _activation(x, self.negative_slope)
            if self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class MLPStack(nn.Module):
    """Linear -> (Leaky)ReLU -> Dropout stack."""

    dims: Sequence[int]
    dropout: float | None = None
    negative_slope: float | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"fc{i}")(x)
            x = _activation(x, self.negative_slope)
            if self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x
