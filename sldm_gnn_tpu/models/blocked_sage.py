"""GraphSAGE blocks over the Pallas blocked-SpMM path (big-graph mode).

The padded-batch :class:`~sldm_gnn_tpu.models.blocks.SageBlock` aggregates
with XLA segment ops — right for many small pack graphs. For one large
graph (the map graph, node-classification workloads, the benchmark
configs), this module runs the same SAGE math with the blocked Pallas
SpMM kernel (ops/spmm.py) and its transpose-graph custom VJP:

    h = lin_l( spmm_mean(x) ) + lin_r(x)     per layer, then
    LayerNorm -> (Leaky)ReLU -> dropout

Weights are name-compatible with SageBlock (conv{i}/lin_l, lin_r, norm{i})
so checkpoints transfer between the two execution modes.

Usage: build the edge layouts once on the host
(``prepare_mean_aggregate(src, dst, n, step_chunks=K)``) and pass them to
``__call__`` — they are static data, jit-friendly, shared by all layers.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.csr import BlockedEdges
from ..ops.spmm import spmm_apply
from ..ops.spmm_dense import DenseBlocks, spmm_dense_apply
from ..ops.spmm_banded import (
    BandedBlocks,
    spmm_banded_apply,
    spmm_banded_infer_int8,
    spmm_banded_xla,
)
from ..ops.spmm_hybrid import HybridLayout, spmm_hybrid_apply
from ..ops.banded_residual import (
    BandedResidualLayout,
    banded_residual_sage_apply,
    banded_residual_sage_ln_apply,
    spmm_banded_residual_apply,
)
from ..ops.sage_fused import _act, _ln_fwd_xla, banded_sage_apply, banded_sage_ln_apply
from ..ops.spmm_gather import GatherResidualLayout, spmm_gather_residual_apply
from .blocks import _activation


class _DenseParams(nn.Module):
    """nn.Dense's parameters (same names, shapes, initializers) without its
    matmul — the fused kernel consumes them directly, so checkpoints move
    freely between fused and unfused execution."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm's parameters (same names/shapes/initializers) without
    its compute — the LN-fused kernel consumes them directly, so
    checkpoints move freely between fused-LN and unfused execution."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(), (features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (features,))
        return scale, bias


class BlockedSageConv(nn.Module):
    out_dim: int
    use_pallas: bool = True
    k_per_step: int = 1
    # INFERENCE-ONLY: per-tensor int8 feature streaming through the fully-
    # integer banded kernel (ops/spmm_banded.py spmm_banded_int8_pallas) —
    # int8 x int8 MXU, ~0.7% rel err, no VJP. Requires a BandedBlocks
    # layout with int8 count tiles (prepare_banded_mean_aggregate default).
    int8_features: bool = False
    # epilogue fusion (ops/sage_fused.py): lin_l/lin_r/bias fold into the
    # banded kernel's output write — the aggregate never round-trips HBM.
    # Banded (narrow) layouts only; other layouts run the unfused path.
    # MXU operands round to bf16 like every DEFAULT-precision kernel here.
    fused: bool = False

    @nn.compact
    def __call__(self, x, blocked_fwd, blocked_rev, num_nodes: int, *,
                 ln=None, negative_slope: float | None = None):
        if self.int8_features and not isinstance(blocked_fwd, BandedBlocks):
            raise TypeError(
                "int8_features=True requires a BandedBlocks layout (the "
                "fully-int8 kernel); got " + type(blocked_fwd).__name__)
        fusable_banded = (
            isinstance(blocked_fwd, BandedBlocks)
            and not blocked_fwd.wide
            and not self.int8_features
        )
        fusable_resid = (
            isinstance(blocked_fwd, BandedResidualLayout)
            and not self.int8_features
        )
        if ln is not None:
            # whole-sublayer fusion: act(LN(conv(x))) in one kernel pass
            # each way (ops/sage_fused.py banded_sage_ln_apply). ``ln`` is
            # (gamma, beta) created by the caller under its norm{i} scope;
            # the model's None-slope means ReLU (kernel: 0.0).
            slope_k = 0.0 if negative_slope is None else float(negative_slope)
            wl, bl = _DenseParams(self.out_dim, True, name="lin_l")(x.shape[1])
            wr, _ = _DenseParams(self.out_dim, False, name="lin_r")(x.shape[1])
            gamma, beta = ln
            if self.fused and fusable_banded:
                return banded_sage_ln_apply(
                    x, wl, wr, bl, gamma, beta, blocked_fwd, blocked_rev,
                    self.use_pallas, slope_k, 1e-5)
            if self.fused and fusable_resid:
                return banded_residual_sage_ln_apply(
                    x, wl, wr, bl, gamma, beta, blocked_fwd,
                    self.use_pallas, slope_k, 1e-5)
            # non-fusable layout: same params, plain-AD XLA math
            agg = self._aggregate(x, blocked_fwd, blocked_rev, num_nodes)
            y = agg @ wl + bl + x @ wr
            z, _, _ = _ln_fwd_xla(y, gamma, beta, 1e-5)
            return _act(z, slope_k).astype(x.dtype)
        if self.fused and fusable_banded:
            wl, bl = _DenseParams(self.out_dim, True, name="lin_l")(x.shape[1])
            wr, _ = _DenseParams(self.out_dim, False, name="lin_r")(x.shape[1])
            return banded_sage_apply(
                x, wl, wr, bl, blocked_fwd, blocked_rev, self.use_pallas, None
            )
        if self.fused and fusable_resid:
            # near-banded split (ops/banded_residual.py): the compact
            # residual rides the fused kernels' extra operand
            wl, bl = _DenseParams(self.out_dim, True, name="lin_l")(x.shape[1])
            wr, _ = _DenseParams(self.out_dim, False, name="lin_r")(x.shape[1])
            return banded_residual_sage_apply(
                x, wl, wr, bl, blocked_fwd, self.use_pallas, None
            )
        agg = self._aggregate(x, blocked_fwd, blocked_rev, num_nodes)
        out = nn.Dense(self.out_dim, use_bias=True, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, name="lin_r")(x)

    def _aggregate(self, x, blocked_fwd, blocked_rev, num_nodes: int):
        if isinstance(blocked_fwd, GatherResidualLayout):
            # low-degree tier (ops/spmm_gather.py): sparse in-band codes +
            # VMEM row gathers — A traffic ∝ edges, not N×bandwidth
            agg = spmm_gather_residual_apply(x, blocked_fwd, self.use_pallas)
        elif isinstance(blocked_fwd, BandedResidualLayout):
            agg = spmm_banded_residual_apply(x, blocked_fwd, self.use_pallas)
        elif isinstance(blocked_fwd, BandedBlocks):
            # banded backend (ops/spmm_banded.py): windowed x DMA shared by
            # K dst blocks — fastest on locality graphs (1.38x over the
            # compact dense tiles per aggregation on v5e)
            if self.int8_features:
                if self.use_pallas:
                    agg = spmm_banded_infer_int8(x, blocked_fwd)
                else:
                    # XLA fallback: same quantization, dequantized aggregate.
                    # Inference-only like the kernel path — the quantize
                    # round is zero-derivative a.e., so no gradient flows
                    # through the aggregation here (the Pallas path fails
                    # loudly under AD instead; this one must not be trained)
                    from ..ops.quant import quantize_tensor_xla

                    xq, s = quantize_tensor_xla(x)
                    agg = spmm_banded_xla(
                        xq.astype(jnp.float32) * s[0], blocked_fwd)
            else:
                agg = spmm_banded_apply(x, blocked_fwd, blocked_rev, self.use_pallas)
        elif isinstance(blocked_fwd, HybridLayout):
            # density-split backend (ops/spmm_hybrid.py): dense tiles for
            # dense block pairs + one-hot chunks for stragglers; carries
            # both directions itself (pass blocked_rev=None)
            agg = spmm_hybrid_apply(x, blocked_fwd, self.use_pallas)
        elif isinstance(blocked_fwd, DenseBlocks):
            # dense-block backend (ops/spmm_dense.py): precomputed adjacency
            # tiles; ~10x fewer matmul FLOPs on locality graphs, 5.35x
            # measured per aggregation on v5e (prepare_dense_mean_aggregate)
            agg = spmm_dense_apply(x, blocked_fwd, blocked_rev, self.use_pallas)
        else:
            agg = spmm_apply(
                x, blocked_fwd, blocked_rev, num_nodes, self.use_pallas, self.k_per_step
            )
        return agg


class BlockedSageBlock(nn.Module):
    hidden_dims: Sequence[int]
    dropout: float | None = None
    negative_slope: float | None = None
    use_pallas: bool = True
    k_per_step: int = 1
    int8_features: bool = False  # inference-only (see BlockedSageConv)
    fused: bool = False  # epilogue fusion (see BlockedSageConv)
    # whole-sublayer fusion: conv + LayerNorm + activation as ONE kernel
    # each way on banded/residual layouts (ops/sage_fused.py
    # banded_sage_ln_apply) — the pre-activation never round-trips HBM.
    # Params stay at conv{i}/norm{i} paths, checkpoint-compatible.
    fused_ln: bool = False

    @nn.compact
    def __call__(self, x, blocked_fwd, blocked_rev, num_nodes: int, *, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            conv = BlockedSageConv(
                h, use_pallas=self.use_pallas, k_per_step=self.k_per_step,
                int8_features=self.int8_features, fused=self.fused, name=f"conv{i}"
            )
            if self.fused_ln and not self.int8_features:
                gamma, beta = _LNParams(name=f"norm{i}")(h)
                x = conv(x, blocked_fwd, blocked_rev, num_nodes,
                         ln=(gamma, beta), negative_slope=self.negative_slope)
            else:
                x = conv(x, blocked_fwd, blocked_rev, num_nodes)
                x = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
                x = _activation(x, self.negative_slope)
            if self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class BlockedSageClassifier(nn.Module):
    """Node classifier: BlockedSageBlock -> linear head (big-graph
    full-batch node classification, BASELINE config 4 style)."""

    hidden_dims: Sequence[int]
    num_classes: int
    dropout: float | None = None
    negative_slope: float | None = None
    use_pallas: bool = True
    k_per_step: int = 1
    int8_features: bool = False  # inference-only (see BlockedSageConv)
    fused: bool = False  # epilogue fusion (see BlockedSageConv)
    fused_ln: bool = False  # conv+LN+act single-kernel (see BlockedSageBlock)

    @nn.compact
    def __call__(self, x, blocked_fwd, blocked_rev, num_nodes: int, *, train: bool = False):
        h = BlockedSageBlock(
            self.hidden_dims, dropout=self.dropout, negative_slope=self.negative_slope,
            use_pallas=self.use_pallas, k_per_step=self.k_per_step,
            int8_features=self.int8_features, fused=self.fused,
            fused_ln=self.fused_ln, name="sage",
        )(x, blocked_fwd, blocked_rev, num_nodes, train=train)
        return nn.Dense(self.num_classes, name="head")(h)
