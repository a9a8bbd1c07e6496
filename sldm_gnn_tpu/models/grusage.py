"""GruSage — the flagship model: per-node GRU temporal encoder -> feature
concat -> MLP -> optional map context (map GNN + KNN attention) -> GraphSAGE
message passing -> global pooling -> MLP -> multi-label logits.

Forward parity with /root/reference/src/models/grusage.py:152-192, step for
step:
  1 station-type embedding                 (:156)
  2 GRU over frames, last hidden state     (:160-161)
  3 concat [gru_h, xdims, st_emb]          (:164-165)
  4 FC1 stack                              (:168-169)
  4b map encode + spatial attention concat (:171-179)
  5 SageBlock over inter-vehicle edges     (:182)
  6 global mean/max/double pooling         (:185, :113-122)
  7 FC2 stack                              (:188-189)
  8 linear head -> [G, out_dim] logits     (:191)

Differences by design (TPU-first): operates on a :class:`PaddedGraphBatch`
with static shapes and masks instead of ragged PyG batches; the map branch
takes either live ``MapData`` (training — encoder recomputed under jit, XLA
hoists the constant parts) or pre-baked ``(map_embeddings, map_centroids)``
(inference — the reference's snapshot trick, grusage.py:144-149).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.containers import PaddedGraphBatch
from ..ops.gru import GRUParams, gru_forward
from ..ops.segment import (dense_max_pool, dense_mean_pool,
                           global_max_pool, global_mean_pool)
from .blocks import MLPStack, SageBlock
from .map_modules import MapData, MapEncoder, MapSpatialAttention


@dataclass(frozen=True)
class GruSageConfig:
    """Constructor-argument parity with GruSage.__init__ (grusage.py:13).

    This doubles as the serialized model config stored in snapshots
    (the reference's ``config_dict``/``ip_dict``, grusage.py:23-42).
    """

    dynamic_features_num: int = 6
    frames_num: int = 100
    gru_hidden_size: int = 96
    gru_num_layers: int = 1
    fc1dims: tuple[int, ...] = (96,)
    sage_hidden_dims: tuple[int, ...] = (96, 96)
    fc2dims: tuple[int, ...] = (32,)
    out_dim: int = 1
    num_st_types: int = 256
    emb_dim: int = 8
    dropout: float | None = 0.25
    negative_slope: float | None = 0.1
    global_pooling: str = "double"  # 'mean' | 'max' | 'double'
    map_included: bool = False
    num_lane_types: int = 8
    mapenc_sage_hdims: tuple[int, ...] = (8, 8)
    mapenc_lane_embdim: int = 2
    map_attention_topk: int = 5
    # SPMD: mesh axis name over which the map graph's edges are partitioned
    # (None = map encoder runs fully local/replicated)
    map_edge_axis: str | None = None
    # SPMD: mesh axis over which the map SEGMENTS are sharded — the fully-
    # sharded map branch for maps that do not fit replicated (SURVEY.md §7
    # hard part 5): the encoder aggregates via halo exchange and returns
    # only local [S/P, H] rows; the KNN attention merges per-shard top-k
    # candidates (ops/knn.knn_topk_sharded) — the [S, D] table, [S, 2]
    # centroids, and [V, S] distances never materialize on a device.
    # ``map_data`` must then be a ShardedMapData (shard_map_data_segments)
    # and the model must run inside shard_map (parallel/data_parallel.py).
    # Mutually exclusive with map_edge_axis.
    map_segment_axis: str | None = None
    # message passing family for the vehicle graph: 'sage' (mean aggregation,
    # reference parity) or 'attention' (edge dot-product attention)
    sage_type: str = "sage"
    attention_qk_dim: int = 32
    # computation dtype for the dense/SAGE/attention stacks: None (f32
    # parity) or 'bfloat16' (mixed precision: bf16 matmuls, f32 params and
    # f32 GRU recurrence/logits)
    compute_dtype: str | None = None
    # round the GRU hidden width up to a multiple of this inside the scan
    # (MXU lane alignment; exact modulo f32 reduction order — ops/gru.py);
    # None (default) runs at the stored width. Padding H=96->128 measured
    # NEUTRAL-to-slower at flagship sizes on v5e once timing amortized the
    # relay's per-dispatch latency (bench_flagship.py: 2.37-2.58 ms stock
    # vs 2.50-3.36 ms padded at 300 iters) — the earlier "-33%" reading
    # was a 20-iteration measurement artifact. Kept as an option for
    # hidden sizes far off lane alignment.
    gru_pad_to: int | None = None
    # GRU implementation: 'scan' (XLA lax.scan, f32, reference-parity
    # default) or 'pallas' (ops/gru_pallas.gru_last_forward — the
    # row-blocked fused kernel: bf16 MXU operands/carry, in-kernel input
    # projection, h_last-only cotangent; ~1e-2 rel vs the f32 scan and
    # 2.5x faster fwd+bwd at TPU-native batch, bench_flagship_diag.py).
    # The pallas path needs the temporal cotangent structure the fused
    # kernel provides (only h_last consumed) — exactly GruSage's use.
    gru_impl: str = "scan"
    # map-branch KNN implementation: 'topk' (XLA lax.top_k, parity
    # default) or 'pallas' (ops/knn_pallas — fused distance+select, the
    # [V, S] tile never leaves VMEM; indices exact, distances within
    # ~1 ulp FMA rounding; forward-only — positions/centroids are input
    # data, so training takes no cotangent through the selection)
    knn_impl: str = "topk"

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "GruSageConfig":
        d = dict(d)
        for k in ("fc1dims", "sage_hidden_dims", "fc2dims", "mapenc_sage_hdims"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        return GruSageConfig(**d)


class GruSage(nn.Module):
    cfg: GruSageConfig

    def setup(self):
        c = self.cfg
        if c.compute_dtype not in (None, "bfloat16", "float32"):
            raise ValueError(
                f"Unsupported compute_dtype: {c.compute_dtype!r} "
                "(use None/'float32' or 'bfloat16')"
            )
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.st_emb = nn.Embed(c.num_st_types, c.emb_dim, name="st_emb")
        if c.gru_impl not in ("scan", "pallas", "pallas_sg"):
            raise ValueError(
                f"Unsupported gru_impl: {c.gru_impl!r} "
                "(use 'scan', 'pallas', or 'pallas_sg')")
        self.gru = GRUCell(
            input_size=c.dynamic_features_num,
            hidden_size=c.gru_hidden_size,
            num_layers=c.gru_num_layers,
            pad_to=c.gru_pad_to,
            impl=c.gru_impl,
        )
        self.fc1s = MLPStack(c.fc1dims, dropout=c.dropout, negative_slope=c.negative_slope, dtype=dt)
        if c.map_included:
            if c.map_edge_axis is not None and c.map_segment_axis is not None:
                raise ValueError(
                    "map_edge_axis and map_segment_axis are mutually "
                    "exclusive (edge-sharded replicated encoder vs fully "
                    "segment-sharded map branch)")
            self.map_encoder = MapEncoder(
                num_lane_types=c.num_lane_types,
                lane_embed_dim=c.mapenc_lane_embdim,
                sage_hidden_dims=c.mapenc_sage_hdims,
                dropout=c.dropout,
                negative_slope=c.negative_slope,
                edge_axis=c.map_edge_axis,
                segment_axis=c.map_segment_axis,
            )
            if c.knn_impl not in ("topk", "pallas"):
                raise ValueError(
                    f"Unsupported knn_impl: {c.knn_impl!r} (use 'topk' or 'pallas')")
            self.map_attention = MapSpatialAttention(
                k_neighbors=c.map_attention_topk,
                segment_axis=c.map_segment_axis,
                knn_impl=c.knn_impl,
            )
        if c.sage_type == "attention":
            from .attention import AttentionBlock

            self.sage = AttentionBlock(
                c.sage_hidden_dims, qk_dim=c.attention_qk_dim,
                dropout=c.dropout, negative_slope=c.negative_slope, dtype=dt,
            )
        elif c.sage_type == "sage":
            self.sage = SageBlock(
                c.sage_hidden_dims, dropout=c.dropout, negative_slope=c.negative_slope,
                dtype=dt,
            )
        else:
            raise ValueError(f"Unsupported sage_type: {c.sage_type}")
        self.fc2s = MLPStack(c.fc2dims, dropout=c.dropout, negative_slope=c.negative_slope, dtype=dt)
        # logits head stays f32 for loss stability
        self.linout = nn.Dense(c.out_dim, name="linout")

    def encode_map(self, map_data: MapData, *, train: bool = False) -> jax.Array:
        """Run just the map GNN — used to bake embeddings into snapshots."""
        return self.map_encoder(map_data, train=train)

    def __call__(
        self,
        batch: PaddedGraphBatch,
        *,
        map_data: MapData | None = None,
        map_embeddings: jax.Array | None = None,
        map_centroids: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        c = self.cfg
        N = batch.node_capacity
        G = batch.graph_capacity

        # 1 - station type embedding
        st = self.st_emb(batch.xsttype)

        # 2 - GRU over frames; last hidden state of top layer
        _, h = self.gru(batch.x)

        # 3 - concat static dims + embedding
        x = jnp.concatenate([h, batch.xdims, st], axis=1)

        # 4 - FC1 stack
        x = self.fc1s(x, train=train)

        # 4b - map context
        if c.map_included:
            last_pos = batch.pos_raw[:, -1, :]
            if map_embeddings is None:
                assert map_data is not None, "map_included model needs map_data or baked embeddings"
                map_embeddings = self.map_encoder(map_data, train=train)
                if c.map_segment_axis is not None:
                    # segment-sharded branch: local embedding rows + local
                    # centroids; the attention's k-way merge produces the
                    # replicated [V, D] context
                    map_centroids = map_data.centroids[0]
                else:
                    map_centroids = map_data.centroids
            elif map_centroids is None:
                raise ValueError(
                    "baked map_embeddings require map_centroids (snapshots "
                    "bake both — see train/snapshot.py); got centroids=None")
            ctx = self.map_attention(last_pos, map_centroids, map_embeddings)
            x = jnp.concatenate([x, ctx], axis=1)

        # 5 - GraphSAGE over inter-vehicle edges. A batch built by
        # pad_and_batch_aligned carries the dense block-diagonal
        # adjacency: aggregation + pooling run scatter-free (the segment
        # ops cost ~3.4 ms/aggregation at batch-2048 shapes on TPU)
        dense = batch.adj is not None and c.sage_type == "sage"
        if dense:
            x = self.sage(x, batch.edge_src, batch.edge_dst,
                          batch.edge_mask, N, adj=batch.adj, train=train)
        else:
            x = self.sage(x, batch.edge_src, batch.edge_dst, batch.edge_mask, N, train=train)

        # 6 - graph readout
        if dense:
            vmax = batch.adj.shape[1]
            mean_pool = lambda: dense_mean_pool(x, batch.node_mask, G, vmax)
            max_pool = lambda: dense_max_pool(x, batch.node_mask, G, vmax)
        else:
            mean_pool = lambda: global_mean_pool(
                x, batch.node_graph, batch.node_mask, G)
            max_pool = lambda: global_max_pool(
                x, batch.node_graph, batch.node_mask, G)
        if c.global_pooling == "mean":
            x = mean_pool()
        elif c.global_pooling == "max":
            x = max_pool()
        elif c.global_pooling == "double":
            x = jnp.concatenate([mean_pool(), max_pool()], axis=1)
        else:
            raise ValueError(f"Unsupported global_pooling: {c.global_pooling}")

        # 7/8 - FC2 stack + linear head
        x = self.fc2s(x, train=train)
        return self.linout(x)


class GRUCell(nn.Module):
    """Flax wrapper owning the stacked GRU parameters (ops/gru.py math).

    ``impl='pallas'`` dispatches to the row-blocked fused kernel
    (ops/gru_pallas.gru_last_forward) and returns ``(None, h_last)`` —
    the full output sequence is not materialized, which is the point
    (GruSage consumes only the final hidden state,
    /root/reference/src/models/grusage.py:160-161)."""

    input_size: int
    hidden_size: int
    num_layers: int = 1
    pad_to: int | None = None
    impl: str = "scan"

    @nn.compact
    def __call__(self, x):
        # parameter shapes computed directly (torch GRU layout: 3H gate
        # stacks; layer 0 separate from the [num_layers-1, ...] rest) —
        # never materialize a dummy parameter set just to read .shape
        h3 = 3 * self.hidden_size
        lrest = max(self.num_layers - 1, 0)
        shapes = dict(
            w_ih0=(self.input_size, h3), w_hh0=(self.hidden_size, h3),
            b_ih0=(h3,), b_hh0=(h3,),
            w_ih=(lrest, self.hidden_size, h3), w_hh=(lrest, self.hidden_size, h3),
            b_ih=(lrest, h3), b_hh=(lrest, h3),
        )

        def mk(name, shape):
            bound = 1.0 / (self.hidden_size**0.5)
            return self.param(
                name,
                lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound),
                shape,
            )

        if self.num_layers > 1:
            rest = dict(
                w_ih=mk("w_ih", shapes["w_ih"]),
                w_hh=mk("w_hh", shapes["w_hh"]),
                b_ih=mk("b_ih", shapes["b_ih"]),
                b_hh=mk("b_hh", shapes["b_hh"]),
            )
        else:
            # zero-size constants, NOT params: keeps the param tree free of
            # empty arrays (orbax cannot serialize zero-size leaves)
            rest = dict(
                w_ih=jnp.zeros(shapes["w_ih"]),
                w_hh=jnp.zeros(shapes["w_hh"]),
                b_ih=jnp.zeros(shapes["b_ih"]),
                b_hh=jnp.zeros(shapes["b_hh"]),
            )
        params = GRUParams(
            w_ih0=mk("w_ih0", shapes["w_ih0"]),
            w_hh0=mk("w_hh0", shapes["w_hh0"]),
            b_ih0=mk("b_ih0", shapes["b_ih0"]),
            b_hh0=mk("b_hh0", shapes["b_hh0"]),
            **rest,
        )
        if self.impl in ("pallas", "pallas_sg"):
            from ..ops.gru_pallas import gru_last_forward

            # Mosaic kernels need a TPU; CPU (tests, CLIs off-chip) runs
            # the same kernel under the Pallas interpreter.
            # with_dx=False: the temporal features are model INPUT DATA —
            # nothing differentiates through them in training — so the
            # fused backward skips the input-cotangent MXU pass + the
            # [N, T, D] write per frame. Input-saliency analyses should
            # use impl='scan' (always fully differentiable).
            interpret = jax.default_backend() != "tpu"
            # 'pallas_sg': the store-gates backward (ops/gru_pallas.py v3
            # header) — the forward streams packed bf16 gates to HBM
            # (hidden under its VPU-bound runtime) and BPTT reads them
            # back instead of recomputing: 15.5 -> 12.6 ms fwd+bwd at
            # 22.5k rows x 100 frames on v5e
            return None, gru_last_forward(params, x, interpret=interpret,
                                          with_dx=False,
                                          store_gates=self.impl == "pallas_sg")
        return gru_forward(params, x, pad_to=self.pad_to)
