"""sldm_gnn_tpu — a TPU-native graph-neural-network framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
repo ``aledima00/sldm-gnn`` (multi-label driving-event classification from
multi-vehicle trajectory graphs): offline/online graph construction, padded
static-shape graph batching, GRU + GraphSAGE + map-attention models, jitted
training/eval loops, pack/event metrics, streaming inference, and multi-chip
SPMD execution over a ``jax.sharding.Mesh``.

Layer map (bottom-up):
  ops/       Pallas + XLA kernels: segment reductions, SpMM/SDDMM, GRU scan,
             masked KNN top-k.
  graph/     static-shape padded graph containers and batch collation.
  build/     vectorized offline/online graph + map construction
             (replaces /root/reference/src/gbuilder.py's Python loops).
  data/      dataset over built graph shards, z-score stats, transforms.
  models/    flax modules: SageBlock, MapEncoder, MapSpatialAttention, GruSage.
  train/     jitted train/eval steps, losses, sweep engine, snapshots.
  parallel/  mesh + shard_map SPMD: data-parallel batches, edge-partitioned
             graph aggregation with halo exchange.
  evals/     pack-level and event-level metrics, prior-shift calibration.
  serve/     streaming (FIFO JSON) online inference server.
  cli/       command-line entry points (build/train/test/rcv/compare).
"""

__version__ = "0.1.0"

from .labels import LabelsEnum  # noqa: F401
