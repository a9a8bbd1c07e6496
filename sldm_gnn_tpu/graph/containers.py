"""Padded, static-shape graph batch containers (the PyG ``Data``/``Batch``
replacement designed for XLA).

The reference carries ragged per-pack graphs (variable V vehicles, E edges)
through PyG ``Data`` objects (src/gbuilder.py:537-554 field docstring). Under
jit every shape must be static, so a batch of graphs becomes fixed-capacity
arrays plus masks:

  * nodes of all graphs concatenated then zero-padded to ``N`` rows,
  * edges concatenated then padded to ``E`` rows,
  * per-node graph ids (padding nodes get id ``G`` so segment reductions
    with ``num_segments=G`` drop them for free),
  * padded edges carry ``src=dst=N-safe index 0`` with ``edge_mask=0``.

Registered as a pytree so it flows through jit/pjit/shard_map unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np


@dataclass(frozen=True)
class GraphArrays:
    """A single un-padded graph, host-side (numpy). Field parity with the
    reference's per-pack ``Data`` (src/gbuilder.py:111-134):

      x         [V, F, 6] float32 — X, Y, Speed, HeadingSin, HeadingCos, PresenceFlag
      xsttype   [V]       int32   — station-type category
      xdims     [V, 2]    float32 — width, length
      edge_index[2, E]    int32   — directed (src, dst) pairs
      edge_attr [E, 4]    float32 — min/max/mean/meansq trajectory distance
      y         [L]       float32 or None — multi-hot labels
      pos_raw   [V, F, 2] float32 or None — XY before z-score normalization
    """

    x: np.ndarray
    xsttype: np.ndarray
    xdims: np.ndarray
    edge_index: np.ndarray
    edge_attr: np.ndarray
    y: np.ndarray | None = None
    pos_raw: np.ndarray | None = None

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedGraphBatch:
    """A fixed-capacity batch of graphs (device-side).

    Shapes (all static): N = node capacity, E = edge capacity,
    G = graph capacity, F = frames, L = labels.
    """

    x: jax.Array  # [N, F, 6]
    xsttype: jax.Array  # [N] int32
    xdims: jax.Array  # [N, 2]
    pos_raw: jax.Array  # [N, F, 2]
    edge_src: jax.Array  # [E] int32
    edge_dst: jax.Array  # [E] int32
    edge_attr: jax.Array  # [E, 4]
    edge_mask: jax.Array  # [E] bool
    node_mask: jax.Array  # [N] bool
    node_graph: jax.Array  # [N] int32; padding rows get G
    y: jax.Array  # [G, L]
    graph_mask: jax.Array  # [G] bool
    # OPTIONAL dense block-diagonal layout (pad_and_batch_aligned): graph
    # g's nodes occupy rows [g*vmax, (g+1)*vmax) and ``adj [G, vmax,
    # vmax]`` holds the row-normalized mean-aggregation weights
    # (adj[g, i, j] = multiplicity(j->i)/in_deg(i)). With it, SAGE
    # aggregation is a batched matmul and pooling a masked reshape-reduce
    # — no TPU scatters (3.4 ms/aggregation at flagship batch 2048,
    # BASELINE.md round 5). None = flat layout, segment-op path.
    adj: jax.Array | None = None

    @property
    def node_capacity(self) -> int:
        return self.x.shape[0]

    @property
    def edge_capacity(self) -> int:
        return self.edge_src.shape[0]

    @property
    def graph_capacity(self) -> int:
        return self.y.shape[0]

    @property
    def num_frames(self) -> int:
        return self.x.shape[1]

    def replace(self, **kw) -> "PaddedGraphBatch":
        return dataclasses.replace(self, **kw)
