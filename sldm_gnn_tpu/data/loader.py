"""Padded-batch loader over a :class:`GraphDataset`.

Replaces PyG ``DataLoader`` (reference: main.py:166-167) with static-shape
collation: capacities are computed once from the dataset so every batch of
an epoch compiles to the same XLA program; the final partial batch is padded
with masked-out graphs rather than producing a different shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..graph.batching import BatchDims, compute_batch_dims, pad_and_batch
from ..graph.containers import PaddedGraphBatch
from .dataset import GraphDataset


class GraphLoader:
    def __init__(
        self,
        dataset: GraphDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        dims: BatchDims | None = None,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        if dims is None:
            num_labels = len(dataset.active_labels)
            # capacity from raw graphs; CutFrames shrinks F, recompute below
            probe = dataset.get(0)
            dims = compute_batch_dims(
                [dataset.get_raw(i) for i in range(len(dataset))], batch_size, num_labels
            )
            if probe.x.shape[1] != dims.num_frames:
                dims = BatchDims(
                    node_capacity=dims.node_capacity,
                    edge_capacity=dims.edge_capacity,
                    graph_capacity=dims.graph_capacity,
                    num_frames=probe.x.shape[1],
                    num_labels=num_labels,
                )
        self.dims = dims

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[PaddedGraphBatch]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for s in range(0, n, self.batch_size):
            idxs = order[s : s + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            graphs = [self.dataset.get(int(i), self._rng) for i in idxs]
            yield pad_and_batch(graphs, self.dims)
