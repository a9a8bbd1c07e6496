"""Padded-batch loader over a :class:`GraphDataset`.

Replaces PyG ``DataLoader`` (reference: main.py:166-167) with static-shape
collation: capacities are computed once from the dataset so every batch of
an epoch compiles to the same XLA program; the final partial batch is padded
with masked-out graphs rather than producing a different shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..graph.batching import (BatchDims, compute_batch_dims, pad_and_batch,
                              pad_and_batch_aligned)
from ..graph.containers import PaddedGraphBatch
from .dataset import GraphDataset


class GraphLoader:
    """``buckets > 1`` enables degree-bucketed capacities: graphs are
    partitioned into size quantiles (by node count), each bucket gets its
    own (smaller) static capacities and shuffles internally, and batches
    from all buckets are interleaved in random order. This bounds XLA
    compilations to ``buckets`` programs while cutting padding waste on
    skewed pack-size distributions (SURVEY.md §7 hard part 1)."""

    def __init__(
        self,
        dataset: GraphDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        dims: BatchDims | None = None,
        seed: int = 0,
        drop_last: bool = False,
        buckets: int = 1,
        dense_adj: bool = False,
    ):
        """``dense_adj``: emit block-diagonal aligned batches carrying the
        [G, vmax, vmax] mean-aggregation adjacency — the scatter-free
        SAGE/pool path (BASELINE.md round 5: the flagship step drops 2-7
        ms of TPU scatter cost per step). vmax is each bucket's max node
        count; per-batch node capacity becomes G*vmax (worth it below a
        few hundred nodes per graph; bucketing bounds the padding)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.dense_adj = dense_adj
        self._rng = np.random.default_rng(seed)

        num_labels = len(dataset.active_labels)
        probe = dataset.get(0)
        raw = [dataset.get_raw(i) for i in range(len(dataset))]

        def fix_frames(d: BatchDims) -> BatchDims:
            if probe.x.shape[1] != d.num_frames:  # CutFrames shrinks F
                return BatchDims(
                    node_capacity=d.node_capacity, edge_capacity=d.edge_capacity,
                    graph_capacity=d.graph_capacity, num_frames=probe.x.shape[1],
                    num_labels=num_labels,
                )
            return d

        self._bucket_vmax: list[int] = []
        if dims is not None or buckets <= 1 or len(raw) < 2 * buckets:
            if dims is None:
                dims = fix_frames(compute_batch_dims(raw, batch_size, num_labels))
            self.dims = dims
            self._bucket_members = [np.arange(len(raw))]
            self._bucket_dims = [dims]
            self._bucket_vmax = [max((g.num_nodes for g in raw), default=1)]
        else:
            sizes = np.array([g.num_nodes for g in raw])
            order = np.argsort(sizes, kind="stable")
            splits = np.array_split(order, buckets)
            self._bucket_members = [s for s in splits if len(s)]
            self._bucket_dims = [
                fix_frames(compute_batch_dims([raw[i] for i in members], batch_size, num_labels))
                for members in self._bucket_members
            ]
            self._bucket_vmax = [
                max((raw[i].num_nodes for i in members), default=1)
                for members in self._bucket_members
            ]
            self.dims = self._bucket_dims[-1]  # largest bucket's capacities

    def __len__(self) -> int:
        total = 0
        for members in self._bucket_members:
            n = len(members)
            total += n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size
        return total

    def __iter__(self) -> Iterator[PaddedGraphBatch]:
        batches: list[tuple[int, np.ndarray]] = []
        for bi, members in enumerate(self._bucket_members):
            order = self._rng.permutation(members) if self.shuffle else np.asarray(members)
            for s in range(0, len(order), self.batch_size):
                idxs = order[s : s + self.batch_size]
                if self.drop_last and len(idxs) < self.batch_size:
                    continue
                batches.append((bi, idxs))
        if self.shuffle and len(self._bucket_members) > 1:
            self._rng.shuffle(batches)
        for bi, idxs in batches:
            graphs = [self.dataset.get(int(i), self._rng) for i in idxs]
            d = self._bucket_dims[bi]
            if self.dense_adj:
                # the BUCKET's static vmax: one XLA program per bucket,
                # same as the flat path
                vmax = self._bucket_vmax[bi]
                yield pad_and_batch_aligned(
                    graphs, vmax, num_frames=d.num_frames,
                    num_labels=d.num_labels, graph_capacity=d.graph_capacity,
                    edge_capacity=d.edge_capacity)
            else:
                yield pad_and_batch(graphs, d)
