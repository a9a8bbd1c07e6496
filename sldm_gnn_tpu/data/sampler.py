"""Fanout neighbor sampling with static shapes (BASELINE config 3).

Mini-batch GraphSAGE over a large graph: for a batch of seed nodes, sample
a fixed fanout of in-neighbors per hop, producing a *fixed-shape* node-id
tree — level l holds ``B * f1 * ... * fl`` ids plus a validity mask.
Zero-degree slots are padded with the parent id and masked out.

TPU-first: downstream aggregation is pure reshape + masked mean over the
fanout axis (models/sampled_sage.py) — no scatter, no ragged shapes, every
batch compiles once. This replaces the role of PyG's NeighborLoader native
sampler (SURVEY.md §2.3) with a design that keeps the device program dense.

Sampling modes: ``uniform`` (with replacement — standard GraphSAGE),
``uniform_norep`` (without replacement — PyG NeighborLoader's default
semantics: min(f, deg) DISTINCT neighbors per hop, surplus slots masked)
and ``first`` (deterministic first-k neighbors — reproducible tests/eval).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SampledBatch:
    """levels[l]: int32 ids of level-l nodes, shape [B * prod(fanouts[:l])];
    masks[l]: bool validity (False = padded slot). Level 0 = the seeds."""

    levels: tuple[np.ndarray, ...]
    masks: tuple[np.ndarray, ...]
    fanouts: tuple[int, ...]


def _floyd_norep_offsets(deg: np.ndarray, f: int,
                         rng: np.random.Generator) -> np.ndarray:
    """[k, f] per-parent neighbor offsets WITHOUT replacement.

    Rows with deg <= f take offsets 0..deg-1 (the full neighbor set; the
    caller masks slots >= deg). Rows with deg > f use Floyd's f-subset
    algorithm — each outer iteration is vectorized over rows, with the
    O(f) membership probe kept cheap by f being small (fanouts ~10-25):
    for j in [d-f, d): pick t ~ U[0, j]; take j if t already picked,
    else t. Uniform over f-subsets (within-row order is not uniform,
    which is irrelevant to an unordered neighbor mean)."""
    k = len(deg)
    offs = np.minimum(
        np.broadcast_to(np.arange(f), (k, f)),
        np.maximum(deg - 1, 0)[:, None]).astype(np.int64).copy()
    hi = deg > f
    if hi.any():
        dh = deg[hi]
        picks = np.zeros((int(hi.sum()), f), np.int64)
        for j in range(f):
            jj = dh - f + j
            t = rng.integers(0, jj + 1)
            if j:
                dup = (picks[:, :j] == t[:, None]).any(axis=1)
                t = np.where(dup, jj, t)
            picks[:, j] = t
        offs[hi] = picks
    return offs


class NeighborSampler:
    def __init__(self, src: np.ndarray, dst: np.ndarray, num_nodes: int):
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        order = np.argsort(dst, kind="stable")
        self.nbr = src[order]  # in-neighbors grouped by destination
        counts = np.bincount(dst, minlength=num_nodes)
        self.indptr = np.zeros(num_nodes + 1, np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.num_nodes = num_nodes

    def sample(
        self,
        seeds: np.ndarray,
        fanouts: tuple[int, ...],
        *,
        rng: np.random.Generator | None = None,
        mode: str = "uniform",
    ) -> SampledBatch:
        rng = rng or np.random.default_rng()
        levels = [np.asarray(seeds, np.int32)]
        masks = [np.ones(len(seeds), bool)]
        for f in fanouts:
            parents = levels[-1].astype(np.int64)
            pmask = masks[-1]
            deg = self.indptr[parents + 1] - self.indptr[parents]
            k = len(parents)
            if mode == "uniform":
                offs = rng.integers(0, np.maximum(deg, 1)[:, None], size=(k, f))
            elif mode == "uniform_norep":
                offs = _floyd_norep_offsets(deg, f, rng)
            elif mode == "first":
                offs = np.minimum(
                    np.broadcast_to(np.arange(f), (k, f)),
                    np.maximum(deg - 1, 0)[:, None],
                )
            else:
                raise ValueError(f"unknown sampling mode: {mode}")
            # clamp gather rows for zero-degree parents (indptr can equal E
            # for trailing nodes with no in-edges); they are masked below
            idx = np.minimum(
                self.indptr[parents][:, None] + offs, max(len(self.nbr) - 1, 0)
            )
            child = (
                self.nbr[idx] if len(self.nbr) else np.zeros((k, f), np.int64)
            )
            if mode == "uniform_norep":
                # slot j exists only while j < deg: surplus slots masked
                valid = (np.arange(f)[None, :] < deg[:, None]) & pmask[:, None]
            else:
                valid = (deg > 0)[:, None] & pmask[:, None] & np.ones((1, f), bool)
            # padded slots point at the parent (a safe gather target)
            child = np.where(valid, child, parents[:, None])
            levels.append(child.reshape(-1).astype(np.int32))
            masks.append(valid.reshape(-1))
        return SampledBatch(levels=tuple(levels), masks=tuple(masks), fanouts=tuple(fanouts))


def iterate_seed_batches(
    num_nodes: int, batch_size: int, *, shuffle: bool = True, rng=None
):
    """Yield fixed-size seed batches covering all nodes (last batch wraps)."""
    rng = rng or np.random.default_rng()
    order = rng.permutation(num_nodes) if shuffle else np.arange(num_nodes)
    for s in range(0, num_nodes, batch_size):
        chunk = order[s : s + batch_size]
        if len(chunk) < batch_size:  # wrap (tiling as needed) to keep shapes static
            chunk = np.concatenate([chunk, np.resize(order, batch_size - len(chunk))])
        yield chunk
