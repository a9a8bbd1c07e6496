"""Config-3 sampled training driver (train/sampled_loop.py): end-to-end
learning on a separable community graph, static-shape batch generation
(wrap padding + real-count accounting), and throughput fields."""

import numpy as np
import jax
import pytest

from sldm_gnn_tpu.data.sampler import NeighborSampler
from sldm_gnn_tpu.train.sampled_loop import (
    sampled_batches,
    train_sampled_classifier,
)


def _community_graph(rng, n=120, deg=6, n_com=3):
    """Nodes in the same community connect; features shift per community."""
    com = np.arange(n) % n_com
    src, dst = [], []
    for i in range(n):
        peers = np.nonzero(com == com[i])[0]
        for p in rng.choice(peers, deg):
            src.append(p)
            dst.append(i)
    x = rng.standard_normal((n, 8)).astype(np.float32) * 0.2
    x += com[:, None] * 1.5
    return np.array(src), np.array(dst), x, com.astype(np.int64)


def test_train_sampled_classifier_learns(rng):
    src, dst, x, y = _community_graph(rng)
    state, res = train_sampled_classifier(
        src, dst, len(x), x, y,
        hidden_dims=(16, 16), fanouts=(4, 4), batch_size=32, epochs=25,
        lr=1e-2, weight_decay=0.0, seed=0)
    assert res.val_acc[-1] >= 0.9, res.val_acc
    assert res.train_loss[-1] < res.train_loss[0]
    assert res.seeds_per_s > 0 and res.sampled_edges_per_s > 0


def test_sampled_batches_static_shapes(rng):
    src, dst, x, y = _community_graph(rng, n=50)
    sampler = NeighborSampler(src, dst, 50)
    seeds = np.arange(50)
    batches = list(sampled_batches(
        sampler, seeds, 16, (3, 2), y, rng=np.random.default_rng(0),
        shuffle=False))
    assert len(batches) == 4  # ceil(50/16): last batch wrap-padded
    for levels, masks, yy, n_real, n_edges in batches:
        assert levels[0].shape == (16,)
        assert levels[1].shape == (48,)
        assert levels[2].shape == (96,)
        assert yy.shape == (16,)
        # n_edges is THIS batch's valid tree-edge count from the host masks
        assert n_edges == sum(int(np.asarray(m).sum()) for m in masks[1:])
        assert 0 < n_edges <= 48 + 96
    assert batches[-1][3] == 50 - 3 * 16  # real seed count of the tail
    # every real seed appears exactly once across batches
    all_seeds = np.concatenate(
        [np.asarray(b[0][0])[: b[3]] for b in batches])
    assert sorted(all_seeds.tolist()) == sorted(seeds.tolist())
