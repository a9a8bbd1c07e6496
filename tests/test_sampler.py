"""Neighbor sampler + sampled GraphSAGE tests, incl. exact equivalence with
the full-batch SageBlock when fanouts cover all neighbors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.data.sampler import NeighborSampler, SampledBatch, iterate_seed_batches
from sldm_gnn_tpu.models.blocks import SageBlock
from sldm_gnn_tpu.models.sampled_sage import SampledSage


def test_sampler_children_are_neighbors(rng):
    n, e = 50, 400
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    s = NeighborSampler(src, dst, n)
    seeds = rng.integers(0, n, 8)
    batch = s.sample(seeds, (5, 3), rng=np.random.default_rng(0))

    nbr_sets = {i: set(src[dst == i]) for i in range(n)}
    for lvl in range(1, 3):
        parents = batch.levels[lvl - 1]
        f = batch.fanouts[lvl - 1]
        children = batch.levels[lvl].reshape(len(parents), f)
        cmask = batch.masks[lvl].reshape(len(parents), f)
        pmask = batch.masks[lvl - 1]
        for pi, p in enumerate(parents):
            for ci in range(f):
                if cmask[pi, ci]:
                    assert children[pi, ci] in nbr_sets[int(p)]
            if pmask[pi] and not nbr_sets[int(p)]:
                assert not cmask[pi].any()  # zero-degree -> all masked


def test_sampler_zero_degree_masks():
    # node 0 has no in-edges
    src = np.array([1, 2], np.int64)
    dst = np.array([1, 2], np.int64)
    s = NeighborSampler(src, dst, 3)
    b = s.sample(np.array([0]), (4,))
    assert not b.masks[1].any()
    np.testing.assert_array_equal(b.levels[1], [0, 0, 0, 0])  # padded with parent


def test_seed_batches_cover_all_nodes():
    seen = set()
    for chunk in iterate_seed_batches(17, 5, shuffle=True, rng=np.random.default_rng(0)):
        assert len(chunk) == 5
        seen.update(chunk.tolist())
    assert seen == set(range(17))


def test_sampled_equals_fullbatch_when_fanout_covers(rng):
    """Regular graph with in-degree == fanout: 'first' sampling collects the
    exact neighbor set, so sampled SAGE == full-batch SageBlock at seeds."""
    n, f1, f2, d = 24, 3, 3, 6
    # every node has exactly 3 in-neighbors
    src_list, dst_list = [], []
    for i in range(n):
        for k in range(1, 4):
            src_list.append((i + k) % n)
            dst_list.append(i)
    src = np.array(src_list, np.int64)
    dst = np.array(dst_list, np.int64)

    x = rng.standard_normal((n, d)).astype(np.float32)
    hdims = (8, 8)

    # full-batch reference
    full = SageBlock(hdims, dropout=None, negative_slope=0.1)
    vars_full = full.init(
        jax.random.PRNGKey(0),
        jnp.array(x), jnp.array(src), jnp.array(dst),
        jnp.ones(len(src), bool), n,
    )
    out_full = full.apply(
        vars_full, jnp.array(x), jnp.array(src), jnp.array(dst),
        jnp.ones(len(src), bool), n,
    )

    # sampled path with identical weights (same param naming scheme)
    sampler = NeighborSampler(src, dst, n)
    seeds = np.arange(n)
    batch = sampler.sample(seeds, (f1, f2), mode="first")
    feats = [jnp.array(x[lvl]) for lvl in batch.levels]
    masks = [jnp.array(m) for m in batch.masks]

    sampled = SampledSage(hdims, out_dim=None, dropout=None, negative_slope=0.1)
    out_sampled = sampled.apply(
        {"params": vars_full["params"]}, feats, masks, batch.fanouts
    )
    np.testing.assert_allclose(np.asarray(out_sampled), np.asarray(out_full), rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_sampled_sage_trains(rng):
    """Sampled mini-batch node classification learns a degree-correlated label."""
    import optax

    n = 60
    # communities: nodes < 30 connect among themselves, others among themselves
    src, dst, y = [], [], np.zeros(n, np.int32)
    for i in range(n):
        com = i >= 30
        y[i] = int(com)
        base = 30 if com else 0
        for k in range(1, 5):
            src.append(base + (i - base + k) % 30)
            dst.append(i)
    src, dst = np.array(src), np.array(dst)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    x[30:] += 1.0  # feature shift per community

    sampler = NeighborSampler(src, dst, n)
    model = SampledSage((16, 16), out_dim=2, dropout=None, negative_slope=0.1)

    b0 = sampler.sample(np.arange(8), (4, 4), rng=np.random.default_rng(0))
    feats0 = [jnp.array(x[lvl]) for lvl in b0.levels]
    masks0 = [jnp.array(m) for m in b0.masks]
    params = model.init(jax.random.PRNGKey(0), feats0, masks0, b0.fanouts)["params"]

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, feats, masks, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, feats, masks, (4, 4))
            onehot = jax.nn.one_hot(labels, 2)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    srng = np.random.default_rng(1)
    losses = []
    for epoch in range(30):
        for seeds in iterate_seed_batches(n, 8, rng=srng):
            b = sampler.sample(seeds, (4, 4), rng=srng)
            feats = [jnp.array(x[lvl]) for lvl in b.levels]
            masks = [jnp.array(m) for m in b.masks]
            params, opt_state, loss = step(params, opt_state, feats, masks, jnp.array(y[seeds]))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, losses


def test_zero_degree_trailing_node_no_crash():
    """Regression: sampling a node whose CSR offset equals the edge count
    (highest-id node with no in-edges) must mask, not IndexError."""
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    s = NeighborSampler(src, dst, 4)  # node 3 has no in-edges
    b = s.sample(np.array([3]), (2,))
    assert not b.masks[1].any()
    np.testing.assert_array_equal(b.levels[1], [3, 3])


def test_seed_batches_tile_when_batch_exceeds_nodes():
    """Regression: batch_size > num_nodes must still yield full batches."""
    chunks = list(iterate_seed_batches(3, 10, shuffle=False))
    assert all(len(c) == 10 for c in chunks)
    assert set(chunks[0][:3]) == {0, 1, 2}


def test_norep_exact_coverage(rng):
    """uniform_norep: per parent, valid children are DISTINCT true
    neighbors; the valid count equals min(f, deg); when deg <= f the
    sampled set IS the full neighbor set."""
    n = 40
    src = rng.integers(0, n, 300).astype(np.int64)
    dst = rng.integers(0, n, 300).astype(np.int64)
    s = NeighborSampler(src, dst, n)
    nbr_lists = {i: list(src[dst == i]) for i in range(n)}
    f = 5
    seeds = np.arange(n)
    batch = s.sample(seeds, (f,), rng=np.random.default_rng(0),
                     mode="uniform_norep")
    children = batch.levels[1].reshape(n, f)
    cmask = batch.masks[1].reshape(n, f)
    for p in range(n):
        deg = len(nbr_lists[p])
        valid = children[p][cmask[p]]
        assert len(valid) == min(f, deg), (p, deg)
        # distinct multiset positions (neighbors may repeat in the CSR via
        # parallel edges; offsets are distinct, so count multiplicities)
        offs_seen = sorted(valid.tolist())
        if deg <= f:
            assert offs_seen == sorted(nbr_lists[p]), p
        for c in valid:
            assert c in nbr_lists[p]


def test_norep_offsets_are_distinct_and_uniformish():
    """The Floyd subset sampler picks distinct offsets; over many draws
    every neighbor of a deg>f parent is selected at least once."""
    from sldm_gnn_tpu.data.sampler import _floyd_norep_offsets

    rng = np.random.default_rng(0)
    deg = np.array([12, 30, 7, 5, 1, 0], np.int64)
    f = 5
    seen = [set() for _ in deg]
    for _ in range(300):
        offs = _floyd_norep_offsets(deg, f, rng)
        for i, d in enumerate(deg):
            row = offs[i][: min(f, max(d, 0))] if d > 0 else []
            vals = list(offs[i][:f]) if d > f else list(offs[i][: max(d, 0)])
            if d > f:
                assert len(set(vals)) == f, (i, vals)  # distinct
                assert all(0 <= v < d for v in vals)
                seen[i].update(vals)
            elif d > 0:
                assert vals == list(range(d))  # full set, first-d order
    for i, d in enumerate(deg):
        if d > f:
            assert seen[i] == set(range(d)), (i, sorted(seen[i]))


def test_device_norep_matches_host_semantics(rng):
    """Device uniform_norep tree: distinct valid children per parent, all
    true neighbors, count == min(f, deg), surplus slots masked; 'first'
    mode is key-independent (deterministic)."""
    from sldm_gnn_tpu.train.sampled_loop import (
        csr_device_arrays, device_sample_tree)

    n = 40
    src = rng.integers(0, n, 250).astype(np.int64)
    dst = rng.integers(0, n, 250).astype(np.int64)
    s = NeighborSampler(src, dst, n)
    indptr, nbr, deg = csr_device_arrays(s)
    nbr_lists = {i: list(src[dst == i]) for i in range(n)}
    f = 4
    seeds = jnp.asarray(np.arange(n, dtype=np.int32))
    levels, masks = device_sample_tree(seeds, indptr, nbr, deg, (f,),
                                       jax.random.PRNGKey(3),
                                       "uniform_norep")
    children = np.asarray(levels[1]).reshape(n, f)
    cmask = np.asarray(masks[1]).reshape(n, f)
    degs = np.asarray(deg)
    for p in range(n):
        d = int(degs[p])
        valid = children[p][cmask[p]]
        assert len(valid) == min(f, d), (p, d)
        for c in valid:
            assert c in nbr_lists[p]
        if d > f:
            # offsets distinct => with distinct neighbor values they stay
            # distinct; with parallel edges values may collide, so check
            # via sorted CSR slice multiplicity instead
            row = sorted(valid.tolist())
            pool = sorted(nbr_lists[p])
            j = 0
            for v in row:
                while j < len(pool) and pool[j] < v:
                    j += 1
                assert j < len(pool) and pool[j] == v
                j += 1
    # 'first' is deterministic under different keys
    l1, m1 = device_sample_tree(seeds, indptr, nbr, deg, (f,),
                                jax.random.PRNGKey(0), "first")
    l2, m2 = device_sample_tree(seeds, indptr, nbr, deg, (f,),
                                jax.random.PRNGKey(99), "first")
    np.testing.assert_array_equal(np.asarray(l1[1]), np.asarray(l2[1]))
    np.testing.assert_array_equal(np.asarray(m1[1]), np.asarray(m2[1]))
