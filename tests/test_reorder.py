"""Bandwidth-reduction reordering (graph/reorder.py): RCM/Hilbert recover
bandedness for shuffled locality graphs, aggregation parity holds through
the permutation, and prepare_auto_mean_aggregate(reorder=True) lands on the
banded tier instead of silently dropping to dense/one-hot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sldm_gnn_tpu.graph.reorder import (
    cuthill_mckee,
    hilbert_order,
    invert_perm,
    relabel_edges,
    reorder_for_banding,
    rcm_order,
    source_span_tiles,
)
from sldm_gnn_tpu.ops.spmm import spmm_xla
from sldm_gnn_tpu.ops.spmm_banded import BandedBlocks, spmm_banded_apply
from sldm_gnn_tpu.ops.spmm_hybrid import prepare_auto_mean_aggregate
from sldm_gnn_tpu.graph.csr import mean_weights


def shuffled_local_graph(n, deg, reach, seed=0):
    """A banded graph whose node ids have been scrambled (file-order
    simulation): structure is local, labels are not."""
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    scramble = rng.permutation(n)
    return scramble[src], scramble[dst]


def test_rcm_restores_bandedness():
    n, tile = 1024, 32
    src, dst = shuffled_local_graph(n, deg=6, reach=40)
    span0 = source_span_tiles(src, dst, n, tile)
    assert span0 > 16  # scrambled: effectively full-width

    perm = rcm_order(src, dst, n)
    s2, d2 = relabel_edges(src, dst, perm)
    span1 = source_span_tiles(s2, d2, n, tile)
    assert span1 <= 8, span1  # RCM recovers a tight band


def test_cuthill_mckee_is_valid_permutation_and_matches_scipy_quality():
    n = 512
    src, dst = shuffled_local_graph(n, deg=5, reach=30, seed=3)
    perm = cuthill_mckee(src, dst, n)
    assert sorted(perm.tolist()) == list(range(n))

    # quality parity with scipy's C implementation (not exact order —
    # tie-breaking differs — but the achieved bandwidth must be comparable)
    sp = pytest.importorskip("scipy.sparse")
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n)).tocsr()
    perm_sp = np.asarray(reverse_cuthill_mckee(m, symmetric_mode=False), np.int64)

    def bandwidth(perm):
        s2, d2 = relabel_edges(src, dst, perm)
        return int(np.abs(s2 - d2).max())

    ours, theirs = bandwidth(rcm_order(src, dst, n)), bandwidth(perm_sp)
    assert ours <= max(theirs * 1.5, theirs + 32), (ours, theirs)


def test_rcm_handles_disconnected_and_isolated():
    # two components + isolated nodes
    src = np.array([0, 1, 5, 6], np.int64)
    dst = np.array([1, 2, 6, 7], np.int64)
    perm = cuthill_mckee(src, dst, 10)
    assert sorted(perm.tolist()) == list(range(10))


def test_hilbert_order_bands_spatial_graph():
    n, tile = 2048, 32
    rng = np.random.default_rng(7)
    coords = rng.uniform(0, 100, (n, 2))
    # radius graph on random points, ids in random (file) order
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    pairs = tree.query_pairs(3.0, output_type="ndarray")
    src = np.concatenate([pairs[:, 0], pairs[:, 1]]).astype(np.int64)
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]]).astype(np.int64)

    perm = hilbert_order(coords)
    s2, d2 = relabel_edges(src, dst, perm)
    assert sorted(perm.tolist()) == list(range(n))
    assert source_span_tiles(s2, d2, n, tile) < source_span_tiles(src, dst, n, tile)


def test_aggregation_parity_through_permutation():
    """mean-aggregate in reordered space == reorder(mean-aggregate in
    original space): the end-to-end correctness contract for callers."""
    n, d = 768, 16
    src, dst = shuffled_local_graph(n, deg=4, reach=24, seed=11)
    rng = np.random.default_rng(13)
    x = rng.standard_normal((n, d)).astype(np.float32)

    out = prepare_auto_mean_aggregate(src, dst, n, tile=32, reorder=True)
    fwd, rev, n_pad, perm = out
    assert perm is not None
    assert isinstance(fwd, BandedBlocks)  # landed on the banded tier

    inv = invert_perm(perm)
    xp = np.zeros((n_pad, d), np.float32)
    xp[:n] = x[perm]
    agg_p = spmm_banded_apply(jnp.asarray(xp), jax.tree.map(jnp.asarray, fwd),
                              jax.tree.map(jnp.asarray, rev), False)
    agg_new = np.asarray(agg_p)[:n]

    w = mean_weights(dst, n)
    agg_ref = np.asarray(spmm_xla(jnp.asarray(x), jnp.asarray(src),
                                  jnp.asarray(dst), jnp.asarray(w), n))
    np.testing.assert_allclose(agg_new[inv], agg_ref, rtol=1e-5, atol=1e-5)


def test_auto_reorder_identity_when_already_banded():
    n = 512
    dst = np.repeat(np.arange(n, dtype=np.int64), 4)
    rng = np.random.default_rng(17)
    src = np.clip(dst + rng.integers(-16, 17, len(dst)), 0, n - 1)
    fwd, rev, n_pad, perm = prepare_auto_mean_aggregate(
        src, dst, n, tile=32, reorder=True)
    assert perm is None  # already banded: no permutation applied
    assert isinstance(fwd, BandedBlocks)


def test_reorder_for_banding_raises_on_expander():
    """A random (expander-like) graph is not bandable — explicit failure,
    callers fall to the dense/hybrid tiers."""
    n = 1024
    rng = np.random.default_rng(19)
    src = rng.integers(0, n, 8 * n)
    dst = rng.integers(0, n, 8 * n)
    with pytest.raises(ValueError, match="not bandable"):
        reorder_for_banding(src, dst, n, tile=32, max_span=4)


def test_hilbert_resolution_no_tie_scramble():
    """Grid resolution regression (round 4): with the 24-bit default, a
    scrambled 1-D coordinate stream recovers the EXACT spatial sort —
    under-resolved grids (16-bit at this density) leave multi-node cells
    whose ties keep scrambled input order and inflate the banded span
    (measured s_common 7/10/16 at 100/200/500M edges)."""
    import numpy as np

    from sldm_gnn_tpu.graph.reorder import StreamingHilbert

    n = 200_000
    rng = np.random.default_rng(3)
    scramble = rng.permutation(n)
    xy = np.stack([np.arange(n, dtype=np.float64), np.zeros(n)], axis=1)

    def order_at(bits):
        sh = StreamingHilbert(n, bits=bits)
        sh.observe_bounds(xy)
        for s in range(0, n, 50_000):
            sh.add_keys(scramble[s:s + 50_000], xy[s:s + 50_000])
        return sh.order()

    perm = order_at(24)  # default resolution
    # perm[new] = old file id; the file id at spatial position p is
    # scramble[p], so an exact spatial sort means perm == scramble
    np.testing.assert_array_equal(perm, scramble)

    coarse = order_at(16)  # negative control: ties scramble locally
    assert not np.array_equal(coarse, scramble)
