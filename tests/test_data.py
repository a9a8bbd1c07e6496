"""Dataset, stats, transforms and loader tests."""

import numpy as np
import pytest

from sldm_gnn_tpu.build.vehicle import GraphsBuilder
from sldm_gnn_tpu.data.dataset import GraphDataset, compute_mu_sigma
from sldm_gnn_tpu.data.loader import GraphLoader
from sldm_gnn_tpu.data.transforms import AddNoise, Compose, CutFrames, RemoveDimsFeatures
from sldm_gnn_tpu.data.synthetic import make_vehicle_split
from sldm_gnn_tpu.utils.metadata import MetaData


@pytest.fixture(scope="module")
def built_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    split = make_vehicle_split(root / "train", n_packs=8, frames_num=10, max_vehicles=5, seed=11)
    GraphsBuilder(split, frames_num=10, m_radius=30.0, active_labels=[0, 1]).save()
    return split / ".graphs"


def naive_mu_sigma(graphs):
    """Per-vehicle streaming stats as in the reference (dataset.py:107-149)."""
    nfeats = graphs[0].x.shape[2] - 1
    sum_x = np.zeros(nfeats)
    sum_x2 = np.zeros(nfeats)
    tot = 0
    sum_d = np.zeros(2)
    sum_d2 = np.zeros(2)
    vcnt = 0
    for g in graphs:
        for vi in range(g.x.shape[0]):
            gv = g.x[vi]
            pm = gv[:, -1] > 0.5
            gvp = gv[pm][:, :-1]
            sum_x += gvp.sum(0)
            sum_x2 += (gvp**2).sum(0)
            tot += pm.sum()
        sum_d += g.xdims.sum(0)
        sum_d2 += (g.xdims**2).sum(0)
        vcnt += g.xdims.shape[0]
    mu_x = sum_x / tot
    sig_x = np.clip(np.sqrt(sum_x2 / tot - mu_x**2), 1e-8, None)
    mu_d = sum_d / vcnt
    sig_d = np.sqrt(sum_d2 / vcnt - mu_d**2)
    return mu_x, sig_x, mu_d, sig_d


def test_mu_sigma_matches_naive(built_split):
    ds = GraphDataset(built_split, normalize_zscore=False)
    graphs = [ds.get_raw(i) for i in range(len(ds))]
    mu, sigma = compute_mu_sigma(graphs)
    mu_x, sig_x, mu_d, sig_d = naive_mu_sigma(graphs)
    np.testing.assert_allclose(mu["x"].ravel(), mu_x, rtol=1e-4)
    np.testing.assert_allclose(sigma["x"].ravel(), sig_x, rtol=1e-3)
    np.testing.assert_allclose(mu["xdims"].ravel(), mu_d, rtol=1e-4)
    np.testing.assert_allclose(sigma["xdims"].ravel(), sig_d, rtol=1e-3)


def test_normalization_and_pos_raw(built_split):
    ds = GraphDataset(built_split, normalize_zscore=True)
    raw = ds.get_raw(0)
    g = ds.get(0)
    # pos_raw preserves pre-normalization XY
    np.testing.assert_allclose(g.pos_raw, raw.x[:, :, :2])
    # normalized features: (raw - mu)/sigma on channels :-1
    expect = (raw.x[:, :, :-1] - ds.mu["x"]) / ds.sigma["x"]
    np.testing.assert_allclose(g.x[:, :, :-1], expect, rtol=1e-5)
    # presence channel untouched
    np.testing.assert_array_equal(g.x[:, :, -1], raw.x[:, :, -1])
    # raw-data context disables everything
    with ds.using_raw_data():
        g2 = ds.get(0)
        np.testing.assert_array_equal(g2.x, raw.x)


def test_get_raw_by_pid(built_split):
    ds = GraphDataset(built_split, normalize_zscore=False)
    pid = ds.pack_ids[2]
    g = ds.get_raw_by_pid(pid)
    np.testing.assert_array_equal(g.x, ds.get_raw(2).x)
    with pytest.raises(FileNotFoundError):
        ds.get_raw_by_pid(999999)


def test_transforms(built_split):
    md = MetaData.load_json(built_split / "metadata.json")
    ds = GraphDataset(built_split, normalize_zscore=False)
    g = ds.get_raw(0)
    rng = np.random.default_rng(0)

    noisy = AddNoise("pos", 0.5, md)(g, rng)
    assert not np.allclose(noisy.x[:, :, :2], g.x[:, :, :2])
    np.testing.assert_array_equal(noisy.x[:, :, 2:], g.x[:, :, 2:])

    prop = AddNoise("pos", 0.5, md, prop_to_speed=True)(g, rng)
    assert prop.x.shape == g.x.shape

    cut = CutFrames(4)(g)
    assert cut.x.shape[1] == 4

    nod = RemoveDimsFeatures(md)(g)
    np.testing.assert_array_equal(nod.xdims, 0)

    comp = Compose([AddNoise("pos", 0.1, md), CutFrames(5)])
    assert comp.stochastic
    out = comp(g, rng)
    assert out.x.shape[1] == 5


def test_loader_shapes_and_masks(built_split):
    ds = GraphDataset(built_split, normalize_zscore=True)
    loader = GraphLoader(ds, batch_size=3, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == (len(ds) + 2) // 3
    shapes = {(b.x.shape, b.edge_src.shape, b.y.shape) for b in batches}
    assert len(shapes) == 1  # static shapes across the epoch
    total = sum(int(b.graph_mask.sum()) for b in batches)
    assert total == len(ds)
    # final partial batch is mask-padded
    last = batches[-1]
    assert last.graph_mask.sum() == len(ds) % 3 or len(ds) % 3 == 0


def test_loader_with_cut_frames(built_split):
    md = MetaData.load_json(built_split / "metadata.json")
    ds = GraphDataset(built_split, transform=CutFrames(6), normalize_zscore=True)
    loader = GraphLoader(ds, batch_size=4)
    b = next(iter(loader))
    assert b.x.shape[1] == 6
    assert b.pos_raw.shape[1] == 6


def test_bucketed_loader(built_split):
    ds = GraphDataset(built_split, normalize_zscore=True)
    single = GraphLoader(ds, batch_size=3)
    bucketed = GraphLoader(ds, batch_size=3, shuffle=True, buckets=2, seed=3)

    batches = list(bucketed)
    # every graph appears exactly once
    assert sum(int(b.graph_mask.sum()) for b in batches) == len(ds)
    # at most 2 distinct shapes, padding never exceeds the single-bucket cap
    shapes = {b.x.shape for b in batches}
    assert len(shapes) <= 2
    assert max(s[0] for s in shapes) <= single.dims.node_capacity
    # padding waste is reduced (or equal) vs the single capacity
    single_padding = sum(
        single.dims.node_capacity - int(b.node_mask.sum()) for b in list(single)
    )
    bucket_padding = sum(b.x.shape[0] - int(b.node_mask.sum()) for b in batches)
    assert bucket_padding <= single_padding


def test_prefetcher():
    from sldm_gnn_tpu.data.prefetch import prefetch

    assert list(prefetch(range(7), depth=2)) == list(range(7))
    assert list(prefetch([], depth=2)) == []

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_prefetcher_abandoned_iteration_stops_worker():
    import threading
    from sldm_gnn_tpu.data.prefetch import Prefetcher

    before = threading.active_count()
    pf = Prefetcher(iter(range(1000)), depth=2)
    it = iter(pf)
    assert next(it) == 0
    it.close()  # abandon mid-stream (as a consumer exception would)
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()


def test_loader_dense_adj_batches(built_split):
    """dense_adj=True yields aligned batches (node capacity = G*vmax,
    static per bucket) whose adjacency reproduces the flat segment
    aggregation exactly."""
    import jax.numpy as jnp

    from sldm_gnn_tpu.ops.segment import masked_mean_aggregate

    rng = np.random.default_rng(0)
    ds = GraphDataset(built_split, normalize_zscore=True)
    loader = GraphLoader(ds, batch_size=3, dense_adj=True)
    shapes = set()
    for batch in loader:
        assert batch.adj is not None
        g, vmax, _ = batch.adj.shape
        assert batch.node_capacity == g * vmax
        shapes.add(batch.x.shape)
        x = jnp.asarray(rng.standard_normal(
            (batch.node_capacity, 4)).astype(np.float32))
        ref = masked_mean_aggregate(
            x, jnp.asarray(batch.edge_src), jnp.asarray(batch.edge_dst),
            jnp.asarray(batch.edge_mask), batch.node_capacity)
        got = jnp.einsum("gij,gjh->gih", jnp.asarray(batch.adj),
                         x.reshape(g, vmax, -1)).reshape(ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    assert len(shapes) == 1  # one bucket -> one static shape
