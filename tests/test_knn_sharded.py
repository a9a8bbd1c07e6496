"""Segment-sharded KNN / map attention (ops/knn.knn_topk_sharded,
MapSpatialAttention(segment_axis=...)): bit-for-bit parity with the dense
path on the 8-device virtual CPU mesh, including embedding gathers and the
tie-breaking rule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sldm_gnn_tpu.models.map_modules import MapSpatialAttention
from sldm_gnn_tpu.ops.knn import knn_topk, knn_topk_sharded
from sldm_gnn_tpu.parallel.mesh import make_mesh


def _setup(rng, v=37, s=256, d=12):
    points = rng.standard_normal((v, 2)).astype(np.float32) * 50
    centroids = rng.standard_normal((s, 2)).astype(np.float32) * 50
    emb = rng.standard_normal((s, d)).astype(np.float32)
    return jnp.asarray(points), jnp.asarray(centroids), jnp.asarray(emb)


def test_sharded_knn_matches_dense(rng):
    k = 5
    points, centroids, emb = _setup(rng)
    mesh = make_mesh(ep=8)

    want_d, want_i = knn_topk(points, centroids, k)
    want_g = emb[want_i]

    @jax.jit
    def run(points, centroids, emb):
        f = shard_map(
            lambda p, c, e: knn_topk_sharded(p, c, k, "ep", e),
            mesh=mesh,
            in_specs=(P(), P("ep"), P("ep")),
            out_specs=(P(), P(), (P(),)),
        )
        return f(points, centroids, emb)

    got_d, got_i, (got_g,) = run(points, centroids, emb)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))


def test_sharded_knn_tie_breaking(rng):
    """Duplicate centroids across shard boundaries: the merge must keep the
    dense rule (lowest global index wins ties)."""
    k = 4
    v, s = 9, 64
    points = jnp.zeros((v, 2))
    base = rng.standard_normal((s, 2)).astype(np.float32)
    base[40] = base[8]  # exact duplicates in different shards (8 per shard)
    base[57] = base[8]
    base[17] = base[3]
    centroids = jnp.asarray(base)
    mesh = make_mesh(ep=8)

    want_d, want_i = knn_topk(points, centroids, k)

    @jax.jit
    def run(points, centroids):
        f = shard_map(
            lambda p, c: knn_topk_sharded(p, c, k, "ep")[:2],
            mesh=mesh, in_specs=(P(), P("ep")), out_specs=(P(), P()),
        )
        return f(points, centroids)

    got_d, got_i = run(points, centroids)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_map_attention_sharded_matches_dense(rng):
    k = 5
    points, centroids, emb = _setup(rng, v=23, s=128, d=8)
    dense = MapSpatialAttention(k_neighbors=k)
    sharded = MapSpatialAttention(k_neighbors=k, segment_axis="ep")
    params = dense.init(jax.random.PRNGKey(0), points, centroids, emb)
    mesh = make_mesh(ep=8)

    want = np.asarray(dense.apply(params, points, centroids, emb))

    @jax.jit
    def run(points, centroids, emb):
        f = shard_map(
            lambda p, c, e: sharded.apply(params, p, c, e),
            mesh=mesh, in_specs=(P(), P("ep"), P("ep")), out_specs=P(),
        )
        return f(points, centroids, emb)

    got = np.asarray(run(points, centroids, emb))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_map_attention_sharded_grads(rng):
    """AD through the sharded attention (collective transposes) matches the
    dense gradient — the training-path requirement."""
    k = 3
    points, centroids, emb = _setup(rng, v=11, s=64, d=6)
    dense = MapSpatialAttention(k_neighbors=k)
    sharded = MapSpatialAttention(k_neighbors=k, segment_axis="ep")
    params = dense.init(jax.random.PRNGKey(0), points, centroids, emb)
    mesh = make_mesh(ep=8)

    g_want = jax.grad(
        lambda p: jnp.sum(dense.apply(p, points, centroids, emb) ** 2))(params)

    @jax.jit
    def loss(params, points, centroids, emb):
        f = shard_map(
            lambda p, c, e: sharded.apply(params, p, c, e),
            mesh=mesh, in_specs=(P(), P("ep"), P("ep")), out_specs=P(),
        )
        return jnp.sum(f(points, centroids, emb) ** 2)

    g_got = jax.grad(loss)(params, points, centroids, emb)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_got, g_want)


def test_sharded_knn_pallas_impl_matches_dense(rng):
    """impl='pallas' (fused local selection under the interpreter on CPU)
    reproduces the dense result through the same k-way merge."""
    k = 5
    points, centroids, emb = _setup(rng)
    mesh = make_mesh(ep=8)

    want_d, want_i = knn_topk(points, centroids, k)
    want_g = emb[want_i]

    @jax.jit
    def run(points, centroids, emb):
        f = shard_map(
            lambda p, c, e: knn_topk_sharded(p, c, k, "ep", e, impl="pallas"),
            mesh=mesh,
            in_specs=(P(), P("ep"), P("ep")),
            out_specs=(P(), P(), (P(),)),
        )
        return f(points, centroids, emb)

    got_d, got_i, (got_g,) = run(points, centroids, emb)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))


def test_dp_sharded_points_knn_pallas(rng):
    """knn_impl='pallas' under a dp mesh (points dp-sharded, centroids +
    embeddings replicated): the kernel wrapper lifts the mixed-vma
    operands itself; per-shard results concatenate to the replicated
    MapSpatialAttention output."""
    from sldm_gnn_tpu.models.map_modules import MapSpatialAttention

    k = 5
    v, s, d = 64, 120, 8
    points = jnp.asarray(rng.standard_normal((v, 2)).astype(np.float32) * 10)
    centroids = jnp.asarray(rng.standard_normal((s, 2)).astype(np.float32) * 10)
    emb = jnp.asarray(rng.standard_normal((s, d)).astype(np.float32))
    mesh = make_mesh(dp=8)

    mod = MapSpatialAttention(k_neighbors=k, knn_impl="pallas")
    params = mod.init(jax.random.PRNGKey(0), points, centroids, emb)
    want = mod.apply(params, points, centroids, emb)

    @jax.jit
    def run(points, centroids, emb):
        f = shard_map(
            lambda p, c, e: mod.apply(params, p, c, e),
            mesh=mesh, in_specs=(P("dp"), P(), P()), out_specs=P("dp"))
        return f(points, centroids, emb)

    got = run(points, centroids, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
