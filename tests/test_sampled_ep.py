"""Sampling from an ep-sharded CSR (parallel/sampled_ep.py): the sharded
fanout tree must be ARRAY-IDENTICAL to the replicated device sampler in
every mode, the feature exchange must equal a plain gather, and the
ep-sharded train step must reproduce the dp-replicated step's losses."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sldm_gnn_tpu.models.sampled_sage import SampledSage
from sldm_gnn_tpu.parallel.sampled_ep import (
    _route,
    _unroute,
    device_sample_tree_ep,
    exchange_gather,
    make_ep_sampled_step_fns,
    shard_csr,
)
from sldm_gnn_tpu.train.sampled_loop import (
    device_sample_tree,
    make_dp_device_sampled_step_fns,
)

EP = 8


def _csr(rng, n=256, deg_max=6):
    """Random in-neighbor CSR (data/sampler.py layout: neighbors grouped
    by destination row)."""
    deg = rng.integers(0, deg_max + 1, n).astype(np.int32)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum(deg)
    nbr = rng.integers(0, n, int(indptr[-1])).astype(np.int32)
    return indptr, nbr, deg


def _ep_mesh():
    devs = np.array(jax.devices()[:EP]).reshape(EP)
    return Mesh(devs, ("ep",))


def test_route_unroute_roundtrip(rng):
    ids = jnp.asarray(rng.integers(0, 256, 40).astype(np.int32))
    send, owner_s, slot_s, order = jax.jit(
        lambda i: _route(i, EP, 32))(ids)
    # identity "exchange": owner echoes the id back in place
    got = _unroute(send, owner_s, slot_s, order)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ids))


def test_exchange_gather_matches_plain(rng):
    n, d = 256, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.integers(0, n, 37).astype(np.int32)
    mesh = _ep_mesh()
    n_local = n // EP
    x_s = jnp.asarray(x.reshape(EP, n_local, d))

    def body(x_st, ids):
        return exchange_gather(x_st[0], ids, n_local=n_local, ep=EP)[None]

    got = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P("ep"), P()), out_specs=P("ep")))(
            jax.device_put(x_s, NamedSharding(mesh, P("ep"))),
            jnp.asarray(ids))
    for q in range(EP):
        np.testing.assert_array_equal(np.asarray(got[q]), x[ids])


@pytest.mark.parametrize("mode", ["uniform", "uniform_norep", "first"])
def test_tree_parity_vs_replicated(rng, mode):
    n, b = 256, 6
    fanouts = (3, 2)
    indptr, nbr, deg = _csr(rng, n)
    ips, nbs, dgs, n_local = shard_csr(indptr, nbr, deg, EP)
    seeds = rng.integers(0, n, (EP, b)).astype(np.int32)
    key = jax.random.PRNGKey(7)
    mesh = _ep_mesh()

    ip_r = jnp.asarray(indptr.astype(np.int32))
    nb_r = jnp.asarray(nbr)
    dg_r = jnp.asarray(deg)

    def body(seeds_st, ip, nb, dg):
        idx = jax.lax.axis_index("ep")
        levels, masks = device_sample_tree_ep(
            seeds_st[0], ip[0], nb[0], dg[0], fanouts,
            jax.random.fold_in(key, idx), n_local=n_local, ep=EP,
            mode=mode)
        return (tuple(l[None] for l in levels),
                tuple(m[None] for m in masks))

    put = lambda a: jax.device_put(jnp.asarray(a),
                                   NamedSharding(mesh, P("ep")))
    levels_s, masks_s = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P("ep"), P("ep"), P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep"))))(
            put(seeds), put(ips), put(nbs), put(dgs))

    for q in range(EP):
        ref_levels, ref_masks = device_sample_tree(
            jnp.asarray(seeds[q]), ip_r, nb_r, dg_r, fanouts,
            jax.random.fold_in(key, q), mode)
        for lvl, (ls, lr) in enumerate(zip(levels_s, ref_levels)):
            np.testing.assert_array_equal(
                np.asarray(ls[q]), np.asarray(lr),
                err_msg=f"shard {q} level {lvl} ({mode})")
        for lvl, (ms, mr) in enumerate(zip(masks_s, ref_masks)):
            np.testing.assert_array_equal(
                np.asarray(ms[q]), np.asarray(mr),
                err_msg=f"shard {q} mask {lvl} ({mode})")


@pytest.mark.parametrize("mode", ["uniform", "uniform_norep"])
def test_ep_step_matches_dp_replicated(rng, mode):
    """Same seeds + rng: the ep-sharded step (sharded CSR/features/labels)
    must produce the dp-replicated step's exact losses and eval hits."""
    n, b, d, ncls = 256, 4, 5, 3
    fanouts = (3, 2)
    indptr, nbr, deg = _csr(rng, n)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.integers(0, ncls, n).astype(np.int32)
    seeds = rng.integers(0, n, (EP, b)).astype(np.int32)

    model = SampledSage(hidden_dims=(8, 8), out_dim=ncls)
    opt = optax.adam(1e-2)

    # dp-replicated reference
    dp_mesh = Mesh(np.array(jax.devices()[:EP]).reshape(EP), ("dp",))
    tr_dp, ev_dp, init_dp = make_dp_device_sampled_step_fns(
        model, opt, fanouts, jnp.asarray(indptr.astype(np.int32)),
        jnp.asarray(nbr), jnp.asarray(deg), dp_mesh, mode=mode)
    y_by_seed = jnp.asarray(y)[jnp.asarray(seeds)]
    st = init_dp(jax.random.PRNGKey(0), jnp.asarray(x), b)
    dp_losses = []
    rng0 = jax.random.PRNGKey(5)
    for i in range(3):
        st, (loss, n_e) = tr_dp(st, jnp.asarray(x), jnp.asarray(seeds),
                                y_by_seed, jax.random.fold_in(rng0, i))
        dp_losses.append((float(loss), int(n_e)))
    dp_hits = np.asarray(ev_dp(st.params, jnp.asarray(x),
                               jnp.asarray(seeds), y_by_seed))

    # ep-sharded arm
    ips, nbs, dgs, n_local = shard_csr(indptr, nbr, deg, EP)
    mesh = _ep_mesh()
    sh = NamedSharding(mesh, P("ep"))
    x_s = jax.device_put(jnp.asarray(x.reshape(EP, n_local, d)), sh)
    y_s = jax.device_put(jnp.asarray(y.reshape(EP, n_local)), sh)
    tr_ep, ev_ep, init_ep = make_ep_sampled_step_fns(
        model, opt, fanouts, jax.device_put(jnp.asarray(ips), sh),
        jax.device_put(jnp.asarray(nbs), sh),
        jax.device_put(jnp.asarray(dgs), sh), x_s, y_s, mesh,
        n_local=n_local, mode=mode)
    st2 = init_ep(jax.random.PRNGKey(0), b)
    seeds_dev = jax.device_put(jnp.asarray(seeds), sh)
    for i in range(3):
        st2, (loss, n_e) = tr_ep(st2, seeds_dev,
                                 jax.random.fold_in(rng0, i))
        ref_loss, ref_ne = dp_losses[i]
        assert int(n_e) == ref_ne, i
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-6,
                                   err_msg=f"step {i}")
    ep_hits = np.asarray(ev_ep(st2.params, seeds_dev))
    np.testing.assert_array_equal(ep_hits, dp_hits)
