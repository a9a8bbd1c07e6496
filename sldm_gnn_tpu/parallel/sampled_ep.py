"""Neighbor sampling from an ep-SHARDED CSR (config 3 x config 5).

``train/sampled_loop.device_sample_tree`` keeps the whole CSR + feature
table on every device — fine to the single-chip HBM boundary (E~64M,
BASELINE.md) and no further. This module composes the same fanout-tree
semantics with the edge-partitioned storage the halo path already uses:
nodes are range-partitioned over the ``ep`` mesh axis (shard q owns rows
``[q*n_local, (q+1)*n_local)``), each device holds ONLY its shard of the
CSR and feature table, and each hop exchanges (id, random-draw) requests
to the owning shard over ``jax.lax.all_to_all`` — the sampling sibling of
the halo feature exchange (parallel/halo.py).

Exact-parity contract: for the same seeds and key, the sharded tree is
ARRAY-IDENTICAL to ``device_sample_tree`` on the replicated CSR in every
mode (``uniform`` / ``uniform_norep`` / ``first``) — the requester draws
the random integers with the replicated sampler's exact key discipline
and ships them with the ids, so the owner applies the same modulo /
Floyd-duplicate logic to the same values (tests/test_sampled_ep.py).

Per-hop collective volume: each device sends/receives ``ep * P * (f+1)``
int32 (worst-case binning capacity P = its level size) plus the feature
exchange ``ep * P * D`` floats per level. When the graph fits one chip,
the replicated sampler ships nothing and stays the better choice; this
path exists for graphs whose CSR + features cannot be replicated
(north-star config 5, BASELINE.json configs[2]+[4]).

Reference anchor: the role of PyG's NeighborLoader
(/root/reference/install_dependencies.sh:10) at scales the reference
never reaches.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..models.sampled_sage import SampledSage


def shard_csr(indptr: np.ndarray, nbr: np.ndarray, deg: np.ndarray,
              ep: int):
    """Range-partition a CSR over ``ep`` shards (host-side, numpy).

    Returns ``(indptr_s [ep, n_local+1], nbr_s [ep, e_max], deg_s
    [ep, n_local], n_local)`` — per-shard indptr is rebased to the local
    edge offset; node count pads to a multiple of ep with 0-degree rows;
    per-shard edge arrays pad to the max shard size (gathers are clamped,
    padded slots are never selected because their rows have degree 0).
    """
    n = len(deg)
    n_local = -(-n // ep)
    n_pad = n_local * ep
    indptr = np.asarray(indptr, np.int64)
    deg_p = np.zeros(n_pad, np.int32)
    deg_p[:n] = np.asarray(deg, np.int32)

    spans = []
    for q in range(ep):
        lo = indptr[min(q * n_local, n)]
        hi = indptr[min((q + 1) * n_local, n)]
        spans.append((int(lo), int(hi)))
    e_max = max(hi - lo for lo, hi in spans) or 1

    indptr_s = np.zeros((ep, n_local + 1), np.int32)
    nbr_s = np.zeros((ep, e_max), np.int32)
    deg_s = deg_p.reshape(ep, n_local)
    for q, (lo, hi) in enumerate(spans):
        row_lo = q * n_local
        row_hi = min((q + 1) * n_local, n)
        local = indptr[row_lo:row_hi + 1] - lo
        indptr_s[q, : len(local)] = local
        indptr_s[q, len(local):] = local[-1] if len(local) else 0
        nbr_s[q, : hi - lo] = np.asarray(nbr[lo:hi], np.int32)
    return indptr_s, nbr_s, deg_s, n_local


def _route(ids: jax.Array, ep: int, n_local: int):
    """Bin ``ids [P]`` by owning shard into a ``[ep, P]`` send buffer.

    Returns ``(send, owner_s, slot_s, order)``; the requester later reads
    reply slot ``(owner_s[i], slot_s[i])`` for sorted position i and
    inverts ``order`` — padded slots (never written) are never read, so
    no mask needs to travel."""
    p = ids.shape[0]
    owner = jnp.clip(ids // n_local, 0, ep - 1)
    order = jnp.argsort(owner, stable=True)
    ids_s = ids[order]
    owner_s = owner[order]
    counts = jnp.zeros(ep, jnp.int32).at[owner].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    slot_s = jnp.arange(p, dtype=jnp.int32) - offsets[owner_s]
    send = jnp.zeros((ep, p), ids.dtype).at[owner_s, slot_s].set(ids_s)
    return send, owner_s, slot_s, order


def _unroute(resp, owner_s, slot_s, order):
    """Invert :func:`_route`: pick each request's reply and restore the
    original order. ``resp [ep, P, ...]`` -> ``[P, ...]``."""
    picked = resp[owner_s, slot_s]
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return picked[inv]


def _a2a(x, axis_name):
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0)


def exchange_gather(table_l: jax.Array, ids: jax.Array, *, n_local: int,
                    ep: int, axis_name: str = "ep") -> jax.Array:
    """Inside shard_map: fetch rows ``ids [P]`` (GLOBAL node ids) from the
    shard-local tables ``table_l [n_local, D]`` across the mesh. The
    sampling sibling of the halo exchange: route ids to owners, owners
    gather their rows, replies ride the transpose all_to_all."""
    send, owner_s, slot_s, order = _route(ids, ep, n_local)
    req = _a2a(send, axis_name)                      # [ep, P] ids for me
    q = jax.lax.axis_index(axis_name)
    rows = jnp.clip(req - q * n_local, 0, n_local - 1)
    resp = table_l[rows]                             # [ep, P, D]
    back = _a2a(resp, axis_name)                     # [ep, P, D] my replies
    return _unroute(back, owner_s, slot_s, order)


def _draw_like_replicated(key, p: int, f: int, mode: str):
    """The replicated sampler's random draws, value-for-value
    (train/sampled_loop.device_sample_tree): the ints are drawn HERE on
    the requesting device and shipped, so the owning shard applies the
    same modulo / duplicate-probe logic to the same values."""
    ii32 = jnp.iinfo(jnp.int32).max
    if mode == "uniform":
        return jax.random.randint(key, (p, f), 0, ii32)
    if mode == "uniform_norep":
        subs = jax.random.split(key, f)
        return jnp.stack(
            [jax.random.randint(subs[j], (p,), 0, ii32) for j in range(f)],
            axis=1)
    if mode == "first":
        return jnp.zeros((p, f), jnp.int32)
    raise ValueError(f"unknown sampling mode: {mode}")


def _owner_sample(req_ids, req_u, indptr_l, nbr_l, deg_l, *, q, n_local,
                  f: int, mode: str):
    """Owner-side slot selection + neighbor gather for received requests
    ``req_ids [ep, C]`` with draws ``req_u [ep, C, f]``. Returns
    ``(child [ep, C, f], d [ep, C])``. Mirrors device_sample_tree's
    per-mode logic exactly (same modulo, same Floyd duplicate probes)."""
    rows = jnp.clip(req_ids - q * n_local, 0, n_local - 1)
    d = deg_l[rows]                                   # [ep, C]
    ar = jnp.arange(f, dtype=jnp.int32)
    if mode == "uniform":
        slot = req_u % jnp.maximum(d, 1)[..., None]
    elif mode == "uniform_norep":
        picks = jnp.zeros(req_u.shape, jnp.int32)
        for j in range(f):
            jj = d - f + j
            t = req_u[..., j] % jnp.maximum(jj + 1, 1)
            if j:
                dup = (picks[..., :j] == t[..., None]).any(axis=-1)
                t = jnp.where(dup, jj, t)
            picks = picks.at[..., j].set(t)
        firstd = jnp.minimum(ar, jnp.maximum(d - 1, 0)[..., None])
        slot = jnp.where(d[..., None] > f, picks, firstd)
    elif mode == "first":
        slot = jnp.minimum(ar, jnp.maximum(d - 1, 0)[..., None])
    else:
        raise ValueError(f"unknown sampling mode: {mode}")
    eidx = jnp.clip(indptr_l[rows][..., None] + slot, 0,
                    nbr_l.shape[0] - 1)
    return nbr_l[eidx], d


def device_sample_tree_ep(seeds, indptr_l, nbr_l, deg_l, fanouts, key, *,
                          n_local: int, ep: int, axis_name: str = "ep",
                          mode: str = "uniform"):
    """Inside shard_map: the fanout tree of ``device_sample_tree``, sampled
    from the ep-sharded CSR via per-hop id exchange (module docstring).
    ``indptr_l/nbr_l/deg_l`` are THIS shard's arrays ([n_local+1], [E_q],
    [n_local]); ``seeds [B]`` are this device's own seed batch (global
    ids). Returns ``(levels, masks)`` with the replicated sampler's exact
    values."""
    q = jax.lax.axis_index(axis_name)
    levels = [seeds.astype(jnp.int32)]
    masks = [jnp.ones(seeds.shape[0], bool)]
    for f in fanouts:
        key, sub = jax.random.split(key)
        parents = levels[-1]
        pmask = masks[-1]
        p = parents.shape[0]
        u = _draw_like_replicated(sub, p, f, mode)

        send_ids, owner_s, slot_s, order = _route(parents, ep, n_local)
        send_u = jnp.zeros((ep, p, f), u.dtype).at[owner_s, slot_s].set(
            u[order])
        req_ids = _a2a(send_ids, axis_name)
        req_u = _a2a(send_u, axis_name)
        child_o, d_o = _owner_sample(
            req_ids, req_u, indptr_l, nbr_l, deg_l, q=q, n_local=n_local,
            f=f, mode=mode)
        child = _unroute(_a2a(child_o, axis_name), owner_s, slot_s, order)
        d = _unroute(_a2a(d_o, axis_name), owner_s, slot_s, order)

        ar = jnp.arange(f, dtype=jnp.int32)
        if mode == "uniform_norep":
            cvalid = ar[None, :] < d[:, None]
        else:
            cvalid = (d > 0)[:, None] & jnp.ones((1, f), bool)
        child = jnp.where(cvalid, child, parents[:, None])
        levels.append(child.reshape(-1))
        masks.append((pmask[:, None] & cvalid).reshape(-1))
    return tuple(levels), tuple(masks)


def make_ep_sampled_step_fns(
    model: SampledSage,
    optimizer: optax.GradientTransformation,
    fanouts: Sequence[int],
    indptr_s: jax.Array,
    nbr_s: jax.Array,
    deg_s: jax.Array,
    x_s: jax.Array,
    y_s: jax.Array,
    mesh,
    *,
    n_local: int,
    mode: str = "uniform",
    axis_name: str = "ep",
):
    """Sampled training where NOTHING graph-sized is replicated: CSR
    shards, feature shards, and label shards all live ep-partitioned
    (``[ep, n_local(+1), ...]`` stacked, ``P(axis_name)`` sharded); each
    device trains its own seed sub-batch against them. Params replicate;
    grads psum via shard_map AD. The rng fold matches
    ``make_dp_device_sampled_step_fns`` so the two paths produce the same
    losses for the same seeds (parity-tested).

    ``train_step(state, seeds[ep, B/ep], rng) -> (state, (loss, n_edges))``
    — labels are looked up shard-side from ``y_s`` via the same exchange
    as features. ``eval_step(params, seeds) -> hits [ep, B/ep]``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    fanouts = tuple(fanouts)
    ep = mesh.shape[axis_name]

    def _tree_and_feats(seeds, ip, nb, dg, x_l, srng, tree_mode):
        levels, masks = device_sample_tree_ep(
            seeds, ip, nb, dg, fanouts, srng, n_local=n_local, ep=ep,
            axis_name=axis_name, mode=tree_mode)
        feats = [exchange_gather(x_l, l, n_local=n_local, ep=ep,
                                 axis_name=axis_name) for l in levels]
        return levels, masks, feats

    def local_loss(params, seeds, ip, nb, dg, x_l, y_l, rng):
        idx = jax.lax.axis_index(axis_name)
        srng, drng = jax.random.split(jax.random.fold_in(rng, idx))
        levels, masks, feats = _tree_and_feats(seeds, ip, nb, dg, x_l,
                                               srng, mode)
        y = exchange_gather(y_l[:, None], seeds.astype(jnp.int32),
                            n_local=n_local, ep=ep,
                            axis_name=axis_name)[:, 0]
        logits = model.apply({"params": params}, feats, masks, fanouts,
                             train=True, rngs={"dropout": drng})
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        n_e = sum(m.sum(dtype=jnp.int32) for m in masks[1:])
        return (jax.lax.pmean(loss, axis_name),
                jax.lax.psum(n_e, axis_name))

    def sharded_loss(params, seeds_stack, ip, nb, dg, x_st, y_st, rng):
        return local_loss(params, seeds_stack[0], ip[0], nb[0], dg[0],
                          x_st[0], y_st[0], rng)

    loss_sm = shard_map(
        sharded_loss, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()))

    @jax.jit
    def train_step(state, seeds_stack, rng):
        (loss, n_e), grads = jax.value_and_grad(
            lambda p: loss_sm(p, seeds_stack, indptr_s, nbr_s, deg_s,
                              x_s, y_s, rng), has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), (loss, n_e)

    def eval_body(params, seeds_stack, ip, nb, dg, x_st, y_st):
        seeds = seeds_stack[0]
        # eval always uses the key-free deterministic "first" tree,
        # matching make_dp_device_sampled_step_fns
        levels, masks, feats = _tree_and_feats(
            seeds, ip[0], nb[0], dg[0], x_st[0], jax.random.PRNGKey(0),
            "first")
        y = exchange_gather(y_st[0][:, None], seeds.astype(jnp.int32),
                            n_local=n_local, ep=ep,
                            axis_name=axis_name)[:, 0]
        logits = model.apply({"params": params}, feats, masks, fanouts)
        return (jnp.argmax(logits, axis=1) == y)[None]

    eval_sm = shard_map(
        eval_body, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name))

    @jax.jit
    def eval_step(params, seeds_stack):
        return eval_sm(params, seeds_stack, indptr_s, nbr_s, deg_s,
                       x_s, y_s)

    def init(rng, per_shard_batch: int):
        d = x_s.shape[-1]
        sizes = [per_shard_batch]
        for f in fanouts:
            sizes.append(sizes[-1] * f)
        feats = [jnp.zeros((s, d), x_s.dtype) for s in sizes]
        masks = [jnp.ones(s, bool) for s in sizes]
        params = model.init(rng, feats, masks, fanouts)["params"]
        state = train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optimizer)
        return jax.device_put(state, NamedSharding(mesh, P()))

    return train_step, eval_step, init
