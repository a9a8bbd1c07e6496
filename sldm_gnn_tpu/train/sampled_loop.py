"""Neighbor-sampled mini-batch training driver (BASELINE config 3).

The PyG-NeighborLoader replacement, end to end: seed batches
(data/sampler.iterate_seed_batches) → host fanout sampling
(data/sampler.NeighborSampler, numpy) → jitted train step on
models/sampled_sage.SampledSage — with host sampling running in a
prefetch thread (data/prefetch.Prefetcher) so it overlaps device compute,
the TPU answer to the reference's torch_geometric NeighborLoader native
sampler (/root/reference/install_dependencies.sh:10, SURVEY.md §2.3).

TPU-first shape discipline: every batch has identical static shapes
(fixed batch size incl. the wrap-around tail, fixed fanout tree with
validity masks), so the step compiles ONCE. Node features stay
device-resident [N, D]; the step gathers each level's rows on device —
the host moves only the int32 id tree (~B·(1+f1+f1·f2) ids per batch),
not features.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..data.prefetch import Prefetcher
from ..data.sampler import NeighborSampler, SampledBatch, iterate_seed_batches
from ..models.sampled_sage import SampledSage
from .loop import make_optimizer


@dataclass
class SampledTrainResult:
    train_loss: np.ndarray  # [epochs]
    val_acc: np.ndarray  # [epochs]
    seeds_per_s: float  # steady-state training throughput (host+device)
    sampled_edges_per_s: float  # valid sampled tree edges per second


def _tree_arrays(batch: SampledBatch, labels: np.ndarray):
    """Device-ready (levels, masks, seed_labels) tuple for one batch."""
    levels = tuple(jnp.asarray(l) for l in batch.levels)
    masks = tuple(jnp.asarray(m) for m in batch.masks)
    y = jnp.asarray(labels[batch.levels[0]])
    return levels, masks, y


def make_sampled_step_fns(
    model: SampledSage,
    optimizer: optax.GradientTransformation,
    fanouts: Sequence[int],
):
    """Jitted train/eval steps over the sampled tree. The feature matrix
    ``x [N, D]`` is a traced argument (device-resident, donated nowhere);
    levels/masks are the per-batch id tree."""
    fanouts = tuple(fanouts)

    def gather(x, levels):
        return [x[l] for l in levels]

    def loss_fn(params, x, levels, masks, y, rng):
        logits = model.apply(
            {"params": params}, gather(x, levels), masks, fanouts,
            train=True, rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        return loss

    @jax.jit
    def train_step(state, x, levels, masks, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x, levels, masks, y, rng)
        return state.apply_gradients(grads=grads), loss

    @jax.jit
    def eval_step(params, x, levels, masks, y):
        """Per-seed hit vector (callers slice off wrap padding)."""
        logits = model.apply({"params": params}, gather(x, levels), masks, fanouts)
        return jnp.argmax(logits, axis=1) == y

    def init(rng, x, levels, masks):
        params = model.init(rng, gather(x, levels), masks, fanouts)["params"]
        return train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optimizer)

    return train_step, eval_step, init


def device_sample_tree(seeds, indptr, nbr, deg, fanouts, key,
                       mode: str = "uniform", *, nbr_table=None):
    """Fanout tree sampled ON DEVICE — the fully TPU-native config-3
    sampler: the CSR (indptr/nbr/deg, device-resident int32) turns each
    level into one gather, so a training step needs only the [B] seed ids
    from the host (4 KB/batch instead of the ~1.4 MB id tree the host
    sampler ships — the measured bound on remote-ingest setups,
    BASELINE.md round 3). Zero-degree slots keep the parent id and mask
    False. Modes mirror data/sampler.py:

    * ``uniform`` — per-slot uniform WITH replacement (negligible modulo
      bias: deg << 2^31);
    * ``uniform_norep`` — min(f, deg) DISTINCT neighbors per hop (PyG
      NeighborLoader default semantics) via Floyd's f-subset algorithm,
      unrolled over the static fanout with vectorized duplicate probes;
      slots >= deg masked;
    * ``first`` — deterministic first-k (reproducible eval, no key use).

    ``nbr_table`` (``[N, deg_cap+1]`` from :func:`dense_nbr_table`, deg
    in the last column) switches the child lookup from per-element
    lane-dynamic accesses (which XLA lowers to dynamic-slice LOOPS on
    TPU) to ONE row gather per level + a static unrolled vectorized
    compare-select — same children for the same draws (slot j of row p
    IS ``nbr[indptr[p]+j]``), 3.9x faster sampling at config-3 shapes
    (0.80 vs 3.13 ms, round-5 probe). ``deg`` must then be the table's
    (capped) degree array; ``indptr``/``nbr`` are unused and may be
    None.

    Returns (levels, masks) exactly like the host sampler's tree."""
    levels = [seeds.astype(jnp.int32)]
    masks = [jnp.ones(seeds.shape[0], bool)]
    ii32 = jnp.iinfo(jnp.int32).max
    for f in fanouts:
        key, sub = jax.random.split(key)
        parents = levels[-1]
        pmask = masks[-1]
        p = parents.shape[0]
        if nbr_table is not None:
            rows = nbr_table[parents]  # [P, cap+1] ONE row gather
            d = rows[:, -1]
        else:
            d = deg[parents]  # [P]
        ar = jnp.arange(f, dtype=jnp.int32)
        if mode == "uniform":
            u = jax.random.randint(sub, (p, f), 0, ii32)
            slot = u % jnp.maximum(d, 1)[:, None]
            cvalid = (d > 0)[:, None] & jnp.ones((1, f), bool)
        elif mode == "uniform_norep":
            # Floyd's subset sampling, slot j drawn in [0, d-f+j]; rows
            # with d <= f fall back to first-d (the full neighbor set)
            picks = jnp.zeros((p, f), jnp.int32)
            subs = jax.random.split(sub, f)
            for j in range(f):
                jj = d - f + j  # may be < 0 for low-degree rows (unused)
                u = jax.random.randint(subs[j], (p,), 0, ii32)
                t = u % jnp.maximum(jj + 1, 1)
                if j:
                    dup = (picks[:, :j] == t[:, None]).any(axis=1)
                    t = jnp.where(dup, jj, t)
                picks = picks.at[:, j].set(t)
            firstd = jnp.minimum(ar[None, :], jnp.maximum(d - 1, 0)[:, None])
            slot = jnp.where(d[:, None] > f, picks, firstd)
            cvalid = ar[None, :] < d[:, None]
        elif mode == "first":
            slot = jnp.minimum(ar[None, :], jnp.maximum(d - 1, 0)[:, None])
            cvalid = (d > 0)[:, None] & jnp.ones((1, f), bool)
        else:
            raise ValueError(f"unknown sampling mode: {mode}")
        if nbr_table is not None:
            # static unrolled compare-select: lane-dynamic indexing
            # (take_along_axis) lowers to per-element loops on TPU
            child = jnp.zeros((p, f), jnp.int32)
            for s_i in range(nbr_table.shape[1] - 1):
                child = jnp.where(slot == s_i, rows[:, s_i:s_i + 1], child)
        else:
            child = nbr[indptr[parents][:, None] + slot]
        child = jnp.where(cvalid, child, parents[:, None])
        levels.append(child.reshape(-1))
        masks.append((pmask[:, None] & cvalid).reshape(-1))
    return tuple(levels), tuple(masks)


def make_device_sampled_step_fns(
    model: SampledSage,
    optimizer: optax.GradientTransformation,
    fanouts: Sequence[int],
    indptr: jax.Array,
    nbr: jax.Array,
    deg: jax.Array,
    *,
    mode: str = "uniform",
    nbr_table: jax.Array | None = None,
):
    """Jitted train/eval steps with IN-JIT tree sampling: the host sends
    only seed ids + labels; sampling, gathering, and the model all run in
    one device program. ``indptr/nbr/deg`` are the device-resident CSR
    (in-neighbors grouped by destination, data/sampler.NeighborSampler
    layout). ``mode`` is the TRAINING sampling mode; eval always uses the
    deterministic ``first`` tree (same key-free trees every call — the
    metric is reproducible, matching the host path's eval mode).

    ``train_step`` returns ``(state, (loss, n_edges))`` where ``n_edges``
    is THIS step's VALID sampled-tree edge count (device scalar) — a
    measurement, not the padded-tree upper bound."""
    fanouts = tuple(fanouts)

    def gather(x, levels):
        return [x[l] for l in levels]

    def loss_fn(params, x, levels, masks, y, rng):
        logits = model.apply(
            {"params": params}, gather(x, levels), masks, fanouts,
            train=True, rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def train_step(state, x, seeds, y, rng):
        srng, drng = jax.random.split(rng)
        levels, masks = device_sample_tree(seeds, indptr, nbr, deg,
                                           fanouts, srng, mode,
                                           nbr_table=nbr_table)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x, levels, masks, y, drng)
        n_edges = sum(m.sum(dtype=jnp.int32) for m in masks[1:])
        return state.apply_gradients(grads=grads), (loss, n_edges)

    @jax.jit
    def eval_step(params, x, seeds, y):
        levels, masks = device_sample_tree(seeds, indptr, nbr, deg,
                                           fanouts, jax.random.PRNGKey(0),
                                           "first", nbr_table=nbr_table)
        logits = model.apply({"params": params}, gather(x, levels), masks,
                             fanouts)
        return jnp.argmax(logits, axis=1) == y

    def init(rng, x, batch_size: int):
        levels, masks = device_sample_tree(
            jnp.zeros(batch_size, jnp.int32), indptr, nbr, deg, fanouts,
            jax.random.PRNGKey(0), mode)
        params = model.init(rng, gather(x, levels), masks, fanouts)["params"]
        return train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optimizer)

    return train_step, eval_step, init


def make_dp_device_sampled_step_fns(
    model: SampledSage,
    optimizer: optax.GradientTransformation,
    fanouts: Sequence[int],
    indptr: jax.Array,
    nbr: jax.Array,
    deg: jax.Array,
    mesh,
    *,
    mode: str = "uniform",
    axis_name: str = "dp",
):
    """Data-parallel device-sampled steps: seed batches shard over the
    ``dp`` mesh axis (CSR + features + params replicated), each shard
    samples and trains its ``B/dp`` seeds, and the replicated-parameter
    gradients come out psum'd automatically (``value_and_grad`` OUTSIDE
    the shard_map — shard_map AD inserts the collective transpose).

    Seed counts are equal across shards by construction (the caller
    reshapes the wrap-padded batch to [dp, B/dp]), so ``pmean`` of the
    per-shard means IS the exact global mean. Per-shard sampling keys
    fold in the shard index; eval uses the deterministic ``first`` tree
    (key-free), so a dp=1 and a dp=N eval of the same seeds agree
    exactly.

    Returns ``(train_step, eval_step, init)``:
      * ``train_step(state, x, seeds[dp, B/dp], y[dp, B/dp], rng) ->
        (state, (loss, n_edges))`` — n_edges = global valid tree edges;
      * ``eval_step(params, x, seeds, y) -> hits [dp, B/dp]``;
      * ``init(rng, x, per_shard_batch) -> TrainState`` (replicated).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    fanouts = tuple(fanouts)

    def gather(x, levels):
        return [x[l] for l in levels]

    def local_loss(params, x, seeds, y, ip, nb, dg, rng):
        idx = jax.lax.axis_index(axis_name)
        srng, drng = jax.random.split(jax.random.fold_in(rng, idx))
        levels, masks = device_sample_tree(seeds, ip, nb, dg, fanouts,
                                           srng, mode)
        logits = model.apply(
            {"params": params}, gather(x, levels), masks, fanouts,
            train=True, rngs={"dropout": drng})
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        n_e = sum(m.sum(dtype=jnp.int32) for m in masks[1:])
        return (jax.lax.pmean(loss, axis_name),
                jax.lax.psum(n_e, axis_name))

    def sharded_loss(params, x, seeds_stack, y_stack, ip, nb, dg, rng):
        return local_loss(params, x, seeds_stack[0], y_stack[0],
                          ip, nb, dg, rng)

    loss_sm = shard_map(
        sharded_loss, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(), P(), P(), P()),
        out_specs=(P(), P()))

    @jax.jit
    def train_step(state, x, seeds_stack, y_stack, rng):
        (loss, n_e), grads = jax.value_and_grad(
            lambda p: loss_sm(p, x, seeds_stack, y_stack, indptr, nbr,
                              deg, rng), has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), (loss, n_e)

    def eval_body(params, x, seeds_stack, y_stack, ip, nb, dg):
        levels, masks = device_sample_tree(
            seeds_stack[0], ip, nb, dg, fanouts, jax.random.PRNGKey(0),
            "first")
        logits = model.apply({"params": params}, gather(x, levels), masks,
                             fanouts)
        return (jnp.argmax(logits, axis=1) == y_stack[0])[None]

    eval_sm = shard_map(
        eval_body, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(axis_name))

    @jax.jit
    def eval_step(params, x, seeds_stack, y_stack):
        return eval_sm(params, x, seeds_stack, y_stack, indptr, nbr, deg)

    def init(rng, x, per_shard_batch: int):
        levels, masks = device_sample_tree(
            jnp.zeros(per_shard_batch, jnp.int32), indptr, nbr, deg,
            fanouts, jax.random.PRNGKey(0), mode)
        params = model.init(rng, gather(x, levels), masks, fanouts)["params"]
        state = train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optimizer)
        return jax.device_put(state, NamedSharding(mesh, P()))

    return train_step, eval_step, init


def csr_device_arrays(sampler: NeighborSampler):
    """Device-resident CSR triple for :func:`make_device_sampled_step_fns`
    (int32: E and N fit; ~4*(E+2N) bytes on device)."""
    deg = (sampler.indptr[1:] - sampler.indptr[:-1]).astype(np.int32)
    return (jnp.asarray(sampler.indptr[:-1].astype(np.int32)),
            jnp.asarray(sampler.nbr.astype(np.int32)),
            jnp.asarray(deg))


def dense_nbr_table(sampler: NeighborSampler, deg_cap: int | None = None):
    """Dense ``[N, deg_cap]`` neighbor table + deg for the row-gather
    sampling path (:func:`device_sample_tree` with ``nbr_table=``).

    The CSR child lookup is three LANE-DYNAMIC accesses per level —
    element gathers of deg/indptr plus ``nbr[indptr[p]+slot]`` — which
    XLA lowers to per-element dynamic-slice loops on TPU (the probe that
    found this: PRNG costs 0.37 ms of the 3.0 ms sample phase; the rest
    is these gathers). The dense table makes each level ONE row gather
    (contiguous lanes, the fast gather form): row p = its ``cap``
    neighbors with deg appended as the last column, and the slot select
    happens as a static unrolled vectorized compare-select instead of a
    lane-dynamic ``take_along_axis``. Heavy-tail graphs cap at
    ``deg_cap`` and KEEP the capped degree so the uniform draw stays
    uniform over the retained neighbors."""
    n = len(sampler.indptr) - 1
    deg = (sampler.indptr[1:] - sampler.indptr[:-1]).astype(np.int64)
    cap = int(deg.max()) if deg_cap is None else int(deg_cap)
    cap = max(cap, 1)
    table = np.zeros((n, cap + 1), np.int32)
    keep = np.minimum(deg, cap)
    # vectorized ragged fill: flat positions of each row's kept slots
    rows = np.repeat(np.arange(n), keep)
    offs = np.concatenate([[0], np.cumsum(keep)[:-1]])
    cols = np.arange(int(keep.sum())) - np.repeat(offs, keep)
    table[rows, cols] = sampler.nbr[
        np.repeat(sampler.indptr[:-1], keep) + cols].astype(np.int32)
    table[:, cap] = keep
    return jnp.asarray(table), jnp.asarray(keep.astype(np.int32))


def make_sampled_scan_step(
    model: SampledSage,
    fanouts: Sequence[int],
):
    """One jitted call = H sequential train steps over PRE-SAMPLED stacked
    id trees (``lax.scan`` over the leading H axis) — amortizes per-batch
    dispatch across H steps. On a remote-relay TPU each dispatched step
    pays a launch+transfer RTT that dominates the 33 ms/step config-3
    measurement (BASELINE.md round 3); on local hardware it still cuts
    launch overhead and lets sampling run further ahead. Updates apply
    through ``state.apply_gradients`` — the optimizer is the TrainState's
    own ``tx`` (there is deliberately no optimizer argument to ignore).

    Returns ``scan_step(state, x, levels_h, masks_h, y_h, rng) ->
    (state, losses[H])`` where each levels_h[l] is [H, B·prod(f..)]."""
    fanouts = tuple(fanouts)

    def gather(x, levels):
        return [x[l] for l in levels]

    def loss_fn(params, x, levels, masks, y, rng):
        logits = model.apply(
            {"params": params}, gather(x, levels), masks, fanouts,
            train=True, rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def scan_step(state, x, levels_h, masks_h, y_h, rng):
        def one(carry, batch):
            st, key = carry
            levels, masks, y = batch
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(
                st.params, x, tuple(levels), tuple(masks), y, sub)
            return (st.apply_gradients(grads=grads), key), loss

        (state, _), losses = jax.lax.scan(
            one, (state, rng), (tuple(levels_h), tuple(masks_h), y_h))
        return state, losses

    return scan_step


def stack_sampled_batches(batches, labels: np.ndarray):
    """Stack H host-sampled batches into scan operands:
    ``(levels_h, masks_h, y_h)`` with a leading H axis per level."""
    levels_h = tuple(
        jnp.asarray(np.stack([np.asarray(b.levels[l]) for b in batches]))
        for l in range(len(batches[0].levels)))
    masks_h = tuple(
        jnp.asarray(np.stack([np.asarray(b.masks[l]) for b in batches]))
        for l in range(len(batches[0].masks)))
    y_h = jnp.asarray(np.stack([labels[b.levels[0]] for b in batches]))
    return levels_h, masks_h, y_h


def sampled_batches(
    sampler: NeighborSampler,
    seeds_order: np.ndarray,
    batch_size: int,
    fanouts: Sequence[int],
    labels: np.ndarray,
    *,
    rng: np.random.Generator,
    shuffle: bool = True,
    mode: str = "uniform",
):
    """Generator of device-ready sampled batches over ``seeds_order``
    (wrap-padded to keep shapes static) — the Prefetcher's producer.
    Yields ``(levels, masks, y, n_real, n_edges)``; ``n_edges`` is THIS
    batch's valid sampled-tree edge count, summed on host from the numpy
    masks so throughput accounting never forces a device transfer."""
    n = len(seeds_order)
    order = rng.permutation(seeds_order) if shuffle else seeds_order
    for s in range(0, n, batch_size):
        chunk = order[s:s + batch_size]
        n_real = len(chunk)
        if n_real < batch_size:  # wrap-pad: shapes stay static
            chunk = np.concatenate([chunk, np.resize(order, batch_size - n_real)])
        batch = sampler.sample(chunk, tuple(fanouts), rng=rng, mode=mode)
        n_edges = int(sum(int(m.sum()) for m in batch.masks[1:]))
        yield (*_tree_arrays(batch, labels), n_real, n_edges)


def train_sampled_classifier(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    x: np.ndarray | jax.Array,
    labels: np.ndarray,
    *,
    hidden_dims: Sequence[int] = (96, 96),
    num_classes: int | None = None,
    fanouts: Sequence[int] = (25, 10),
    batch_size: int = 1024,
    epochs: int = 5,
    lr: float = 1e-3,
    weight_decay: float = 5e-5,
    dropout: float | None = None,
    train_seeds: np.ndarray | None = None,
    val_seeds: np.ndarray | None = None,
    seed: int = 0,
    prefetch_depth: int = 2,
    scan_batches: int = 0,
    device_sample: bool = False,
    sample_mode: str = "uniform",
    dp: int = 0,
    dense_table: bool = False,
) -> tuple[train_state.TrainState, SampledTrainResult]:
    """Config-3 training loop: node classification on one large graph via
    fanout-sampled mini-batches. ``fanouts`` is outermost-first (layer 1
    aggregates the deepest level), matching SampledSage's tree layout.
    ``scan_batches=H`` trains H pre-sampled batches per jitted call
    (:func:`make_sampled_scan_step`) — same math, H× fewer dispatches.
    ``device_sample=True`` samples the fanout tree ON DEVICE
    (:func:`device_sample_tree`): only seed ids cross the host boundary —
    4.7× measured over the host-sampled path on the remote chip
    (BASELINE.md round 3). ``sample_mode``: ``uniform`` (with replacement,
    GraphSAGE default) or ``uniform_norep`` (PyG-NeighborLoader parity:
    min(f, deg) distinct neighbors, surplus slots masked). ``dp>1``
    (device_sample only) shards each seed batch over a dp-axis device
    mesh (:func:`make_dp_device_sampled_step_fns`); batch_size must
    divide by dp and metrics stay exact (equal shard counts + pmean)."""
    import time

    labels = np.asarray(labels, np.int64)
    num_classes = int(labels.max()) + 1 if num_classes is None else num_classes
    if train_seeds is None:
        split = int(num_nodes * 0.9)
        perm = np.random.default_rng(seed).permutation(num_nodes)
        train_seeds, val_seeds = perm[:split], perm[split:]
    rng = np.random.default_rng(seed + 1)

    sampler = NeighborSampler(src, dst, num_nodes)
    model = SampledSage(hidden_dims=tuple(hidden_dims), out_dim=num_classes,
                        dropout=dropout)

    x = jnp.asarray(x)
    if device_sample:
        return _train_device_sampled(
            model, sampler, x, labels, num_classes, fanouts, batch_size,
            epochs, lr, weight_decay, train_seeds, val_seeds, seed,
            sample_mode, dp=dp, dense_table=dense_table)
    if dp and dp > 1:
        raise ValueError("dp-sharded sampled training requires "
                         "device_sample=True")
    train_step, eval_step, init = make_sampled_step_fns(
        model, make_optimizer(lr, weight_decay), fanouts)
    # one probe batch fixes the static shapes and initializes params
    probe = sampler.sample(train_seeds[:batch_size] if len(train_seeds) >= batch_size
                           else np.resize(train_seeds, batch_size),
                           tuple(fanouts), rng=rng)
    levels0, masks0, _ = _tree_arrays(probe, labels)
    state = init(jax.random.PRNGKey(seed), x, levels0, masks0)

    key = jax.random.PRNGKey(seed + 2)
    tr_loss = np.zeros(epochs, np.float32)
    val_acc = np.zeros(epochs, np.float32)
    steps_timed = 0
    edges_total = 0
    t_train = 0.0
    scan_step = None
    if scan_batches and scan_batches > 1:
        scan_step = make_sampled_scan_step(model, fanouts)

    for epoch in range(epochs):
        losses = []
        t0 = time.perf_counter()
        if scan_step is not None:
            # group H host-sampled batches per jitted call; the tail group
            # wraps into the next epoch's order like the batch wrap-pad
            pend = []
            pend_edges = 0
            for levels, masks, y, _, n_edges in Prefetcher(
                sampled_batches(sampler, train_seeds, batch_size, fanouts,
                                labels, rng=rng, mode=sample_mode),
                prefetch_depth):
                pend.append((levels, masks, y))
                pend_edges += n_edges
                if len(pend) == scan_batches:
                    levels_h = tuple(jnp.stack([b[0][l] for b in pend])
                                     for l in range(len(pend[0][0])))
                    masks_h = tuple(jnp.stack([b[1][l] for b in pend])
                                    for l in range(len(pend[0][1])))
                    y_h = jnp.stack([b[2] for b in pend])
                    key, sub = jax.random.split(key)
                    state, ls = scan_step(state, x, levels_h, masks_h, y_h, sub)
                    # per-step losses (not the group mean): tail single
                    # steps then weigh equally in the epoch average
                    losses.append(ls)
                    edges_total += pend_edges
                    steps_timed += scan_batches
                    pend, pend_edges = [], 0
            for levels, masks, y in pend:  # tail: single steps
                key, sub = jax.random.split(key)
                state, loss = train_step(state, x, levels, masks, y, sub)
                losses.append(loss)
                steps_timed += 1
            edges_total += pend_edges
        else:
            for levels, masks, y, _, n_edges in Prefetcher(
                sampled_batches(sampler, train_seeds, batch_size, fanouts, labels,
                                rng=rng, mode=sample_mode), prefetch_depth):
                key, sub = jax.random.split(key)
                state, loss = train_step(state, x, levels, masks, y, sub)
                losses.append(loss)
                edges_total += n_edges
                steps_timed += 1
        jax.block_until_ready(losses[-1])
        t_train += time.perf_counter() - t0
        tr_loss[epoch] = float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses])))

        if val_seeds is not None and len(val_seeds):
            correct = 0
            total = 0
            for levels, masks, y, n_real, _ in Prefetcher(
                sampled_batches(sampler, val_seeds, batch_size, fanouts,
                                labels, rng=rng, shuffle=False, mode="first"),
                prefetch_depth):
                hits = np.asarray(eval_step(state.params, x, levels, masks, y))
                correct += int(hits[:n_real].sum())  # drop wrap padding
                total += n_real
            val_acc[epoch] = correct / max(total, 1)

    seeds_per_s = steps_timed * batch_size / max(t_train, 1e-9)
    return state, SampledTrainResult(
        train_loss=tr_loss, val_acc=val_acc, seeds_per_s=seeds_per_s,
        sampled_edges_per_s=edges_total / max(t_train, 1e-9))


def _train_device_sampled(model, sampler, x, labels, num_classes, fanouts,
                          batch_size, epochs, lr, weight_decay, train_seeds,
                          val_seeds, seed, sample_mode="uniform", dp=0,
                          dense_table=False):
    """Device-sampled training phase of :func:`train_sampled_classifier`:
    per step only [B] seed ids (+labels) leave the host. Eval trees are
    deterministic (mode='first' inside the step fns), so the reported
    val_acc is reproducible run to run. ``dp>1``: seed batches reshape to
    [dp, B/dp] and shard over a dp mesh."""
    import time

    indptr, nbr, deg = csr_device_arrays(sampler)
    table = None
    if dense_table:
        table, deg = dense_nbr_table(sampler)
    dp = int(dp) if dp else 0
    if dp > 1:
        from ..parallel.mesh import make_mesh

        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"dp={dp}")
        mesh = make_mesh(dp=dp, ep=1, devices=jax.devices()[:dp])
        train_step, eval_step, init = make_dp_device_sampled_step_fns(
            model, make_optimizer(lr, weight_decay), fanouts, indptr, nbr,
            deg, mesh, mode=sample_mode)
        reshape = lambda a: a.reshape(dp, batch_size // dp)
        init_b = batch_size // dp
    else:
        train_step, eval_step, init = make_device_sampled_step_fns(
            model, make_optimizer(lr, weight_decay), fanouts, indptr, nbr,
            deg, mode=sample_mode, nbr_table=table)
        reshape = lambda a: a
        init_b = batch_size
    labels_j = jnp.asarray(np.asarray(labels, np.int32))
    state = init(jax.random.PRNGKey(seed), x, init_b)
    key = jax.random.PRNGKey(seed + 2)
    rng = np.random.default_rng(seed + 1)

    tr_loss = np.zeros(epochs, np.float32)
    val_acc = np.zeros(epochs, np.float32)
    steps_timed = 0
    t_train = 0.0
    edges_total = 0
    for epoch in range(epochs):
        order = rng.permutation(train_seeds)
        losses = []
        counts = []  # device scalars: valid tree edges per step (measured)
        t0 = time.perf_counter()
        for s in range(0, len(order), batch_size):
            chunk = order[s:s + batch_size]
            if len(chunk) < batch_size:
                chunk = np.concatenate(
                    [chunk, np.resize(order, batch_size - len(chunk))])
            seeds = jnp.asarray(reshape(chunk.astype(np.int32)))
            key, sub = jax.random.split(key)
            state, (loss, n_e) = train_step(state, x, seeds,
                                            labels_j[seeds], sub)
            losses.append(loss)
            counts.append(n_e)
            steps_timed += 1
        jax.block_until_ready(losses[-1])
        t_train += time.perf_counter() - t0
        tr_loss[epoch] = float(jnp.mean(jnp.stack(losses)))
        edges_total += int(jnp.sum(jnp.stack(counts)))

        if val_seeds is not None and len(val_seeds):
            correct = total = 0
            for s in range(0, len(val_seeds), batch_size):
                chunk = val_seeds[s:s + batch_size]
                n_real = len(chunk)
                if n_real < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.resize(val_seeds, batch_size - n_real)])
                seeds = jnp.asarray(reshape(chunk.astype(np.int32)))
                hits = np.asarray(eval_step(state.params, x, seeds,
                                            labels_j[seeds])).reshape(-1)
                correct += int(hits[:n_real].sum())
                total += n_real
            val_acc[epoch] = correct / max(total, 1)

    seeds_per_s = steps_timed * batch_size / max(t_train, 1e-9)
    return state, SampledTrainResult(
        train_loss=tr_loss, val_acc=val_acc, seeds_per_s=seeds_per_s,
        sampled_edges_per_s=edges_total / max(t_train, 1e-9))
