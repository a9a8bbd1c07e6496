"""Vmapped parameter-sweep training: K hyperparameter combinations trained
simultaneously on one chip.

The reference parallelizes its grid sweep with process pools sharing one
GPU (main.py:277-342). The TPU-native equivalent is ``jax.vmap`` over the
combination axis: one jitted step updates K stacked parameter sets against
the same batch, turning K small models into batched GEMMs that actually
fill the MXU. Works for combinations that share the architecture and
differ in optimizer/loss scalars (lr, weight decay, pos_weight / focal
alpha-gamma) — the common case of the reference's default grid.

The optimizer is an explicit Adam (bias-corrected, torch semantics: L2
added to the gradient) so lr/wd ride as traced per-combo scalars under
vmap; one-step parity with train.loop's optax chain is covered by tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.containers import PaddedGraphBatch
from ..models.grusage import GruSage
from ..models.map_modules import MapData
from .losses import masked_graph_loss

_B1, _B2, _EPS = 0.9, 0.999, 1e-8


def adam_update(grads, m, v, count, params, lr, wd):
    """One bias-corrected Adam step with L2-in-gradient (torch semantics)."""

    def upd(g, m_, v_, p):
        g = g + wd * p
        m_new = _B1 * m_ + (1 - _B1) * g
        v_new = _B2 * v_ + (1 - _B2) * g * g
        mhat = m_new / (1 - _B1**count)
        vhat = v_new / (1 - _B2**count)
        return m_new, v_new, p - lr * mhat / (jnp.sqrt(vhat) + _EPS)

    flat_g, tree = jax.tree.flatten(grads)
    flat_m = jax.tree.leaves(m)
    flat_v = jax.tree.leaves(v)
    flat_p = jax.tree.leaves(params)
    out = [upd(g, m_, v_, p) for g, m_, v_, p in zip(flat_g, flat_m, flat_v, flat_p)]
    new_m = jax.tree.unflatten(tree, [o[0] for o in out])
    new_v = jax.tree.unflatten(tree, [o[1] for o in out])
    new_p = jax.tree.unflatten(tree, [o[2] for o in out])
    return new_m, new_v, new_p


@dataclass
class VmapSweepResult:
    total_train_acc: np.ndarray  # [K, epochs]
    total_val_acc: np.ndarray  # [K, epochs]
    train_loss: np.ndarray  # [K, epochs]
    val_loss: np.ndarray  # [K, epochs]
    best_val_acc: np.ndarray  # [K]


def train_sweep_vmapped(
    model: GruSage,
    train_batches: Callable[[], Iterable[PaddedGraphBatch]],
    eval_batches: Callable[[], Iterable[PaddedGraphBatch]],
    *,
    lrs: Sequence[float],
    weight_decays: Sequence[float],
    epochs: int,
    pos_weight: float = 1.0,
    loss_type: str = "bce",
    focal_alphas: Sequence[float] | None = None,
    focal_gamma: float = 2.0,
    map_data: MapData | None = None,
    seed: int = 0,
) -> tuple[Any, VmapSweepResult]:
    """Train K combinations in lockstep. Returns (stacked_params [K, ...]
    snapshotted at each combo's best validation epoch, result).
    ``lrs``/``weight_decays`` (and optionally per-combo ``focal_alphas``)
    must all have length K."""
    K = len(lrs)
    assert len(weight_decays) == K
    lrs_j = jnp.asarray(np.array(lrs, np.float32))
    wds_j = jnp.asarray(np.array(weight_decays, np.float32))
    if loss_type == "focal":
        if focal_alphas is None:
            # auto alpha = neg fraction, derived from pos_weight (= neg/pos
            # ratio) — same default as train.loop (reference utils.py:180-184)
            focal_alphas = [pos_weight / (1.0 + pos_weight)] * K
        alphas_j = jnp.asarray(np.array(focal_alphas, np.float32))
    else:
        alphas_j = jnp.zeros(K, jnp.float32)

    first = jax.tree.map(jnp.asarray, next(iter(train_batches())))
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    init_keys = jax.random.split(init_rng, K)

    def init_one(key):
        return model.init(
            {"params": key, "dropout": key}, first, map_data=map_data, train=False
        )["params"]

    params = jax.vmap(init_one)(init_keys)
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)

    def loss_fn(p, batch, key, alpha):
        logits = model.apply(
            {"params": p}, batch, map_data=map_data, train=True, rngs={"dropout": key}
        )
        if loss_type == "focal":
            loss = masked_graph_loss(
                logits, batch.y, batch.graph_mask,
                loss_type="focal", focal_alpha=alpha, focal_gamma=focal_gamma,
            )
        else:
            loss = masked_graph_loss(
                logits, batch.y, batch.graph_mask, loss_type="bce", pos_weight=pos_weight
            )
        return loss, logits

    def one_train(p, m_, v_, batch, key, lr, wd, alpha, count):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, key, alpha)
        m_, v_, p = adam_update(grads, m_, v_, count, p, lr, wd)
        correct = _correct(logits, batch)
        return p, m_, v_, loss, correct

    def one_eval(p, batch, alpha):
        logits = model.apply({"params": p}, batch, map_data=map_data, train=False)
        if loss_type == "focal":
            loss = masked_graph_loss(
                logits, batch.y, batch.graph_mask,
                loss_type="focal", focal_alpha=alpha, focal_gamma=focal_gamma,
            )
        else:
            loss = masked_graph_loss(
                logits, batch.y, batch.graph_mask, loss_type="bce", pos_weight=pos_weight
            )
        return loss, _correct(logits, batch)

    train_step = jax.jit(
        jax.vmap(one_train, in_axes=(0, 0, 0, None, 0, 0, 0, 0, None))
    )
    eval_step = jax.jit(jax.vmap(one_eval, in_axes=(0, None, 0)))

    L = first.y.shape[1]
    tr_acc = np.zeros((K, epochs), np.float32)
    vl_acc = np.zeros((K, epochs), np.float32)
    tr_loss = np.zeros((K, epochs), np.float32)
    vl_loss = np.zeros((K, epochs), np.float32)
    # -inf so the first epoch always snapshots: a combo that never improves
    # must still return trained (not random-init) weights
    best = np.full(K, -np.inf, np.float32)
    best_params = params  # per-combo snapshot at each combo's best val epoch
    count = 0

    for epoch in range(epochs):
        csum = np.zeros(K)
        n = 0
        lsum = np.zeros(K)
        nb = 0
        for batch in train_batches():
            count += 1
            rng, k = jax.random.split(rng)
            keys = jax.random.split(k, K)
            bj = jax.tree.map(jnp.asarray, batch)
            params, m, v, loss, correct = train_step(
                params, m, v, bj, keys, lrs_j, wds_j, alphas_j, count
            )
            csum += np.asarray(correct)
            n += int(np.asarray(bj.graph_mask).sum())
            lsum += np.asarray(loss)
            nb += 1
        tr_acc[:, epoch] = csum / max(n * L, 1)
        tr_loss[:, epoch] = lsum / max(nb, 1)

        csum = np.zeros(K)
        n = 0
        lsum = np.zeros(K)
        nb = 0
        for batch in eval_batches():
            bj = jax.tree.map(jnp.asarray, batch)
            loss, correct = eval_step(params, bj, alphas_j)
            csum += np.asarray(correct)
            n += int(np.asarray(bj.graph_mask).sum())
            lsum += np.asarray(loss)
            nb += 1
        vl_acc[:, epoch] = csum / max(n * L, 1)
        vl_loss[:, epoch] = lsum / max(nb, 1)
        improved = vl_acc[:, epoch] > best
        if improved.any():
            imp = jnp.asarray(improved)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(
                    imp.reshape((K,) + (1,) * (new.ndim - 1)), new, old
                ),
                params,
                best_params,
            )
        best = np.maximum(best, vl_acc[:, epoch])

    return best_params, VmapSweepResult(
        total_train_acc=tr_acc,
        total_val_acc=vl_acc,
        train_loss=tr_loss,
        val_loss=vl_loss,
        best_val_acc=np.maximum(best, 0.0),
    )


def _correct(logits, batch):
    scores = jax.nn.sigmoid(logits)
    preds = (scores >= 0.5).astype(jnp.float32)
    return jnp.sum(
        (preds == batch.y).astype(jnp.int32) * batch.graph_mask[:, None].astype(jnp.int32)
    )


def extract_combo_params(stacked_params, k: int):
    """Slice combination ``k`` out of the stacked parameter tree."""
    return jax.tree.map(lambda a: a[k], stacked_params)
