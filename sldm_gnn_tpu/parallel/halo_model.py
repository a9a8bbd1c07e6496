"""Multi-chip training of the REAL model family over the halo-sharded path.

Round 1 proved the node-sharded halo machinery (parallel/halo.py: boundary
all-to-all + per-shard Pallas kernels) on a fixed-function 2-layer toy.
This module puts the actual model inside it: :class:`HaloSageClassifier`
is parameter-compatible with :class:`~sldm_gnn_tpu.models.blocked_sage.
BlockedSageClassifier` (same flax param names/shapes: ``sage/conv{i}/
lin_l|lin_r``, ``sage/norm{i}``, ``head``) but its per-layer aggregation is
:func:`~sldm_gnn_tpu.parallel.halo.halo_aggregate_pallas` — each device
owns a contiguous node range, exchanges only boundary rows over ICI, and
runs the single-chip banded/dense/one-hot kernel on its shard.

The SAGE layer math matches /root/reference/src/models/blocks/sageblock.py:
4-20 (SAGEConv mean-agg -> LayerNorm(eps 1e-5) -> (Leaky)ReLU -> Dropout),
so a checkpoint trained here loads into the single-device classifier and
vice versa (tests/test_halo_model.py asserts per-step loss/grad parity).

Everything per-node (LayerNorm, dropout, head, masked loss) is local to the
shard; the only communication is the halo all-to-all inside each
aggregation and the scalar psums of the loss/metric reductions. Dropout
keys are folded with the shard index so masks are independent across
shards (a single global mask would need an O(N) broadcast for no
statistical benefit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.blocks import _activation
from ..train.loop import TrainState, make_optimizer
from .halo import HaloBlockedPlan, halo_aggregate_pallas


@dataclass(frozen=True)
class HaloDims:
    """The static scalars :func:`halo_aggregate_pallas` reads off the plan
    (hashable, so flax modules can hold it as an attribute — the full
    :class:`HaloBlockedPlan` carries numpy arrays and cannot be one)."""

    n_local: int
    n_pad_local: int
    n_pad_bnd: int
    k_per_step: int

    @classmethod
    def of(cls, plan: HaloBlockedPlan) -> "HaloDims":
        return cls(plan.n_local, plan.n_pad_local, plan.n_pad_bnd, plan.k_per_step)


class HaloSageConv(nn.Module):
    """SAGE convolution whose mean aggregation is the halo-sharded Pallas
    path. Param names/shapes match BlockedSageConv (lin_l with bias, lin_r
    without), so checkpoints transfer between execution modes."""

    out_dim: int
    dims: HaloDims
    use_pallas: bool = True
    axis_name: str = "ep"

    @nn.compact
    def __call__(self, x_local, send_idx, layouts):
        agg = halo_aggregate_pallas(
            x_local, send_idx, *layouts, self.dims,
            use_pallas=self.use_pallas, axis_name=self.axis_name,
        )
        out = nn.Dense(self.out_dim, use_bias=True, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, name="lin_r")(x_local)


class HaloSageBlock(nn.Module):
    """conv{i} -> LayerNorm(eps 1e-5) -> (Leaky)ReLU -> Dropout stack
    (reference sageblock.py:9-20 semantics, node-sharded execution)."""

    hidden_dims: Sequence[int]
    dims: HaloDims
    dropout: float | None = None
    negative_slope: float | None = None
    use_pallas: bool = True
    axis_name: str = "ep"

    @nn.compact
    def __call__(self, x_local, send_idx, layouts, *, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x_local = HaloSageConv(
                h, dims=self.dims, use_pallas=self.use_pallas,
                axis_name=self.axis_name, name=f"conv{i}",
            )(x_local, send_idx, layouts)
            x_local = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x_local)
            x_local = _activation(x_local, self.negative_slope)
            if self.dropout is not None:
                x_local = nn.Dropout(rate=self.dropout, deterministic=not train)(x_local)
        return x_local


class HaloSageClassifier(nn.Module):
    """Node classifier over the halo-sharded graph: param-compatible twin
    of BlockedSageClassifier (models/blocked_sage.py) running multi-chip."""

    hidden_dims: Sequence[int]
    num_classes: int
    dims: HaloDims
    dropout: float | None = None
    negative_slope: float | None = None
    use_pallas: bool = True
    axis_name: str = "ep"

    @nn.compact
    def __call__(self, x_local, send_idx, layouts, *, train: bool = False):
        h = HaloSageBlock(
            self.hidden_dims, dims=self.dims, dropout=self.dropout,
            negative_slope=self.negative_slope, use_pallas=self.use_pallas,
            axis_name=self.axis_name, name="sage",
        )(x_local, send_idx, layouts, train=train)
        return nn.Dense(self.num_classes, name="head")(h)


def shard_node_array(arr: np.ndarray, ep: int, n_local: int) -> np.ndarray:
    """[N, ...] host array -> [ep, n_local, ...] stacked shards (zero-padded
    past N). The inverse of ``stack.reshape(ep * n_local, ...)[:N]``."""
    arr = np.asarray(arr)
    pad = ep * n_local - arr.shape[0]
    if pad < 0:
        raise ValueError(f"array rows {arr.shape[0]} exceed ep*n_local={ep * n_local}")
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return arr.reshape((ep, n_local) + arr.shape[1:])


@dataclass
class HaloStepFns:
    train_step: Any
    eval_step: Any
    init: Any
    mesh: Mesh
    node_sharding: NamedSharding
    repl_sharding: NamedSharding


def build_halo_step_fns(
    model: HaloSageClassifier,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    plan: HaloBlockedPlan,
    *,
    axis_name: str = "ep",
) -> HaloStepFns:
    """Jitted train/eval steps for the halo-sharded classifier.

    ``train_step(state, x_stack, y_stack, mask_stack, rng)`` where
    x_stack [ep, n_local, D] / y_stack [ep, n_local] int labels /
    mask_stack [ep, n_local] f32 validity — all sharded over ``axis_name``.
    Loss = masked softmax cross-entropy, exact mean over valid nodes
    globally (psum'd numerator/denominator). Grads come out replicated
    (AD inserts the collective transposes through the all-to-all and the
    scalar psums), so the Adam update runs once, identically, per device.
    """
    send_idx = jnp.asarray(plan.send_idx)
    layouts = jax.tree.map(
        jnp.asarray, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev)
    )
    l_specs = jax.tree.map(lambda _: P(axis_name), layouts)
    node_spec = P(axis_name)

    def masked_ce(params, xl, yl, ml, rng, send, lts, train):
        rngs = None
        if train and model.dropout is not None:
            rngs = {"dropout": jax.random.fold_in(rng, jax.lax.axis_index(axis_name))}
        logits = model.apply(
            {"params": params}, xl, send, lts, train=train, rngs=rngs
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, yl[:, None], axis=1)[:, 0]
        num = jax.lax.psum(jnp.sum(nll * ml), axis_name)
        den = jax.lax.psum(jnp.sum(ml), axis_name)
        correct = (jnp.argmax(logits, axis=1) == yl).astype(jnp.float32) * ml
        n_correct = jax.lax.psum(jnp.sum(correct), axis_name)
        return num / jnp.maximum(den, 1.0), (n_correct, den)

    def _sharded(train):
        def body(params, x_stack, y_stack, m_stack, rng, send, lts):
            return masked_ce(
                params, x_stack[0], y_stack[0], m_stack[0], rng, send, lts, train
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), node_spec, node_spec, node_spec, P(), node_spec, l_specs),
            out_specs=(P(), (P(), P())),
        )

    loss_train = _sharded(True)
    loss_eval = _sharded(False)

    @jax.jit
    def train_step(state: TrainState, x_stack, y_stack, m_stack, rng):
        def loss_fn(params):
            return loss_train(params, x_stack, y_stack, m_stack, rng, send_idx, layouts)

        (loss, (n_correct, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "n_correct": n_correct, "n_valid": n_valid}

    @jax.jit
    def eval_step(params, x_stack, y_stack, m_stack):
        loss, (n_correct, n_valid) = loss_eval(
            params, x_stack, y_stack, m_stack, jax.random.PRNGKey(0), send_idx, layouts
        )
        return {"loss": loss, "n_correct": n_correct, "n_valid": n_valid}

    node_sharding = NamedSharding(mesh, node_spec)
    repl_sharding = NamedSharding(mesh, P())

    def init(rng, x_stack) -> TrainState:
        # init through the same shard_map so the Pallas kernels and
        # collectives trace identically; params come out replicated
        def body(rng, x_stack, send, lts):
            return model.init(
                {"params": rng, "dropout": rng}, x_stack[0], send, lts, train=False
            )["params"]

        params = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), node_spec, node_spec, l_specs),
            out_specs=P(),
        )(rng, x_stack, send_idx, layouts)
        state = TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        return jax.device_put(state, repl_sharding)

    return HaloStepFns(
        train_step=train_step, eval_step=eval_step, init=init,
        mesh=mesh, node_sharding=node_sharding, repl_sharding=repl_sharding,
    )


def train_halo_classifier(
    model: HaloSageClassifier,
    mesh: Mesh,
    plan: HaloBlockedPlan,
    x: np.ndarray,
    y: np.ndarray,
    mask: np.ndarray | None = None,
    *,
    epochs: int = 10,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    seed: int = 0,
    init_state: TrainState | None = None,
    epoch_callback=None,
) -> tuple[TrainState, dict]:
    """Full-batch node-classification training over the ('dp','ep') mesh.

    ``x [N, D]`` / ``y [N]`` / ``mask [N]`` live in GLOBAL node order; they
    are sharded here (contiguous ranges, matching the plan's node
    ownership). One step per epoch — full-batch, the config-4/5 workload.
    Returns (state, {"loss": [...], "acc": [...]}) curves.
    """
    ep = plan.send_idx.shape[0]
    n = x.shape[0]
    if mask is None:
        mask = np.ones(n, np.float32)  # shard_node_array zero-pads past N
    else:
        mask = np.asarray(mask, np.float32)
        if mask.shape[0] not in (n, ep * plan.n_local):
            raise ValueError("mask length must be N or ep*n_local")

    optimizer = make_optimizer(lr, weight_decay)
    fns = build_halo_step_fns(model, optimizer, mesh, plan)
    x_stack = jax.device_put(
        shard_node_array(x.astype(np.float32), ep, plan.n_local), fns.node_sharding
    )
    y_stack = jax.device_put(
        shard_node_array(np.asarray(y, np.int32), ep, plan.n_local), fns.node_sharding
    )
    m_stack = jax.device_put(
        shard_node_array(mask, ep, plan.n_local), fns.node_sharding
    )

    rng = jax.random.PRNGKey(seed)
    if init_state is None:
        rng, init_rng = jax.random.split(rng)
        state = fns.init(init_rng, x_stack)
    else:
        state = jax.device_put(init_state, fns.repl_sharding)

    losses, accs = [], []
    for epoch in range(epochs):
        rng, step_rng = jax.random.split(rng)
        state, m = fns.train_step(state, x_stack, y_stack, m_stack, step_rng)
        loss = float(m["loss"])
        acc = float(m["n_correct"]) / max(float(m["n_valid"]), 1.0)
        losses.append(loss)
        accs.append(acc)
        if epoch_callback is not None:
            epoch_callback(epoch, {"loss": loss, "acc": acc})
    return state, {"loss": losses, "acc": accs}
