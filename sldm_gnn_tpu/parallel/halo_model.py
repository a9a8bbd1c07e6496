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

from ..models.blocked_sage import _DenseParams, _LNParams
from ..models.blocks import _activation
from ..train.loop import TrainState, make_optimizer
from .halo import HaloBlockedPlan, halo_aggregate_pallas
from .halo_fused import (
    HaloFusedPlan,
    halo_fused_sage,
    halo_fused_sage_ln,
    halo_fused_sage_ln_ov,
    halo_fused_sage_ov,
)


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
    def of(cls, plan) -> "HaloDims":
        if isinstance(plan, HaloFusedPlan):
            return cls(plan.n_local, plan.n_pad_local, 0, 0)
        return cls(plan.n_local, plan.n_pad_local, plan.n_pad_bnd, plan.k_per_step)


class HaloSageConv(nn.Module):
    """SAGE convolution whose mean aggregation is the halo-sharded Pallas
    path. Param names/shapes match BlockedSageConv (lin_l with bias, lin_r
    without), so checkpoints transfer between execution modes.

    ``fused=True`` (requires a :class:`~sldm_gnn_tpu.parallel.halo_fused.
    HaloFusedPlan` layouts tuple): the per-layer all-to-all feeds the
    boundary partial into the fused banded kernel pre-epilogue — the
    single-chip epilogue/LN fusion running multi-chip. ``ln=(gamma,
    beta)`` additionally folds LayerNorm+activation into the same kernel
    (the fused_ln sublayer)."""

    out_dim: int
    dims: HaloDims
    use_pallas: bool = True
    axis_name: str = "ep"
    fused: bool = False
    overlap: bool = False  # collective/compute-overlap fused variants

    @nn.compact
    def __call__(self, x_local, send_idx, layouts, *,
                 ln=None, negative_slope: float | None = None):
        if self.fused:
            int_fwd, int_rev, bnd = (
                jax.tree.map(lambda a: a[0], l) for l in layouts)
            outgoing = x_local[send_idx[0]]  # [ep, H, D]
            halo = jax.lax.all_to_all(
                outgoing, self.axis_name, split_axis=0, concat_axis=0
            ).reshape(-1, x_local.shape[1])
            xp = jnp.pad(
                x_local, ((0, self.dims.n_pad_local - x_local.shape[0]), (0, 0)))
            wl, bl = _DenseParams(self.out_dim, True, name="lin_l")(x_local.shape[1])
            wr, _ = _DenseParams(self.out_dim, False, name="lin_r")(x_local.shape[1])
            if ln is not None:
                gamma, beta = ln
                fn = halo_fused_sage_ln_ov if self.overlap else halo_fused_sage_ln
                out = fn(
                    xp, halo, wl, wr, bl, gamma, beta,
                    int_fwd, int_rev, bnd, self.use_pallas, negative_slope,
                    1e-5, False, self.axis_name)
                return out[: self.dims.n_local]
            fn = halo_fused_sage_ov if self.overlap else halo_fused_sage
            out = fn(
                xp, halo, wl, wr, bl, int_fwd, int_rev, bnd,
                self.use_pallas, None, False, self.axis_name)
            return out[: self.dims.n_local]
        agg = halo_aggregate_pallas(
            x_local, send_idx, *layouts, self.dims,
            use_pallas=self.use_pallas, axis_name=self.axis_name,
        )
        out = nn.Dense(self.out_dim, use_bias=True, name="lin_l")(agg)
        return out + nn.Dense(self.out_dim, use_bias=False, name="lin_r")(x_local)


class HaloSageBlock(nn.Module):
    """conv{i} -> LayerNorm(eps 1e-5) -> (Leaky)ReLU -> Dropout stack
    (reference sageblock.py:9-20 semantics, node-sharded execution).
    ``fused``/``fused_ln`` mirror BlockedSageBlock's kernel dispatch."""

    hidden_dims: Sequence[int]
    dims: HaloDims
    dropout: float | None = None
    negative_slope: float | None = None
    use_pallas: bool = True
    axis_name: str = "ep"
    fused: bool = False
    fused_ln: bool = False
    overlap: bool = False

    @nn.compact
    def __call__(self, x_local, send_idx, layouts, *, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            conv = HaloSageConv(
                h, dims=self.dims, use_pallas=self.use_pallas,
                axis_name=self.axis_name, fused=self.fused or self.fused_ln,
                overlap=self.overlap, name=f"conv{i}",
            )
            if self.fused_ln:
                gamma, beta = _LNParams(name=f"norm{i}")(h)
                slope_k = (0.0 if self.negative_slope is None
                           else float(self.negative_slope))
                x_local = conv(x_local, send_idx, layouts,
                               ln=(gamma, beta), negative_slope=slope_k)
            else:
                x_local = conv(x_local, send_idx, layouts)
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
    fused: bool = False  # epilogue fusion over the fused halo plan
    fused_ln: bool = False  # conv+LN+act single-kernel (see HaloSageBlock)
    overlap: bool = False  # interior kernel independent of the all-to-all

    @nn.compact
    def __call__(self, x_local, send_idx, layouts, *, train: bool = False):
        h = HaloSageBlock(
            self.hidden_dims, dims=self.dims, dropout=self.dropout,
            negative_slope=self.negative_slope, use_pallas=self.use_pallas,
            axis_name=self.axis_name, fused=self.fused,
            fused_ln=self.fused_ln, overlap=self.overlap, name="sage",
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
    # AOT surface: the underlying jitted impl takes send_idx/layouts as
    # EXPLICIT arguments (multi-process arrays cannot be closed over by
    # an outer jit), so callers can .lower(...).compile() it —
    # multiproc_halo.py's serial-compile path
    train_impl: Any = None
    step_extras: Any = None


def build_halo_step_fns(
    model: HaloSageClassifier,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    plan: HaloBlockedPlan,
    *,
    axis_name: str = "ep",
    loss_type: str = "softmax_ce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
) -> HaloStepFns:
    """Jitted train/eval steps for the halo-sharded classifier.

    ``train_step(state, x_stack, y_stack, mask_stack, rng)`` where
    x_stack [ep, n_local, D] / mask_stack [ep, n_local] f32 validity — all
    sharded over ``axis_name``. Grads come out replicated (AD inserts the
    collective transposes through the all-to-all and the scalar psums), so
    the Adam update runs once, identically, per device.

    ``loss_type``:
      * ``"softmax_ce"`` — y_stack [ep, n_local] int class labels; masked
        softmax cross-entropy, metrics {loss, n_correct, n_valid}.
      * ``"bce"`` / ``"focal"`` — y_stack [ep, n_local, L] float multi-hot;
        BCEWithLogits(pos_weight) / focal BCE per the reference's loss
        semantics (/root/reference/src/utils.py:180-196) with the masked
        mean over valid nodes psum'd globally; metrics add the micro-F1
        components {tp, fp, fn} at threshold 0.5.
    """
    from ..train.losses import _stable_bce_elems

    # Layouts go straight to their mesh sharding: device_put of the numpy
    # stacks onto P(axis_name) here means the jitted steps receive
    # correctly-placed args and never pay a dispatch-time reshard copy
    # (at config-5 scale that copy is tens of GB per call). Multi-process
    # callers (multiproc_halo.py) pass pre-assembled global jax Arrays,
    # which are kept as-is.
    _layout_sharding = NamedSharding(mesh, P(axis_name))

    def _put(a):
        if isinstance(a, jax.Array):
            return a
        return jax.device_put(np.asarray(a), _layout_sharding)

    send_idx = _put(plan.send_idx)
    if isinstance(plan, HaloFusedPlan):
        layouts = jax.tree.map(
            _put, (plan.int_fwd, plan.int_rev, plan.bnd))
    else:
        layouts = jax.tree.map(
            _put, (plan.int_fwd, plan.int_rev, plan.bnd_fwd, plan.bnd_rev)
        )
    l_specs = jax.tree.map(lambda _: P(axis_name), layouts)
    node_spec = P(axis_name)
    multilabel = loss_type in ("bce", "focal")
    if not multilabel and loss_type != "softmax_ce":
        raise ValueError(f"unknown loss_type {loss_type!r}")

    def loss_and_stats(params, xl, yl, ml, rng, send, lts, train):
        rngs = None
        if train and model.dropout is not None:
            rngs = {"dropout": jax.random.fold_in(rng, jax.lax.axis_index(axis_name))}
        logits = model.apply(
            {"params": params}, xl, send, lts, train=train, rngs=rngs
        )
        lf = logits.astype(jnp.float32)
        psum = lambda v: jax.lax.psum(v, axis_name)
        if not multilabel:
            logp = jax.nn.log_softmax(lf)
            nll = -jnp.take_along_axis(logp, yl[:, None], axis=1)[:, 0]
            num = psum(jnp.sum(nll * ml))
            den = psum(jnp.sum(ml))
            correct = (jnp.argmax(logits, axis=1) == yl).astype(jnp.float32) * ml
            return num / jnp.maximum(den, 1.0), (psum(jnp.sum(correct)), den)
        yf = yl.astype(jnp.float32)
        if loss_type == "bce":
            elems = _stable_bce_elems(lf, yf, pos_weight)
        else:
            bce = _stable_bce_elems(lf, yf, None)
            p = jax.nn.sigmoid(lf)
            p_t = p * yf + (1.0 - p) * (1.0 - yf)
            alpha_t = focal_alpha * yf + (1.0 - focal_alpha) * (1.0 - yf)
            elems = alpha_t * (1.0 - p_t) ** focal_gamma * bce
        w = ml[:, None]
        num = psum(jnp.sum(elems * w))
        den = psum(jnp.sum(ml)) * elems.shape[1]
        preds = (lf > 0.0).astype(jnp.float32)  # sigmoid > 0.5
        tp = psum(jnp.sum(preds * yf * w))
        fp = psum(jnp.sum(preds * (1.0 - yf) * w))
        fn = psum(jnp.sum((1.0 - preds) * yf * w))
        return num / jnp.maximum(den, 1.0), (tp, fp, fn, den)

    def _sharded(train):
        def body(params, x_stack, y_stack, m_stack, rng, send, lts):
            return loss_and_stats(
                params, x_stack[0], y_stack[0], m_stack[0], rng, send, lts, train
            )

        stats_spec = (P(), P(), P(), P()) if multilabel else (P(), P())
        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), node_spec, node_spec, node_spec, P(), node_spec, l_specs),
            out_specs=(P(), stats_spec),
        )

    loss_train = _sharded(True)
    loss_eval = _sharded(False)

    def _metrics(loss, stats):
        if multilabel:
            tp, fp, fn, den = stats
            return {"loss": loss, "tp": tp, "fp": fp, "fn": fn,
                    "n_valid": den,
                    "micro_f1": 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)}
        n_correct, den = stats
        return {"loss": loss, "n_correct": n_correct, "n_valid": den}

    # send_idx/layouts ride as explicit jit ARGUMENTS (via the partial
    # wrappers below), never closures: multi-process JAX forbids closing
    # over arrays that span non-addressable devices (multiproc_halo.py),
    # and as constants they'd bloat the remote-compile payload anyway
    @jax.jit
    def _train_impl(state: TrainState, x_stack, y_stack, m_stack, rng,
                    send, lts):
        def loss_fn(params):
            return loss_train(params, x_stack, y_stack, m_stack, rng, send, lts)

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, _metrics(loss, stats)

    def train_step(state: TrainState, x_stack, y_stack, m_stack, rng):
        return _train_impl(state, x_stack, y_stack, m_stack, rng,
                           send_idx, layouts)

    @jax.jit
    def _eval_impl(params, x_stack, y_stack, m_stack, send, lts):
        loss, stats = loss_eval(
            params, x_stack, y_stack, m_stack, jax.random.PRNGKey(0), send, lts
        )
        return _metrics(loss, stats)

    def eval_step(params, x_stack, y_stack, m_stack):
        return _eval_impl(params, x_stack, y_stack, m_stack, send_idx, layouts)

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
        train_impl=_train_impl, step_extras=(send_idx, layouts),
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
    loss_type: str = "softmax_ce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
    val_mask: np.ndarray | None = None,
    checkpoint_manager=None,
    best_state_callback=None,
) -> tuple[TrainState, dict]:
    """Full-batch node-classification training over the ('dp','ep') mesh
    with the training-engine surface of train/loop.py: orbax checkpoint/
    preemption resume (``checkpoint_manager``), best-snapshot callback on
    the val metric, and an optional held-out eval split.

    ``x [N, D]`` / ``y [N]`` (int classes, or [N, L] multi-hot for
    loss_type 'bce'/'focal') / ``mask [N]`` live in GLOBAL node order;
    they are sharded here (contiguous ranges, matching the plan's node
    ownership). One step per epoch — full-batch, the config-4/5 workload.
    ``val_mask [N]``: evaluated each epoch with a separate masked eval step;
    its nodes should be excluded from ``mask``. Returns
    (state, curves) where curves has "loss" and "acc" (softmax) or
    "micro_f1" (multi-label), plus "val_acc"/"val_micro_f1" when
    ``val_mask`` is given.
    """
    ep = plan.send_idx.shape[0]
    n = x.shape[0]
    multilabel = loss_type in ("bce", "focal")
    if mask is None:
        mask = np.ones(n, np.float32)  # shard_node_array zero-pads past N
    else:
        mask = np.asarray(mask, np.float32)
        if mask.shape[0] not in (n, ep * plan.n_local):
            raise ValueError("mask length must be N or ep*n_local")

    optimizer = make_optimizer(lr, weight_decay)
    fns = build_halo_step_fns(
        model, optimizer, mesh, plan, loss_type=loss_type,
        pos_weight=pos_weight, focal_alpha=focal_alpha,
        focal_gamma=focal_gamma)
    x_stack = jax.device_put(
        shard_node_array(x.astype(np.float32), ep, plan.n_local), fns.node_sharding
    )
    y_arr = (np.asarray(y, np.float32) if multilabel
             else np.asarray(y, np.int32))
    y_stack = jax.device_put(
        shard_node_array(y_arr, ep, plan.n_local), fns.node_sharding
    )
    m_stack = jax.device_put(
        shard_node_array(mask, ep, plan.n_local), fns.node_sharding
    )
    vm_stack = None
    if val_mask is not None:
        vm_stack = jax.device_put(
            shard_node_array(np.asarray(val_mask, np.float32), ep, plan.n_local),
            fns.node_sharding)

    rng = jax.random.PRNGKey(seed)
    if init_state is None:
        rng, init_rng = jax.random.split(rng)
        state = fns.init(init_rng, x_stack)
    else:
        state = jax.device_put(init_state, fns.repl_sharding)

    metric_key = "micro_f1" if multilabel else "acc"
    curves: dict = {"loss": [], metric_key: []}
    if vm_stack is not None:
        curves["val_loss"] = []
        curves[f"val_{metric_key}"] = []

    # crash recovery: resume params/opt/step + completed epochs + curves
    # from the latest orbax checkpoint (same semantics as train/loop.py)
    start_epoch = 0
    best_metric = -np.inf
    if checkpoint_manager is not None and checkpoint_manager.latest_step() is not None:
        state, extras = checkpoint_manager.restore_with_extras(state)
        best_metric = extras.get("best_vacc", -np.inf)
        start_epoch = min(extras.get("epochs_done", 0), epochs)
        saved = extras.get("curves") or {}
        for k in curves:
            prefix = list(saved.get(k, ()))[:start_epoch]
            curves[k] = prefix

    def _metric_of(m):
        if multilabel:
            return float(m["micro_f1"])
        return float(m["n_correct"]) / max(float(m["n_valid"]), 1.0)

    # fast-forward the rng stream past completed epochs so a resumed run's
    # dropout keys equal the uninterrupted run's
    for _ in range(start_epoch):
        rng, _ = jax.random.split(rng)

    for epoch in range(start_epoch, epochs):
        rng, step_rng = jax.random.split(rng)
        state, m = fns.train_step(state, x_stack, y_stack, m_stack, step_rng)
        loss = float(m["loss"])
        curves["loss"].append(loss)
        curves[metric_key].append(_metric_of(m))
        ecb_metrics = {"loss": loss, metric_key: curves[metric_key][-1]}

        gate = curves[metric_key][-1]
        if vm_stack is not None:
            vm = fns.eval_step(state.params, x_stack, y_stack, vm_stack)
            curves["val_loss"].append(float(vm["loss"]))
            gate = _metric_of(vm)
            curves[f"val_{metric_key}"].append(gate)
            ecb_metrics.update({"val_loss": float(vm["loss"]),
                                f"val_{metric_key}": gate})
        if best_state_callback is not None and gate > best_metric:
            best_metric = gate
            best_state_callback(state, {"epoch": epoch, metric_key: gate})
        if epoch_callback is not None:
            epoch_callback(epoch, ecb_metrics)
        if checkpoint_manager is not None:
            checkpoint_manager.on_step(
                state, step=epoch + 1,
                extras={"best_vacc": best_metric, "epochs_done": epoch + 1,
                        "curves": curves})
    if checkpoint_manager is not None:
        checkpoint_manager.maybe_save(
            state, force=True, step=epochs,
            extras={"best_vacc": best_metric, "epochs_done": epochs,
                    "curves": curves})
    return state, curves
