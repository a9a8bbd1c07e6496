"""Jitted training and evaluation loops.

Parity target: /root/reference/src/utils.py:176-308 ``train_model`` —
Adam (torch semantics: L2 folded into the gradient, not decoupled), BCE with
pos_weight = neg/pos or focal loss, per-epoch train + eval phases with
0.5-threshold accuracy, best-validation-accuracy snapshotting, and per-label
accuracy curves (plus confusion-matrix/ROC-AUC stats for single-label runs).

TPU-first differences: the whole step (fwd + bwd + optimizer update) is one
jitted function over a static-shape :class:`PaddedGraphBatch`; metrics are
accumulated as device scalars and fetched once per epoch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph.containers import PaddedGraphBatch
from ..models.grusage import GruSage, GruSageConfig
from ..models.map_modules import MapData
from .losses import masked_graph_loss


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent: L2 is added to the
    gradient *before* the Adam moments (reference: src/utils.py:178)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


@dataclass
class StepFns:
    train_step: Callable
    eval_step: Callable
    init: Callable


def build_step_fns(
    model: GruSage,
    optimizer: optax.GradientTransformation,
    *,
    loss_type: str = "bce",
    pos_weight: float = 1.0,
    focal_alpha: float = 0.75,
    focal_gamma: float = 2.0,
    map_data: MapData | None = None,
    eval_scores: bool = True,
) -> StepFns:
    """Build jitted train/eval step closures for a model instance.
    ``eval_scores=False`` drops the per-graph scores/preds from eval_step's
    outputs (only the single-label CM/ROC-AUC path reads them)."""

    def loss_fn(params, batch: PaddedGraphBatch, rng):
        logits = model.apply(
            {"params": params},
            batch,
            map_data=map_data,
            train=True,
            rngs={"dropout": rng},
        )
        loss = masked_graph_loss(
            logits,
            batch.y,
            batch.graph_mask,
            loss_type=loss_type,
            pos_weight=pos_weight,
            focal_alpha=focal_alpha,
            focal_gamma=focal_gamma,
        )
        return loss, logits

    def _threshold_metrics(logits, batch):
        """Shared 0.5-threshold accuracy accounting (reference
        utils.py:229-235): sigmoid scores, binary preds, per-label masked
        correct counts, valid-graph count."""
        scores = jax.nn.sigmoid(logits)
        preds = (scores >= 0.5).astype(jnp.float32)
        correct = jnp.sum(
            (preds == batch.y).astype(jnp.int32) * batch.graph_mask[:, None].astype(jnp.int32),
            axis=0,
        )
        n_graphs = jnp.sum(batch.graph_mask.astype(jnp.int32))
        return scores, preds, correct, n_graphs

    @jax.jit
    def train_step(state: TrainState, batch: PaddedGraphBatch, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        _, _, correct, n_graphs = _threshold_metrics(logits, batch)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {
            "loss": loss,
            "correct": correct,
            "n_graphs": n_graphs,
        }

    @jax.jit
    def eval_step(params, batch: PaddedGraphBatch):
        logits = model.apply({"params": params}, batch, map_data=map_data, train=False)
        loss = masked_graph_loss(
            logits,
            batch.y,
            batch.graph_mask,
            loss_type=loss_type,
            pos_weight=pos_weight,
            focal_alpha=focal_alpha,
            focal_gamma=focal_gamma,
        )
        scores, preds, correct, n_graphs = _threshold_metrics(logits, batch)
        out = {
            "loss": loss,
            "correct": correct,
            "n_graphs": n_graphs,
        }
        if eval_scores:
            # per-graph score/pred arrays feed the single-label CM/ROC-AUC
            # curves; multi-label runs skip them (never read — holding them
            # per batch wasted device memory for the whole eval phase)
            out["scores"], out["preds"] = scores, preds
        return out

    def init(rng, example_batch: PaddedGraphBatch) -> TrainState:
        variables = model.init(
            {"params": rng, "dropout": rng}, example_batch, map_data=map_data, train=False
        )
        params = variables["params"]
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))

    return StepFns(train_step=train_step, eval_step=eval_step, init=init)


@dataclass
class TrainResult:
    """Accuracy curves, mirroring the reference's return tuple
    (src/utils.py:308): per-label and total train/val accuracy per epoch,
    plus binary CM/ROC-AUC stats for single-label runs."""

    per_label_train_acc: np.ndarray  # [L, epochs]
    total_train_acc: np.ndarray  # [1, epochs]
    per_label_val_acc: np.ndarray  # [L, epochs]
    total_val_acc: np.ndarray  # [1, epochs]
    bin_cm: np.ndarray | None = None  # [4, epochs] tn,fp,fn,tp
    bin_rocauc: np.ndarray | None = None  # [1, epochs]
    best_val_acc: float = 0.0
    train_loss: np.ndarray | None = None
    val_loss: np.ndarray | None = None


def _roc_auc(gt: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based ROC-AUC — shared implementation in evals.metrics."""
    from ..evals.metrics import roc_auc_score

    return roc_auc_score(gt, scores)


def train_model(
    model: GruSage,
    train_batches: Callable[[], Iterable[PaddedGraphBatch]],
    eval_batches: Callable[[], Iterable[PaddedGraphBatch]],
    *,
    epochs: int = 10,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    active_labels: Sequence[int] = (0,),
    neg_over_pos_ratio: float = 1.0,
    focal_alpha: float | None = None,
    focal_gamma: float = 0.0,
    map_data: MapData | None = None,
    seed: int = 0,
    best_state_callback: Callable[[Any, dict], None] | None = None,
    epoch_callback: Callable[[int, dict], None] | None = None,
    init_state: TrainState | None = None,
    prefetch_depth: int = 2,
    checkpoint_manager=None,
    mesh=None,
) -> tuple[TrainState, TrainResult]:
    """Full training run. ``train_batches``/``eval_batches`` are zero-arg
    callables returning fresh per-epoch iterators (the loader re-shuffles).

    Loss selection parity (src/utils.py:180-196): focal when focal_gamma>0
    with auto alpha = neg_frac, else BCE with pos_weight=neg/pos.

    ``mesh`` (a ``jax.sharding.Mesh`` with a 'dp' axis, e.g. from
    ``parallel.mesh.make_mesh``) switches the train phase to the SPMD
    data-parallel step (parallel/data_parallel.py): the loader's flat
    batch stream is grouped into dp-sized stacks (short tails padded with
    all-masked dummy batches), prefetched straight to mesh-sharded device
    memory, and each step consumes dp batches with AD-inserted gradient
    psums. Loss/accuracy stay exact means over real graphs, so curves are
    comparable with the single-device path. Eval shards the same way
    (parallel/data_parallel.py make_dp_eval_step), so its wall-clock also
    scales with dp. No reference analogue (single-GPU, SURVEY.md §2.4).
    """
    L = len(active_labels)
    if focal_gamma > 0:
        if focal_alpha is None:
            focal_alpha = neg_over_pos_ratio / (1.0 + neg_over_pos_ratio)
        loss_kw = dict(loss_type="focal", focal_alpha=focal_alpha, focal_gamma=focal_gamma)
        loss_info = {"type": "focal", "alpha": focal_alpha, "gamma": focal_gamma}
    else:
        loss_kw = dict(loss_type="bce", pos_weight=float(neg_over_pos_ratio))
        loss_info = {"type": "BCEWithLogits", "pos_weight": float(neg_over_pos_ratio)}

    optimizer = make_optimizer(lr, weight_decay)
    fns = build_step_fns(model, optimizer, map_data=map_data,
                         eval_scores=(L == 1), **loss_kw)

    dp = dp_sharding = repl_sharding = dp_step = dp_eval = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.data_parallel import make_dp_eval_step, make_dp_train_step

        dp = int(mesh.shape["dp"])
        dp_step = make_dp_train_step(model, optimizer, mesh, map_data=map_data, **loss_kw)
        dp_eval = make_dp_eval_step(model, mesh, map_data=map_data,
                                    eval_scores=(L == 1), **loss_kw)
        dp_sharding = NamedSharding(mesh, P("dp"))
        repl_sharding = NamedSharding(mesh, P())

    rng = jax.random.PRNGKey(seed)
    first = next(iter(train_batches()))
    if init_state is None:
        rng, init_rng = jax.random.split(rng)
        state = fns.init(init_rng, jax.tree.map(jnp.asarray, first))
    else:
        state = init_state
    if mesh is not None:
        # replicate state over the mesh up front: jit refuses inputs whose
        # device sets disagree (single-device params vs mesh-sharded batch)
        state = jax.device_put(state, repl_sharding)

    # crash recovery: resume params/optimizer/step from the latest orbax
    # checkpoint (train.checkpoint.CheckpointManager) when one exists —
    # including the host-side progress (best val acc so the best-snapshot
    # gate doesn't regress, completed epochs so they aren't re-trained,
    # and the accuracy/loss curve prefix so plots/best-epoch stats of a
    # resumed run equal an uninterrupted run's)
    start_epoch = 0
    resumed_best_vacc = 0.0
    saved_curves = None
    if checkpoint_manager is not None and checkpoint_manager.latest_step() is not None:
        state, ckpt_extras = checkpoint_manager.restore_with_extras(state)
        resumed_best_vacc = ckpt_extras["best_vacc"]
        start_epoch = min(ckpt_extras["epochs_done"], epochs)
        saved_curves = ckpt_extras.get("curves")
    # host-side mirror of state.step: avoids a device sync per train step
    host_step = int(state.step) if checkpoint_manager is not None else 0

    pl_tracc = np.zeros((L, epochs), np.float32)
    tot_tracc = np.zeros((1, epochs), np.float32)
    pl_vacc = np.zeros((L, epochs), np.float32)
    tot_vacc = np.zeros((1, epochs), np.float32)
    tr_loss_curve = np.zeros((epochs,), np.float32)
    vl_loss_curve = np.zeros((epochs,), np.float32)
    bin_cm = np.zeros((4, epochs), np.int64) if L == 1 else None
    bin_auc = np.zeros((1, epochs), np.float32) if L == 1 else None
    best_vacc = resumed_best_vacc

    curves = {
        "pl_tracc": pl_tracc, "tot_tracc": tot_tracc,
        "pl_vacc": pl_vacc, "tot_vacc": tot_vacc,
        "tr_loss": tr_loss_curve, "vl_loss": vl_loss_curve,
        "bin_cm": bin_cm, "bin_auc": bin_auc,
    }
    if saved_curves:
        # restore the completed-epoch prefix (clipped: the resumed run may
        # ask for a different total epoch count)
        for key, dst in curves.items():
            src_arr = saved_curves.get(key)
            if dst is None or src_arr is None:
                continue
            span = min(start_epoch, dst.shape[-1], src_arr.shape[-1])
            if dst.shape[:-1] == src_arr.shape[:-1]:
                dst[..., :span] = src_arr[..., :span]

    # a resumed run re-enters at the first UNFINISHED epoch with the
    # completed prefix of every curve restored from the checkpoint sidecar
    for epoch in range(start_epoch, epochs):
        # ---- train phase: metrics stay device-side per step; one host
        # fetch per epoch so batch prep overlaps device compute
        from ..data.prefetch import prefetch as _prefetch

        if mesh is not None:
            from ..data.prefetch import dp_batch_groups, prefetch_to_device

            batch_iter = prefetch_to_device(
                dp_batch_groups(train_batches(), dp), prefetch_depth, sharding=dp_sharding
            )
        else:
            batch_iter = _prefetch(train_batches(), prefetch_depth)
        step_metrics = []
        for batch in batch_iter:
            rng, step_rng = jax.random.split(rng)
            if mesh is not None:
                state, m = dp_step(state, batch, step_rng)
            else:
                state, m = fns.train_step(state, jax.tree.map(jnp.asarray, batch), step_rng)
            step_metrics.append(m)
            if checkpoint_manager is not None:
                # periodic async save + preemption exit (TrainingPreempted);
                # mid-epoch saves record the CURRENT epoch as unfinished, so
                # a resume re-runs it from the saved params
                host_step += 1
                checkpoint_manager.on_step(
                    state, step=host_step,
                    extras={"best_vacc": best_vacc, "epochs_done": epoch,
                            "curves": curves})
        correct = np.zeros((L,), np.int64)
        n = 0
        loss_sum = 0.0
        for m in step_metrics:
            correct += np.asarray(m["correct"])
            n += int(m["n_graphs"])
            loss_sum += float(m["loss"])
        nb = len(step_metrics)
        tot_tracc[0, epoch] = correct.sum() / max(n * L, 1)
        pl_tracc[:, epoch] = correct / max(n, 1)
        tr_loss_curve[epoch] = loss_sum / max(nb, 1)

        # ---- eval phase (dp-sharded over the mesh when one is given:
        # each shard evaluates one batch of a dp group, so eval wall-clock
        # scales with dp like the train phase; metrics stay exact)
        step_metrics = []
        masks = []
        gts = []
        if mesh is not None:
            from ..data.prefetch import dp_batch_groups, prefetch_to_device

            eval_iter = prefetch_to_device(
                dp_batch_groups(eval_batches(), dp), prefetch_depth,
                sharding=dp_sharding)
        else:
            eval_iter = _prefetch(eval_batches(), prefetch_depth)
        for batch in eval_iter:
            if mesh is not None:
                m = dp_eval(state.params, batch)
            else:
                m = fns.eval_step(state.params, jax.tree.map(jnp.asarray, batch))
            step_metrics.append(m)
            if L == 1:
                # [G] flat or [dp, G] stacked masks/gt — the score
                # collection below boolean-indexes either layout
                masks.append(np.asarray(batch.graph_mask))
                gts.append(np.asarray(batch.y))
        correct = np.zeros((L,), np.int64)
        n = 0
        loss_sum = 0.0
        all_scores, all_preds, all_gt = [], [], []
        for bi, m in enumerate(step_metrics):
            correct += np.asarray(m["correct"])
            n += int(m["n_graphs"])
            loss_sum += float(m["loss"])
            if L == 1:
                gm = masks[bi]
                all_scores.append(np.asarray(m["scores"])[gm])
                all_preds.append(np.asarray(m["preds"])[gm])
                all_gt.append(gts[bi][gm])
        nb = len(step_metrics)
        tot_vacc[0, epoch] = correct.sum() / max(n * L, 1)
        pl_vacc[:, epoch] = correct / max(n, 1)
        vl_loss_curve[epoch] = loss_sum / max(nb, 1)

        if tot_vacc[0, epoch] > best_vacc:
            best_vacc = float(tot_vacc[0, epoch])
            if best_state_callback is not None:
                best_state_callback(state, {"val_acc": best_vacc, "epoch": epoch, "loss_info": loss_info})

        if L == 1 and all_scores:
            scr = np.concatenate(all_scores).ravel()
            prd = np.concatenate(all_preds).ravel()
            gt = np.concatenate(all_gt).ravel().astype(np.int32)
            tp = int(((prd == 1) & (gt == 1)).sum())
            tn = int(((prd == 0) & (gt == 0)).sum())
            fp = int(((prd == 1) & (gt == 0)).sum())
            fn = int(((prd == 0) & (gt == 1)).sum())
            bin_cm[:, epoch] = [tn, fp, fn, tp]
            bin_auc[0, epoch] = _roc_auc(gt, scr)

        if checkpoint_manager is not None:
            checkpoint_manager.maybe_save(
                state, force=True,
                extras={"best_vacc": best_vacc, "epochs_done": epoch + 1,
                        "curves": curves})

        if epoch_callback is not None:
            epoch_callback(
                epoch,
                {
                    "train_acc": float(tot_tracc[0, epoch]),
                    "val_acc": float(tot_vacc[0, epoch]),
                    "train_loss": float(tr_loss_curve[epoch]),
                    "val_loss": float(vl_loss_curve[epoch]),
                },
            )

    result = TrainResult(
        per_label_train_acc=pl_tracc,
        total_train_acc=tot_tracc,
        per_label_val_acc=pl_vacc,
        total_val_acc=tot_vacc,
        bin_cm=bin_cm,
        bin_rocauc=bin_auc,
        best_val_acc=best_vacc,
        train_loss=tr_loss_curve,
        val_loss=vl_loss_curve,
    )
    return state, result


def make_train_step(model, optimizer, **kw):
    return build_step_fns(model, optimizer, **kw).train_step


def make_eval_step(model, optimizer=None, **kw):
    opt = optimizer or make_optimizer(1e-3, 0.0)
    return build_step_fns(model, opt, **kw).eval_step
