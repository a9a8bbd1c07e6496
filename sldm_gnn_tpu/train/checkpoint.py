"""Step-level checkpoint/resume via orbax, with async saves and preemption
handling.

A superset of the reference's best-snapshot-only persistence (SURVEY.md
§5.4: "No mid-training resume"): full TrainState (params + optimizer
moments + step) is checkpointed every N steps with retention, and training
resumes exactly from the latest step. The rich *model snapshot* for
eval/serving stays in :mod:`sldm_gnn_tpu.train.snapshot` — this module is
about fault tolerance of long runs.

Async mode (default) hands the serialized state to orbax's background
writer so the train loop never blocks on storage; ``close()`` (and any
restore) drains pending writes. Preemption handling: a SIGTERM/SIGINT (the
cloud-TPU preemption notice) sets a flag; the train loop's per-step hook
then force-saves the exact current step and raises
:class:`TrainingPreempted`, so a preempted run resumes losslessly.
Multi-host preemption coordination additionally goes through orbax's
``reached_preemption`` (jax.monitoring sync point) when available.
"""

from __future__ import annotations

import signal
import threading
from pathlib import Path
from typing import Any

import jax
import numpy as np

from .loop import TrainState


class TrainingPreempted(RuntimeError):
    """Raised by the step hook after the preemption checkpoint is durable."""

    def __init__(self, step: int):
        super().__init__(f"training preempted; checkpoint saved at step {step}")
        self.step = step


class CheckpointManager:
    def __init__(
        self,
        directory: Path | str,
        *,
        max_to_keep: int = 3,
        save_every: int = 100,
        async_save: bool = True,
        handle_signals: bool = True,
    ):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_every = save_every
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._preempted = threading.Event()
        self._prev_handlers: dict[int, Any] = {}
        if handle_signals and threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM,):
                prev = signal.getsignal(sig)
                self._prev_handlers[sig] = prev

                def _handler(signum, frame, prev=prev):
                    self._preempted.set()
                    if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL):
                        prev(signum, frame)

                signal.signal(sig, _handler)

    # ------------------------------------------------------------- saving

    def maybe_save(self, state: TrainState, *, force: bool = False, step: int | None = None,
                   extras: dict | None = None) -> bool:
        import orbax.checkpoint as ocp

        step = int(state.step) if step is None else step
        if not force and (self.save_every <= 0 or step % self.save_every != 0):
            return False
        if step in self._mgr.all_steps():  # e.g. epoch-end save right after a periodic one
            return False
        if extras and extras.get("curves"):
            self._save_curves(step, extras["curves"])
        saved = self._mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state, extras)))
        if not self.async_save:
            self._mgr.wait_until_finished()
        return bool(saved)

    # Host-side training curves travel in a sidecar .npz keyed by step —
    # they are variable-shape numpy (epochs differ between runs), which
    # orbax StandardRestore's fixed template cannot express. Written
    # synchronously (a few KB) BEFORE the orbax save so a curves file
    # always exists for any restorable step; stale sidecars are pruned to
    # the manager's retained steps.
    def _curves_path(self, step: int) -> Path:
        return self.directory / f"curves_{step}.npz"

    def _save_curves(self, step: int, curves: dict) -> None:
        arrays = {k: np.asarray(v) for k, v in curves.items() if v is not None}
        tmp = self._curves_path(step).with_suffix(".tmp.npz")
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        tmp.replace(self._curves_path(step))
        keep = set(self._mgr.all_steps()) | {step}
        for p in self.directory.glob("curves_*.npz"):
            try:
                if int(p.stem.split("_")[1]) not in keep:
                    p.unlink()
            except (ValueError, OSError):
                pass

    def _load_curves(self, step: int) -> dict | None:
        p = self._curves_path(step)
        if not p.is_file():
            return None
        with np.load(p) as z:
            return {k: z[k] for k in z.files}

    @property
    def preempted(self) -> bool:
        return self._preempted.is_set()

    def on_step(self, state: TrainState, step: int | None = None,
                extras: dict | None = None) -> None:
        """Per-step hook for the train loop: periodic async save, plus the
        preemption path — force-save the exact step, drain the write, raise.

        Pass ``step`` (a host-side counter) to avoid forcing a device sync
        on ``state.step`` every step — on a remote-TPU tunnel that fetch is
        a full roundtrip. ``extras`` carries host-side training progress
        (best val accuracy, completed epochs) so a resumed run does not
        regress the best-snapshot gate or re-train finished epochs.
        """
        if step is None:
            step = int(state.step)
        if not self.preempted and (self.save_every <= 0 or step % self.save_every):
            return  # fast path: no host<->device traffic at all
        try:
            orbax_preempted = self._mgr.reached_preemption(step)
        except Exception:  # single-process: no jax.distributed sync point
            orbax_preempted = False
        if self.preempted or orbax_preempted:
            self.maybe_save(state, force=True, step=step, extras=extras)
            self._mgr.wait_until_finished()
            raise TrainingPreempted(step)
        self.maybe_save(state, step=step, extras=extras)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    # ----------------------------------------------------------- restoring

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        return self.restore_with_extras(template, step)[0]

    def restore_with_extras(
        self, template: TrainState, step: int | None = None
    ) -> tuple[TrainState, dict]:
        """Restore (state, extras): extras holds the host-side training
        progress saved alongside the state — ``best_vacc`` (best-snapshot
        gate) and ``epochs_done`` (completed epochs), both 0 when the
        checkpoint predates them or never carried them."""
        import orbax.checkpoint as ocp

        self._mgr.wait_until_finished()  # drain in-flight async writes first
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(template))
        )
        state = TrainState(
            params=restored["params"],
            opt_state=jax.tree.unflatten(
                jax.tree.structure(template.opt_state), jax.tree.leaves(restored["opt_state"])
            ),
            step=restored["step"],
        )
        ex = restored.get("extras", {})
        extras = {
            "best_vacc": float(ex.get("best_vacc", 0.0)),
            "epochs_done": int(ex.get("epochs_done", 0)),
            "curves": self._load_curves(step),
        }
        return state, extras

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
        for sig, prev in self._prev_handlers.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, TypeError):  # not main thread / exotic handler
                pass
        self._prev_handlers.clear()


def _to_pytree(state: TrainState, extras: dict | None = None) -> dict[str, Any]:
    extras = extras or {}
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "extras": {  # 0-d ndarrays: orbax rejects bare numpy scalars
            "best_vacc": np.asarray(extras.get("best_vacc", 0.0), np.float32),
            "epochs_done": np.asarray(extras.get("epochs_done", 0), np.int64),
        },
    }
