"""Step-level checkpoint/resume via orbax.

A superset of the reference's best-snapshot-only persistence (SURVEY.md
§5.4: "No mid-training resume"): full TrainState (params + optimizer
moments + step) is checkpointed every N steps with retention, and training
resumes exactly from the latest step. The rich *model snapshot* for
eval/serving stays in :mod:`sldm_gnn_tpu.train.snapshot` — this module is
about fault tolerance of long runs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

from .loop import TrainState


class CheckpointManager:
    def __init__(self, directory: Path | str, *, max_to_keep: int = 3, save_every: int = 100):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def maybe_save(self, state: TrainState, *, force: bool = False) -> bool:
        import orbax.checkpoint as ocp

        step = int(state.step)
        if not force and (self.save_every <= 0 or step % self.save_every != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
        self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(template))
        )
        return TrainState(
            params=restored["params"],
            opt_state=jax.tree.unflatten(
                jax.tree.structure(template.opt_state), jax.tree.leaves(restored["opt_state"])
            ),
            step=restored["step"],
        )

    def close(self):
        self._mgr.close()


def _to_pytree(state: TrainState) -> dict[str, Any]:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
