"""Training engine: losses, jitted train/eval steps, sweep, snapshots."""

from .losses import bce_with_logits_pos_weight, focal_bce_loss, masked_graph_loss  # noqa: F401
from .loop import TrainState, make_train_step, make_eval_step, train_model, TrainResult  # noqa: F401
from .sweep import ParamSweepContext  # noqa: F401
from .snapshot import save_snapshot, load_snapshot  # noqa: F401
