"""Model snapshot I/O.

Parity target: /root/reference/src/utils.py:22-50 — a snapshot bundles
``{state_dict (sans map encoder), ip_dict (ctor args + baked map embeddings
+ centroids), norm_stat_dict, train_prior, loss_info}`` so evaluation and
serving can rebuild the model (with a frozen map branch) and normalize
inputs identically without access to the original map tensors.

Format here: a single ``.npz``-backed pickle of numpy trees (python pickle
protocol over host arrays). Step-level orbax checkpointing for mid-training
resume lives in :mod:`sldm_gnn_tpu.train.checkpoint` as a superset.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..models.grusage import GruSageConfig

SNAPSHOT_KEYS = ("params", "config", "norm_stat_dict", "train_prior", "loss_info")


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _strip_map_encoder(params: dict) -> dict:
    """Drop the live map-encoder weights; inference uses baked embeddings
    (reference: state_dict_no_mapenc, grusage.py:141-142)."""
    return {k: v for k, v in params.items() if k != "map_encoder"}


def save_snapshot(
    path: Path | str,
    *,
    params: dict,
    config: GruSageConfig,
    norm_stat_dict: dict | None = None,
    train_prior: float | None = None,
    loss_info: dict | None = None,
    map_embeddings: np.ndarray | None = None,
    map_centroids: np.ndarray | None = None,
    keep_map_encoder: bool = False,
) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    params_np = _to_numpy_tree(params)
    if not keep_map_encoder:
        params_np = _strip_map_encoder(dict(params_np))
    payload = {
        "params": params_np,
        "config": config.to_dict(),
        "norm_stat_dict": _to_numpy_tree(norm_stat_dict) if norm_stat_dict else None,
        "train_prior": train_prior,
        "loss_info": loss_info,
        "map_embeddings": np.asarray(map_embeddings) if map_embeddings is not None else None,
        "map_centroids": np.asarray(map_centroids) if map_centroids is not None else None,
        "format_version": 1,
    }
    with open(p, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_snapshot(path: Path | str) -> dict:
    p = Path(path)
    if not p.is_file():
        raise FileNotFoundError(f"snapshot not found: {p}")
    with open(p, "rb") as f:
        snap = pickle.load(f)
    for key in ("params", "config"):
        if key not in snap:
            raise ValueError(f"snapshot at {p} missing required key '{key}'")
    for key in ("norm_stat_dict", "train_prior", "loss_info", "map_embeddings", "map_centroids"):
        snap.setdefault(key, None)
    snap["config"] = GruSageConfig.from_dict(snap["config"])
    return snap
