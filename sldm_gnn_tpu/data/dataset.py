"""Dataset over built ``pack_*.npz`` graph shards.

Parity: /root/reference/src/dataset.py ``MapGraph`` — sorted shard list,
per-item transform then z-score normalization (presence flag excluded,
``pos_raw`` stashed *after* transforms, *before* normalization,
dataset.py:83-87), raw-data context, id-addressed access, and the
presence-masked two-pass mean/std (``computeMuSigma``, :107-149) — here a
single vectorized masked reduction instead of a per-vehicle Python loop.

TPU-first difference: shards are loaded once into host memory (the
reference re-``torch.load``s every item every epoch inside the training hot
loop, :75-77); transforms/normalization are cheap numpy ops at collation
time.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from pathlib import Path
from typing import Callable

import numpy as np

from ..graph.containers import GraphArrays
from ..utils.metadata import MetaData

_PACK_RE = re.compile(r"pack_(\d+)\.npz")


def _load_npz(path: Path) -> GraphArrays:
    z = np.load(path)
    return GraphArrays(
        x=z["x"].astype(np.float32),
        xsttype=z["xsttype"].astype(np.int32),
        xdims=z["xdims"].astype(np.float32),
        edge_index=z["edge_index"].astype(np.int32).reshape(2, -1),
        edge_attr=z["edge_attr"].astype(np.float32).reshape(-1, 4),
        y=z["y"].astype(np.float32) if "y" in z.files else None,
    )


def compute_mu_sigma(graphs: list[GraphArrays]) -> tuple[dict, dict]:
    """Presence-masked feature stats over the whole dataset.

    Returns ({"x": [1,1,C-1], "xdims": [1,2]}, same for sigma) matching the
    reference's shapes and clamping (sigma_x clamped >= 1e-8, sigma_xdims
    unclamped — dataset.py:144-148).
    """
    nfeat = graphs[0].x.shape[2] - 1
    sum_x = np.zeros(nfeat, np.float64)
    sum_x2 = np.zeros(nfeat, np.float64)
    cnt = 0
    sum_d = np.zeros(2, np.float64)
    sum_d2 = np.zeros(2, np.float64)
    vcnt = 0
    for g in graphs:
        pm = g.x[:, :, -1] > 0.5
        feats = g.x[:, :, :-1][pm]  # [n_present, nfeat]
        sum_x += feats.sum(0)
        sum_x2 += (feats.astype(np.float64) ** 2).sum(0)
        cnt += int(pm.sum())
        sum_d += g.xdims.sum(0)
        sum_d2 += (g.xdims.astype(np.float64) ** 2).sum(0)
        vcnt += g.xdims.shape[0]

    mu_x = sum_x / max(cnt, 1)
    sigma_x = np.sqrt(np.maximum(sum_x2 / max(cnt, 1) - mu_x**2, 0.0))
    sigma_x = np.maximum(sigma_x, 1e-8)
    mu_d = sum_d / max(vcnt, 1)
    sigma_d = np.sqrt(np.maximum(sum_d2 / max(vcnt, 1) - mu_d**2, 0.0))
    mu = {
        "x": mu_x.reshape(1, 1, nfeat).astype(np.float32),
        "xdims": mu_d.reshape(1, 2).astype(np.float32),
    }
    sigma = {
        "x": sigma_x.reshape(1, 1, nfeat).astype(np.float32),
        "xdims": sigma_d.reshape(1, 2).astype(np.float32),
    }
    return mu, sigma


class GraphDataset:
    def __init__(
        self,
        graphs_dirpath: Path | str,
        *,
        transform: Callable | None = None,
        normalize_zscore: bool = True,
        metadata: MetaData | None = None,
        zscore_mu_sigma: tuple[dict, dict] | None = None,
    ):
        self.dirpath = Path(graphs_dirpath).resolve()
        if metadata is None:
            metadata = MetaData.load_json(self.dirpath / "metadata.json")
        self.metadata = metadata
        self.frames_num = metadata.frames_num
        self.active_labels = list(metadata.active_labels)

        self.paths = sorted(self.dirpath.glob("*.npz"))
        self.pack_ids = []
        self._by_pid = {}
        for i, p in enumerate(self.paths):
            m = _PACK_RE.fullmatch(p.name)
            pid = int(m.group(1)) if m else -1
            self.pack_ids.append(pid)
            self._by_pid[pid] = i
        self._graphs = [_load_npz(p) for p in self.paths]

        self.transform = transform
        self.normalize_zscore = normalize_zscore
        self.mu = self.sigma = None
        if normalize_zscore:
            if zscore_mu_sigma is not None:
                self.mu, self.sigma = zscore_mu_sigma
            else:
                self.mu, self.sigma = compute_mu_sigma(self._graphs)

    def __len__(self) -> int:
        return len(self._graphs)

    def get_mu_sigma(self) -> tuple[dict, dict]:
        if self.mu is None or self.sigma is None:
            self.mu, self.sigma = compute_mu_sigma(self._graphs)
        return self.mu, self.sigma

    def get_raw(self, idx: int) -> GraphArrays:
        return self._graphs[idx]

    def get_raw_by_pid(self, pid: int) -> GraphArrays:
        if pid not in self._by_pid:
            raise FileNotFoundError(f"no graph for pack id {pid} in {self.dirpath}")
        return self._graphs[self._by_pid[pid]]

    def __getitem__(self, idx: int) -> GraphArrays:
        return self.get(idx)

    def get(self, idx: int, rng: np.random.Generator | None = None) -> GraphArrays:
        g = self._graphs[idx]
        # copy mutable arrays so transforms don't corrupt the cache
        x = g.x.copy()
        xdims = g.xdims.copy()
        g = GraphArrays(
            x=x, xsttype=g.xsttype, xdims=xdims,
            edge_index=g.edge_index, edge_attr=g.edge_attr, y=g.y,
        )
        if self.transform is not None:
            g = self.transform(g, rng) if _wants_rng(self.transform) else self.transform(g)
        if self.normalize_zscore:
            pos_raw = g.x[:, :, :2].copy()
            x = g.x.copy()
            x[:, :, :-1] = (x[:, :, :-1] - self.mu["x"]) / self.sigma["x"]
            xdims = (g.xdims - self.mu["xdims"]) / self.sigma["xdims"]
            g = GraphArrays(
                x=x, xsttype=g.xsttype, xdims=xdims.astype(np.float32),
                edge_index=g.edge_index, edge_attr=g.edge_attr, y=g.y, pos_raw=pos_raw,
            )
        return g

    @contextmanager
    def using_raw_data(self):
        """Temporarily disable transforms + normalization
        (reference: dataset.py:91-105)."""
        prev_norm, prev_tf = self.normalize_zscore, self.transform
        self.normalize_zscore, self.transform = False, None
        try:
            yield self
        finally:
            self.normalize_zscore, self.transform = prev_norm, prev_tf


def _wants_rng(tf) -> bool:
    return getattr(tf, "stochastic", False)
