"""Dataset metadata contract.

Parity: /root/reference/src/utils.py:121-168 ``MetaData`` — the
``metadata.json`` written next to built graphs and the feature-mask helper
used by augmentation transforms.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, asdict
from pathlib import Path

import numpy as np

# final temporal feature layout per frame (reference: gbuilder.py:45,114-118)
FEATURE_NAMES = ["X", "Y", "Speed", "HeadingSin", "HeadingCos", "PresenceFlag"]

_MASKS = {
    "x": [0],
    "y": [1],
    "pos": [0, 1],
    "speed": [2],
    "heading": [3, 4],
    "hsin": [3],
    "hcos": [4],
}


@dataclass
class MetaData:
    n_samples: int
    n_positive: int | None
    n_edge_features: int
    frames_num: int
    m_radius: float
    active_labels: list[int]

    @property
    def n_node_temporal_features(self) -> int:
        # X, Y, Speed + PresenceFlag + heading sin/cos (utils.py:131-132)
        return 3 + 1 + 2

    def neg_over_pos_ratio(self) -> float:
        if not self.n_positive:
            raise ValueError("n_positive is zero/unknown; cannot compute neg/pos ratio")
        return (self.n_samples - self.n_positive) / self.n_positive

    def get_features_mask(self, selector: str) -> np.ndarray:
        if selector not in _MASKS:
            raise ValueError(f"Unknown feature-mask selector '{selector}'")
        msk = np.zeros(self.n_node_temporal_features, dtype=bool)
        msk[_MASKS[selector]] = True
        return msk

    def to_json(self, path: Path | str) -> None:
        with open(Path(path), "w", encoding="utf-8") as f:
            json.dump(asdict(self), f, indent=4, ensure_ascii=False)

    @staticmethod
    def load_json(path: Path | str) -> "MetaData":
        with open(Path(path), "r", encoding="utf-8") as f:
            return MetaData(**json.load(f))
