"""Data-augmentation transforms as pure functions on host graphs.

Parity: /root/reference/src/transforms.py —
  * ``AddNoise``: gaussian noise on masked feature channels, std either
    fixed or speed-proportional ``(1 - exp(-speed/10)) * std_max``
    (:16-21, :33);
  * ``CutFrames``: truncate the time axis for early-prediction experiments
    (:44-51);
  * ``RemoveDimsFeatures``: drop the width/length static features (:36-42)
    — here zeroed rather than deleted, since the padded-batch layout is
    fixed (the model then sees constant-zero dims, equivalent information
    content).

Transforms run before z-score normalization (main.py:147-155 ordering).
Stochastic transforms take an explicit ``numpy.random.Generator`` — the
loader threads a per-epoch generator through, keeping runs reproducible.
"""

from __future__ import annotations

import numpy as np

from ..graph.containers import GraphArrays
from ..utils.metadata import MetaData


class AddNoise:
    stochastic = True

    def __init__(
        self,
        target: str,
        std: float,
        metadata: MetaData,
        prop_to_speed: bool = False,
    ):
        self._std = std
        self.mask = metadata.get_features_mask(target)
        self.speed_mask = metadata.get_features_mask("speed")
        self.prop_to_speed = prop_to_speed

    def __call__(self, g: GraphArrays, rng: np.random.Generator | None = None) -> GraphArrays:
        rng = rng or np.random.default_rng()
        x = g.x.copy()
        sel = x[:, :, self.mask]
        if self.prop_to_speed:
            speed = x[:, :, self.speed_mask]
            std = (1.0 - np.exp(-speed / 10.0)) * self._std
        else:
            std = self._std
        x[:, :, self.mask] = sel + rng.standard_normal(sel.shape).astype(np.float32) * std
        return GraphArrays(
            x=x, xsttype=g.xsttype, xdims=g.xdims,
            edge_index=g.edge_index, edge_attr=g.edge_attr, y=g.y, pos_raw=g.pos_raw,
        )


class CutFrames:
    stochastic = False

    def __init__(self, cut: int):
        self.cut = cut

    def __call__(self, g: GraphArrays) -> GraphArrays:
        return GraphArrays(
            x=g.x[:, : self.cut, :], xsttype=g.xsttype, xdims=g.xdims,
            edge_index=g.edge_index, edge_attr=g.edge_attr, y=g.y,
            pos_raw=g.pos_raw[:, : self.cut, :] if g.pos_raw is not None else None,
        )


class RemoveDimsFeatures:
    stochastic = False

    def __init__(self, metadata: MetaData | None = None):
        pass

    def __call__(self, g: GraphArrays) -> GraphArrays:
        return GraphArrays(
            x=g.x, xsttype=g.xsttype, xdims=np.zeros_like(g.xdims),
            edge_index=g.edge_index, edge_attr=g.edge_attr, y=g.y, pos_raw=g.pos_raw,
        )


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)
        self.stochastic = any(getattr(t, "stochastic", False) for t in self.transforms)

    def __call__(self, g: GraphArrays, rng: np.random.Generator | None = None) -> GraphArrays:
        for t in self.transforms:
            g = t(g, rng) if getattr(t, "stochastic", False) else t(g)
        return g
