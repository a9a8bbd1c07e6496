"""Dataset + loader layer over built graph shards."""

from .dataset import GraphDataset, compute_mu_sigma  # noqa: F401
from .transforms import AddNoise, CutFrames, RemoveDimsFeatures, Compose  # noqa: F401
from .loader import GraphLoader  # noqa: F401
from .prefetch import prefetch, prefetch_to_device  # noqa: F401
