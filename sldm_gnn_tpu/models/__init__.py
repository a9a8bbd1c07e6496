"""Flax model zoo: GraphSAGE blocks, map encoder/attention, GruSage."""

from .blocks import SageConv, SageBlock, MLPStack  # noqa: F401
from .map_modules import MapData, MapEncoder, MapSpatialAttention, map_zscore_norm  # noqa: F401
from .grusage import GruSage, GruSageConfig  # noqa: F401
from .attention import AttentionConv, AttentionBlock, edge_softmax  # noqa: F401
from .sampled_sage import SampledSage  # noqa: F401
