"""Flax model zoo: GraphSAGE blocks, map encoder/attention, GruSage."""

from .blocks import SageConv, SageBlock, MLPStack  # noqa: F401
from .map_modules import (  # noqa: F401
    MapData,
    MapEncoder,
    MapSpatialAttention,
    ShardedMapData,
    map_zscore_norm,
    shard_map_data_segments,
)
from .grusage import GruSage, GruSageConfig  # noqa: F401
from .attention import AttentionConv, AttentionBlock, edge_softmax  # noqa: F401
from .sampled_sage import SampledSage  # noqa: F401
