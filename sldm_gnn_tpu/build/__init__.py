"""Vectorized graph construction (offline + online) and map building.

Replaces the reference's interpreted-Python hot loops
(/root/reference/src/gbuilder.py): pack tensorization, O(V²·F) trajectory
proximity edges and O(S²) map edges all become dense masked array ops,
with an optional C++ kernel (native/) for the batch ETL path.
"""

from .tensorize import tensorize_pack, rescale_to_center, build_trajectory_edges  # noqa: F401
from .vehicle import GraphsBuilder, pack_to_graph  # noqa: F401
from .map_builder import MapBuilder, build_map_edges, load_map_data  # noqa: F401
from .online import GraphOnlineCreator  # noqa: F401
