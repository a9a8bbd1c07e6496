"""Static-shape graph containers and batch collation."""

from .containers import PaddedGraphBatch, GraphArrays  # noqa: F401
from .batching import pad_and_batch, BatchDims, compute_batch_dims  # noqa: F401
from .layout_io import save_layout, load_layout, cached_layouts  # noqa: F401
