"""TPU compute kernels: XLA-native reference paths + Pallas hot paths.

Every Pallas kernel in this package ships with a pure-``jnp`` reference
implementation used for correctness tests and CPU execution; the dispatching
wrappers pick the Pallas path on TPU backends and fall back to XLA elsewhere.
"""

from .segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    masked_mean_aggregate,
    global_mean_pool,
    global_max_pool,
)
from .gru import gru_forward, GRUParams, init_gru_params  # noqa: F401
from .knn import knn_topk  # noqa: F401
from .spmm import (  # noqa: F401
    spmm_xla,
    spmm_pallas,
    spmm_apply,
    prepare_mean_aggregate,
)
from .sddmm import sddmm_xla, sddmm_pallas, sddmm_apply, prepare_sddmm  # noqa: F401
from .spmm_dense import (  # noqa: F401
    DenseBlocks,
    spmm_dense_pallas,
    spmm_dense_xla,
    spmm_dense_apply,
    prepare_dense_mean_aggregate,
)
from .spmm_banded import (  # noqa: F401
    BandedBlocks,
    build_banded_blocks,
    prepare_banded_mean_aggregate,
    spmm_banded_apply,
    spmm_banded_pallas,
    spmm_banded_int8_pallas,
    spmm_banded_infer_int8,
    spmm_banded_xla,
    widen_banded,
)
from .spmm_hybrid import (  # noqa: F401
    HybridLayout,
    select_dense_edges,
    dense_tile_bytes,
    prepare_auto_mean_aggregate,
    prepare_hybrid_mean_aggregate,
    spmm_hybrid_apply,
)
from .sage_fused import (  # noqa: F401
    banded_sage_apply,
    banded_sage_ln_apply,
    banded_sage_fwd_pallas,
    banded_sage_bwd_pallas,
    banded_sage_ln_bwd_pallas,
)
from .banded_residual import (  # noqa: F401
    BandedResidualLayout,
    banded_residual_sage_apply,
    banded_residual_sage_ln_apply,
    prepare_banded_residual_mean_aggregate,
    spmm_banded_residual_apply,
)
