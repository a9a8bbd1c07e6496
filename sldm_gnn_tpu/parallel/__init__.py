"""Multi-chip SPMD execution: meshes, data-parallel training, and
edge-partitioned graph aggregation over ICI/DCN.

The reference has no distributed layer at all (SURVEY.md §2.4 — its only
parallelism is host-side process pools); this package is the new capability
mandated by BASELINE.json: scale GraphSAGE training/aggregation across a
TPU pod slice with JAX collectives, no NCCL/MPI translation.
"""

from .mesh import make_mesh, maybe_initialize_distributed  # noqa: F401
from .data_parallel import shard_batch, make_dp_train_step  # noqa: F401
from .edge_partition import (  # noqa: F401
    partition_edges,
    sharded_mean_aggregate,
    make_sharded_sage_step,
)
from .halo import (  # noqa: F401
    HaloPlan,
    HaloPlanSplit,
    HaloBlockedPlan,
    plan_halo_partition,
    plan_halo_blocked,
    split_halo_plan,
    halo_aggregate,
    halo_aggregate_overlapped,
    halo_aggregate_pallas,
    make_halo_sage_step,
    make_halo_pallas_sage_step,
)
from .halo_fused import (  # noqa: F401
    CompactBoundary,
    HaloFusedPlan,
    plan_halo_fused,
    halo_fused_sage,
    halo_fused_sage_ln,
    halo_fused_sage_ln_ov,
    halo_fused_sage_ov,
)
from .halo_model import (  # noqa: F401
    HaloDims,
    HaloSageClassifier,
    build_halo_step_fns,
    train_halo_classifier,
)
from .streamed import (  # noqa: F401
    StreamedHaloPlanner,
    load_streamed_halo_fused_plan,
    load_streamed_halo_plan,
)
