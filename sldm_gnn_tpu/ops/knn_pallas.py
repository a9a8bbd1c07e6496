"""Fused Pallas distance + top-k select for map spatial attention.

The flagship map branch is dominated by ``lax.top_k`` over the [V, S]
vehicle-to-centroid distance matrix (~2.9 ms of a ~20 ms batch-2048 step
at V=22.5k, S=1000): XLA materializes the distances in HBM and runs a
per-row sort network over 1000 lanes, while only k=5 results survive.
This kernel fuses the whole branch: for each row block the [rb, S]
distance tile lives ONLY in VMEM, and the k nearest are selected by k
unrolled (min, lowest-index-argmin, mask) sweeps — O(k·S) VPU work per
row instead of a sort, and HBM traffic drops from O(V·S) to O(V·k).

Selection runs on d² = dx² + dy² (sqrt is monotonic, so the ordering
matches the XLA path's sqrt'd keys; only the k winners get the sqrt),
with the same tie rule: ``lax.top_k`` keeps the lowest index on equal
keys, and the iterative sweep's argmin takes the lowest index among
exact d² ties. Distances agree with the XLA path to FMA-association
rounding (~1 ulp of the squared sum; bitwise-equal in the on-chip
parity check); selected indices match exactly in practice (tested incl.
duplicate-centroid ties — the theoretical divergence is a sub-ulp d²
difference that sqrt-rounds equal exactly at the k boundary).
An argmin-based sweep variant measured SLOWER (0.812 vs 0.742 ms) —
the (min, eq-masked index-min, mask) form is the fast one on Mosaic.

Reference semantics: /root/reference/src/models/map/mapattention.py:33-40
(dense pairwise distances, ``topk(-dists, k)``). Forward-only by design:
vehicle positions are input data and centroids are the static map, so
nothing differentiates through the selection in training (the attention
MLP consumes k_dists as a primal value). Callers who differentiate
w.r.t. positions use the default XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _knn_kernel(pts_ref, cts_ref, d_out, i_out, *, k, s_real):
    px = pts_ref[:, 0:1]  # [rb, 1]
    py = pts_ref[:, 1:2]
    cx = cts_ref[0:1, :]  # [1, S]
    cy = cts_ref[1:2, :]
    dx = px - cx
    dy = py - cy
    # select on d² and sqrt only the k winners (one [rb, S] sqrt pass
    # saved; sqrt is monotonic so the selection is unchanged — measured
    # 0.742 -> 0.702 ms at V=22.5k/S=1000 on v5e)
    d = dx * dx + dy * dy  # [rb, S] — VMEM only

    rb, s_pad = d.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, s_pad), 1)
    d = jnp.where(lane < s_real, d, jnp.inf)

    kp = d_out.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    dacc = jnp.zeros((rb, kp), jnp.float32)
    iacc = jnp.zeros((rb, kp), jnp.int32)
    for j in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # [rb, 1]
        idx = jnp.min(jnp.where(d == m, lane, s_pad), axis=1, keepdims=True)
        dacc = jnp.where(col == j, m, dacc)
        iacc = jnp.where(col == j, idx, iacc)
        d = jnp.where(lane == idx, jnp.inf, d)
    d_out[:] = jnp.sqrt(dacc)
    i_out[:] = iacc


# padded column count of the kernel outputs (one store of [rb, _KP] per
# block instead of a sub-lane-width masked store; the [:k] slice outside
# is fused into the consumer by XLA)
_KP = 128


@partial(jax.jit, static_argnames=("k", "rb", "interpret"))
def knn_topk_pallas(
    points: jax.Array,
    centroids: jax.Array,
    k: int,
    *,
    rb: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused (dists [V, k], indices [V, k]) of the k nearest centroids.

    Matches :func:`ops.knn.knn_topk` (same sqrt'd keys to FMA rounding,
    same lowest-index tie rule). ``points`` [V, 2], ``centroids`` [S, 2]; both
    are padded internally (rows to the ``rb`` row-block grid, segments to
    the 128-lane boundary — padding lanes are masked to +inf before
    selection, so no sentinel coordinates are relied upon).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v = points.shape[0]
    s = centroids.shape[0]
    if k > min(s, _KP):
        raise ValueError(f"k={k} exceeds num segments ({s}) or kernel cap ({_KP})")
    vp = _round_up(max(v, 1), rb)
    sp = _round_up(s, 128)
    # under shard_map with checked replication the outputs vary exactly as
    # the union of the operands does (ops/spmm._operand_vma pattern), and
    # MIXED-vma operands (e.g. dp-varying points + replicated centroids,
    # or ep-sharded centroids + replicated points) must be lifted to that
    # union before the kernel's elementwise ops see them
    from .spmm import _operand_vma

    vma = _operand_vma(points, centroids)

    def lift(a):
        missing = tuple(vma - jax.typeof(a).vma)
        return jax.lax.pcast(a, missing, to="varying") if missing else a

    points, centroids = lift(points), lift(centroids)
    pts = jnp.pad(points.astype(jnp.float32), ((0, vp - v), (0, 0)))
    cts = jnp.pad(centroids.astype(jnp.float32), ((0, sp - s), (0, 0))).T  # [2, sp]

    d, i = pl.pallas_call(
        partial(_knn_kernel, k=k, s_real=s),
        grid=(vp // rb,),
        in_specs=[
            pl.BlockSpec((rb, 2), lambda r: (r, 0)),
            pl.BlockSpec((2, sp), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rb, _KP), lambda r: (r, 0)),
            pl.BlockSpec((rb, _KP), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vp, _KP), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((vp, _KP), jnp.int32, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts, cts)
    return d[:v, :k], i[:v, :k]
