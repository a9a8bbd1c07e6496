"""Masked K-nearest-segment selection for map spatial attention.

Reference semantics (/root/reference/src/models/map/mapattention.py:33-40):
dense pairwise euclidean distances between vehicle positions [V, 2] and map
segment centroids [S, 2], then ``topk(-dists, k)`` for the K smallest.

TPU-first design: the [V, S] distance matrix is computed as one fused
broadcasted reduction (VPU) and ``jax.lax.top_k`` runs on the negated
distances, exactly mirroring the reference's tie-breaking (torch.topk and
lax.top_k both return the lowest index on ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dists(points: jax.Array, centroids: jax.Array) -> jax.Array:
    """Euclidean distances [V, S] between points [V, 2] and centroids [S, 2]."""
    diff = points[:, None, :] - centroids[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def knn_topk(points: jax.Array, centroids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Return (dists [V, k], indices [V, k]) of the k nearest centroids."""
    d = pairwise_dists(points, centroids)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def knn_topk_sharded(
    points: jax.Array,
    centroids_local: jax.Array,
    k: int,
    axis_name: str,
    *values_local: jax.Array,
    impl: str = "topk",
) -> tuple[jax.Array, jax.Array, tuple[jax.Array, ...]]:
    """Segment-sharded KNN: local top-k, then a k-way merge over the mesh.

    For maps whose [V, S] distance matrix / [S, D] embeddings do not fit
    replicated (SURVEY.md §7 hard part 5). Runs under ``shard_map`` with
    ``centroids_local [S/P, 2]`` (and any ``values_local [S/P, ...]``, e.g.
    map embeddings) sharded contiguously over ``axis_name``; ``points``
    replicated. Each device selects its local k candidates and gathers its
    OWN rows of every value array [V, k, ...] — only k candidates per shard
    cross the interconnect (V*P*k rows total), never the full [V, S]
    matrix or the [S, D] table. A final top-k over the P*k merged
    candidates reproduces the dense result bit-for-bit, ties included:
    candidates concatenate shard-major (ascending global id blocks) and
    ``lax.top_k`` keeps the lowest position on ties — the dense call's
    lowest-global-index rule.

    ``impl='pallas'`` runs the LOCAL selection through the fused
    distance+select kernel (ops/knn_pallas) — the per-shard [V, S/P]
    distance tile never leaves VMEM; the k-way merge over the P·k
    candidates stays on XLA (P·k lanes are tiny). Right for giant maps
    where S/P is still thousands of lanes.

    Returns (dists [V, k], global indices [V, k], gathered values
    ([V, k, ...] per value array)).
    """
    s_local = centroids_local.shape[0]
    if impl == "pallas":
        from .knn_pallas import knn_topk_pallas

        # mixed-vma operands (replicated points + sharded centroids) are
        # lifted to the union inside the kernel wrapper
        d_loc, idx_loc = knn_topk_pallas(
            points, centroids_local, k,
            interpret=jax.default_backend() != "tpu")
    else:
        d_loc, idx_loc = knn_topk(points, centroids_local, k)
    idx_glob = idx_loc + jax.lax.axis_index(axis_name) * s_local
    vals_loc = [v[idx_loc] for v in values_local]  # [V, k, ...] own rows

    p = jax.lax.axis_size(axis_name)
    v = points.shape[0]
    me = jax.lax.axis_index(axis_name)

    def merge(arr):
        """[V, k, ...] -> [V, P*k, ...], REPLICATED: each device writes its
        candidates into its slice of a zero buffer and psums — exact (every
        slot has one non-zero contributor) and, unlike all_gather, typed
        replicated under checked vma (CLAUDE.md invariant: no
        check_vma=False)."""
        buf = jnp.zeros((v, p * k) + arr.shape[2:], arr.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, arr, me * k, axis=1)
        return jax.lax.psum(buf, axis_name)

    d_all = merge(d_loc)
    i_all = merge(idx_glob)
    neg, sel = jax.lax.top_k(-d_all, k)
    idx = jnp.take_along_axis(i_all, sel, axis=1)
    gathered = tuple(
        jnp.take_along_axis(
            merge(vl), sel.reshape(v, k, *([1] * (vl.ndim - 2))), axis=1)
        for vl in vals_loc
    )
    return -neg, idx, gathered
