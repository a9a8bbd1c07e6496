"""SpMM — weighted sparse aggregation of node features along edges.

The hot op of the framework (BASELINE: edges/s/chip on 2-layer GraphSAGE).
Computes, for each node i: ``out[i] = sum_{(j->i)} w_e * x[j]``; with
``w_e = 1/deg(i)`` this is the SAGEConv mean aggregation.

Two backends:

  * ``spmm_xla`` — gather + ``segment_sum``; reference implementation and
    CPU path.
  * ``spmm_pallas`` — Pallas TPU kernel over the blocked edge layout
    (:mod:`sldm_gnn_tpu.graph.csr`). Per 128-edge chunk, gather and
    scatter are expressed as two one-hot matmuls on the MXU:

        G   = onehot(src_local) @ X[src_block]          # [EC, D] gather
        ACC += (w * onehot(dst_local))^T @ G            # [TILE, D] scatter

    Scalar-prefetched block metadata steers the BlockSpec index maps, so
    the kernel streams exactly the X tiles it needs and accumulates each
    output tile across consecutive grid steps (chunks are sorted by dst
    block), writing it back once. No per-row DMA, no scatter hardware
    needed — the systolic array does the data movement.

Backward: d/dx of a weighted-sum aggregation is the same aggregation over
the reversed edges with the same weights, so the custom VJP runs the same
kernel on a transposed ``BlockedEdges`` (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import TILE, EDGE_CHUNK, BlockedEdges, auto_edge_chunk, block_edges, mean_weights, pad_nodes


# ---------------------------------------------------------------- XLA path


def spmm_xla(x, src, dst, weight, num_nodes: int):
    """Gather + segment-sum reference path (runs on any backend)."""
    msgs = x[src] * weight[:, None].astype(x.dtype)
    return jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)


# ------------------------------------------------------------- Pallas path


def _operand_vma(*arrays):
    """Union of the operands' varying-manual-axes — under shard_map with
    checked replication (jax 0.9 check_vma), pallas_call must declare how
    its output varies across mesh axes; the output of these kernels varies
    exactly as the union of their inputs does. Outside shard_map every
    vma is empty, so this is a no-op there."""
    vma = frozenset()
    for a in arrays:
        vma = vma | jax.typeof(a).vma
    return vma


def _spmm_kernel(dblk_ref, sblk_ref, src_ref, dst_ref, w_ref, *x_out_acc, precision, k_per_step):
    from jax.experimental import pallas as pl

    x_refs = x_out_acc[:k_per_step]
    out_ref, acc_ref = x_out_acc[k_per_step], x_out_acc[k_per_step + 1]

    w = pl.program_id(0)
    num_w = pl.num_programs(0)

    # one grid step handles k_per_step chunks sharing one dst block
    dst_blk = dblk_ref[w * k_per_step]
    prev_dst = dblk_ref[jnp.maximum(w - 1, 0) * k_per_step]
    is_first = jnp.logical_or(w == 0, dst_blk != prev_dst)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ec = src_ref.shape[-1]
    tile = x_refs[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ec, tile), 1)
    for k in range(k_per_step):
        if precision == jax.lax.Precision.HIGHEST:
            # exact f32 path (parity-sensitive callers)
            onehot_s = (src_ref[0, k][:, None] == lane).astype(jnp.float32)
            gathered = jnp.dot(
                onehot_s, x_refs[k][:], preferred_element_type=jnp.float32,
                precision=precision,
            )
            onehot_d = (dst_ref[0, k][:, None] == lane).astype(jnp.float32) * w_ref[0, k][:, None]
            acc_ref[:] += jnp.dot(
                onehot_d.T, gathered, preferred_element_type=jnp.float32,
                precision=precision,
            )
        else:
            # fast path: single-pass bf16 MXU operands, f32 accumulation.
            # one-hots are exact in bf16; x and the per-edge weights round to
            # bf16 (~1e-3 relative). (The A-matrix form — building the dense
            # block adjacency first — has 25% fewer FLOPs but measured slower:
            # the smaller dependent matmuls utilize the MXU worse.)
            onehot_s = (src_ref[0, k][:, None] == lane).astype(jnp.bfloat16)
            gathered = jnp.dot(
                onehot_s, x_refs[k][:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            onehot_d = (dst_ref[0, k][:, None] == lane).astype(jnp.float32) * w_ref[0, k][:, None]
            acc_ref[:] += jnp.dot(
                onehot_d.T.astype(jnp.bfloat16),
                gathered.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

    nxt_dst = dblk_ref[jnp.minimum(w + 1, num_w - 1) * k_per_step]
    is_last = jnp.logical_or(w == num_w - 1, dst_blk != nxt_dst)

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def spmm_pallas(
    x: jax.Array,
    blocked: BlockedEdges,
    num_nodes: int,
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    k_per_step: int = 1,
):
    """Blocked SpMM on TPU. ``x`` must be padded to a multiple of TILE rows;
    returns [num_nodes_padded, D] sums.

    ``precision`` controls the MXU passes of the one-hot matmuls: DEFAULT
    (bf16 operands, fastest, ~1e-3 relative error on f32 inputs) or HIGHEST
    (bit-accurate f32 at ~3x MXU cost) for parity-sensitive paths.

    ``x`` may be bfloat16: DEFAULT precision already rounds the gathered
    operand to bf16 inside the kernel, so storing features as bf16 loses no
    additional accuracy while halving the dominant X-tile streaming
    bandwidth (BASELINE.md floor analysis). The accumulator stays f32; the
    output adopts ``x.dtype``. HIGHEST precision requires f32 input.

    ``k_per_step`` processes K chunks per grid step (the layout must have
    been built with ``step_chunks=K`` so chunk groups share a dst block),
    amortizing per-grid-step overhead.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    tile = blocked.tile
    assert n_pad % tile == 0, f"x rows {n_pad} not a multiple of {tile}"
    if precision == jax.lax.Precision.HIGHEST and x.dtype != jnp.float32:
        raise ValueError(f"HIGHEST-precision SpMM requires f32 input, got {x.dtype}")
    W = blocked.num_chunks
    ec = blocked.src_local.shape[1]
    K = k_per_step
    if W % K:
        raise ValueError(
            f"num_chunks {W} not divisible by k_per_step {K}; build the layout "
            f"with block_edges(..., step_chunks={K})"
        )
    if K > 1 and blocked.step_chunks % K:
        # W % K can pass by coincidence while grid steps straddle dst
        # blocks, silently accumulating one block's edges into another —
        # the layout's per-block chunk multiple must carry K
        raise ValueError(
            f"layout built with step_chunks={blocked.step_chunks} cannot run "
            f"at k_per_step={K}: per-dst-block chunk counts must be a "
            f"multiple of K (rebuild with step_chunks={K})"
        )
    steps = W // K

    # TPU tiling requires the last two block dims to be (8k, 128m) or equal
    # to the array dims — lift the chunk arrays to [steps, K, EC] so the
    # (1, K, EC) trailing block equals the array's trailing dims.
    src3 = blocked.src_local.reshape(steps, K, ec)
    dst3 = blocked.dst_local.reshape(steps, K, ec)
    w3 = blocked.weight.reshape(steps, K, ec)

    dblk = blocked.block_meta[:, 0]
    sblk = blocked.block_meta[:, 1]

    def chunk_spec():
        return pl.BlockSpec((1, K, ec), lambda w, dblk, sblk: (w, 0, 0))

    def x_spec(k):
        return pl.BlockSpec((tile, d), lambda w, dblk, sblk, k=k: (sblk[w * K + k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # 1-D dst/src block ids (2-D SMEM arrays lane-pad to 128)
        grid=(steps,),
        in_specs=[chunk_spec(), chunk_spec(), chunk_spec()]
        + [x_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec((tile, d), lambda w, dblk, sblk: (dblk[w * K], 0)),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
    )
    flops = 2 * 2 * W * ec * tile * d
    return pl.pallas_call(
        partial(_spmm_kernel, precision=precision, k_per_step=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), x.dtype,
            vma=_operand_vma(x, blocked.block_meta, blocked.weight)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(W * tile * d + n_pad * d) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dblk, sblk, src3, dst3, w3, *([x] * K))


# ------------------------------------------------------- int8 Pallas path


def _spmm_int8_kernel(dblk_ref, sblk_ref, src_ref, dst_ref, w_ref, *refs, k_per_step):
    from jax.experimental import pallas as pl

    K = k_per_step
    xq_refs = refs[:K]
    xs_refs = refs[K : 2 * K]
    out_ref, acc_ref = refs[2 * K], refs[2 * K + 1]

    w = pl.program_id(0)
    num_w = pl.num_programs(0)
    dst_blk = dblk_ref[w * K]
    prev_dst = dblk_ref[jnp.maximum(w - 1, 0) * K]
    is_first = jnp.logical_or(w == 0, dst_blk != prev_dst)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ec = src_ref.shape[-1]
    tile = xq_refs[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ec, tile), 1)
    for k in range(K):
        src_oh = src_ref[0, k][:, None] == lane
        # int8 gather on the MXU's int8 rate: the one-hot SELECTS one row
        # per edge (no summation), so entries stay in [-127, 127] and the
        # downcast to bf16 below is exact
        gq = jnp.dot(
            src_oh.astype(jnp.int8), xq_refs[k][:], preferred_element_type=jnp.int32
        )  # [EC, D]
        # per-edge src-row scale via a skinny one-hot matmul [EC,T]@[T,1]
        sg = jnp.dot(
            src_oh.astype(jnp.float32), xs_refs[k][:], preferred_element_type=jnp.float32
        )  # [EC, 1]
        # fold dequant scale into the scatter weights (cheaper than scaling
        # the [EC, D] gathered block)
        onehot_d = (dst_ref[0, k][:, None] == lane).astype(jnp.float32) * (
            w_ref[0, k][:, None] * sg
        )
        acc_ref[:] += jnp.dot(
            onehot_d.T.astype(jnp.bfloat16),
            gq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    nxt_dst = dblk_ref[jnp.minimum(w + 1, num_w - 1) * K]
    is_last = jnp.logical_or(w == num_w - 1, dst_blk != nxt_dst)

    @pl.when(is_last)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def spmm_pallas_int8(
    xq: jax.Array,
    xs: jax.Array,
    blocked: BlockedEdges,
    num_nodes: int,
    *,
    interpret: bool = False,
    k_per_step: int = 1,
    out_dtype=jnp.float32,
):
    """Blocked SpMM over per-row-quantized int8 features (inference path).

    ``xq [n_pad, D] int8`` with per-row scales ``xs [n_pad, 1] f32`` (from
    :func:`sldm_gnn_tpu.ops.quant.quantize_rows_pallas`). The gather matmul
    runs at the MXU's int8 rate and streams X at 1 byte/element — half the
    bf16 path's HBM traffic; output equals ``spmm(dequant(xq, xs))`` up to
    bf16 scatter rounding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = xq.shape
    assert xq.dtype == jnp.int8, xq.dtype
    assert xs.shape == (n_pad, 1), xs.shape
    tile = blocked.tile
    assert n_pad % tile == 0
    W = blocked.num_chunks
    ec = blocked.src_local.shape[1]
    K = k_per_step
    if W % K:
        raise ValueError(f"num_chunks {W} not divisible by k_per_step {K}")
    steps = W // K

    src3 = blocked.src_local.reshape(steps, K, ec)
    dst3 = blocked.dst_local.reshape(steps, K, ec)
    w3 = blocked.weight.reshape(steps, K, ec)
    dblk = blocked.block_meta[:, 0]
    sblk = blocked.block_meta[:, 1]

    def chunk_spec():
        return pl.BlockSpec((1, K, ec), lambda w, dblk, sblk: (w, 0, 0))

    def xq_spec(k):
        return pl.BlockSpec((tile, d), lambda w, dblk, sblk, k=k: (sblk[w * K + k], 0))

    def xs_spec(k):
        return pl.BlockSpec((tile, 1), lambda w, dblk, sblk, k=k: (sblk[w * K + k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[chunk_spec(), chunk_spec(), chunk_spec()]
        + [xq_spec(k) for k in range(K)]
        + [xs_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec((tile, d), lambda w, dblk, sblk: (dblk[w * K], 0)),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_spmm_int8_kernel, k_per_step=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), out_dtype,
            vma=_operand_vma(xq, xs, blocked.block_meta, blocked.weight)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * W * ec * tile * d,
            bytes_accessed=W * tile * d + n_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dblk, sblk, src3, dst3, w3, *([xq] * K), *([xs] * K))


def _spmm_int8_pt_kernel(dblk_ref, sblk_ref, scale_ref, src_ref, dst_ref, w_ref,
                         *refs, k_per_step):
    from jax.experimental import pallas as pl

    K = k_per_step
    xq_refs = refs[:K]
    out_ref, acc_ref = refs[K], refs[K + 1]

    w = pl.program_id(0)
    num_w = pl.num_programs(0)
    dst_blk = dblk_ref[w * K]
    prev_dst = dblk_ref[jnp.maximum(w - 1, 0) * K]
    is_first = jnp.logical_or(w == 0, dst_blk != prev_dst)

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ec = src_ref.shape[-1]
    tile = xq_refs[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ec, tile), 1)
    for k in range(K):
        src_oh = src_ref[0, k][:, None] == lane
        # int8 gather at the MXU's int8 rate; selection only, so values stay
        # in [-127, 127] and the bf16 downcast below is exact
        gq = jnp.dot(
            src_oh.astype(jnp.int8), xq_refs[k][:], preferred_element_type=jnp.int32
        )  # [EC, D]
        onehot_d = (dst_ref[0, k][:, None] == lane).astype(jnp.float32) * w_ref[0, k][:, None]
        acc_ref[:] += jnp.dot(
            onehot_d.T.astype(jnp.bfloat16),
            gq.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    nxt_dst = dblk_ref[jnp.minimum(w + 1, num_w - 1) * K]
    is_last = jnp.logical_or(w == num_w - 1, dst_blk != nxt_dst)

    @pl.when(is_last)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[0]).astype(out_ref.dtype)


def spmm_pallas_int8_pt(
    xq: jax.Array,
    scale: jax.Array,
    blocked: BlockedEdges,
    num_nodes: int,
    *,
    interpret: bool = False,
    k_per_step: int = 1,
    out_dtype=jnp.float32,
):
    """Blocked SpMM over per-TENSOR-quantized int8 features.

    ``xq [n_pad, D] int8`` with ONE scalar scale ``scale [1] f32`` (from
    :func:`sldm_gnn_tpu.ops.quant.quantize_tensor_xla`). Unlike
    :func:`spmm_pallas_int8` (per-row scales), dequantization is a single
    scalar multiply folded into the output write — no per-edge scale gather
    matmul — so the kernel does exactly the bf16 path's FLOPs while
    streaming X at 1 byte/element. The speed play when per-tensor
    quantization error is acceptable; output equals
    ``spmm(scale * xq)`` up to bf16 scatter rounding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = xq.shape
    assert xq.dtype == jnp.int8, xq.dtype
    assert scale.shape == (1,), scale.shape
    tile = blocked.tile
    assert n_pad % tile == 0
    W = blocked.num_chunks
    ec = blocked.src_local.shape[1]
    K = k_per_step
    if W % K:
        raise ValueError(f"num_chunks {W} not divisible by k_per_step {K}")
    steps = W // K

    src3 = blocked.src_local.reshape(steps, K, ec)
    dst3 = blocked.dst_local.reshape(steps, K, ec)
    w3 = blocked.weight.reshape(steps, K, ec)
    dblk = blocked.block_meta[:, 0]
    sblk = blocked.block_meta[:, 1]

    def chunk_spec():
        return pl.BlockSpec((1, K, ec), lambda w, dblk, sblk, scale: (w, 0, 0))

    def xq_spec(k):
        return pl.BlockSpec((tile, d), lambda w, dblk, sblk, scale, k=k: (sblk[w * K + k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # dst/src block ids + the dequant scale
        grid=(steps,),
        in_specs=[chunk_spec(), chunk_spec(), chunk_spec()]
        + [xq_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec((tile, d), lambda w, dblk, sblk, scale: (dblk[w * K], 0)),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_spmm_int8_pt_kernel, k_per_step=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, d), out_dtype,
            vma=_operand_vma(xq, scale, blocked.block_meta, blocked.weight)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * W * ec * tile * d,
            bytes_accessed=W * tile * d + n_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dblk, sblk, scale, src3, dst3, w3, *([xq] * K))


# --------------------------------------------------- differentiable wrapper


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def spmm_apply(x, blocked_fwd: BlockedEdges, blocked_rev: BlockedEdges,
               num_nodes: int, use_pallas: bool, k_per_step: int = 1):
    """Weighted aggregation with a transpose-graph backward pass."""
    return _spmm_dispatch(x, blocked_fwd, num_nodes, use_pallas, k_per_step)


def _spmm_dispatch(x, blocked, num_nodes, use_pallas, k_per_step: int = 1):
    if use_pallas:
        return spmm_pallas(x, blocked, num_nodes, k_per_step=k_per_step)
    # XLA fallback reconstructing global indices from the blocked layout
    src = blocked.block_meta[:, 1][:, None] * blocked.tile + blocked.src_local
    dst = blocked.block_meta[:, 0][:, None] * blocked.tile + blocked.dst_local
    return spmm_xla(x, src.reshape(-1), dst.reshape(-1), blocked.weight.reshape(-1), num_nodes)


def _spmm_fwd(x, blocked_fwd, blocked_rev, num_nodes, use_pallas, k_per_step):
    return _spmm_dispatch(x, blocked_fwd, num_nodes, use_pallas, k_per_step), (blocked_rev,)


def _spmm_bwd(num_nodes, use_pallas, k_per_step, res, g):
    (blocked_rev,) = res
    dx = _spmm_dispatch(g, blocked_rev, num_nodes, use_pallas, k_per_step)
    return dx, None, None


spmm_apply.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------- host-side prep


def prepare_mean_aggregate(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    step_chunks: int = 1,
    tile: int = TILE,
    edge_chunk: int = EDGE_CHUNK,
) -> tuple[BlockedEdges, BlockedEdges, int]:
    """Build forward + reverse blocked layouts for mean aggregation.

    Returns (blocked_fwd, blocked_rev, padded_num_nodes). The mean's 1/deg
    weights ride the edges in both directions (backward of mean is the
    transpose with identical weights). ``step_chunks`` must match the
    ``k_per_step`` used at execution time; ``tile``/``edge_chunk`` tune the
    node-tile height and chunk width (v5e sweet spot: 256/512, BASELINE.md).
    """
    n_pad = pad_nodes(num_nodes, tile)
    w = mean_weights(dst, num_nodes)
    edge_chunk = auto_edge_chunk(len(src), edge_chunk)
    fwd = block_edges(src, dst, n_pad, weight=w, tile=tile, edge_chunk=edge_chunk,
                      step_chunks=step_chunks)
    rev = block_edges(dst, src, n_pad, weight=w, tile=tile, edge_chunk=edge_chunk,
                      step_chunks=step_chunks)
    return fwd, rev, n_pad
