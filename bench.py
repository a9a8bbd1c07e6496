"""Headline benchmark: edges/s/chip for SpMM fwd+bwd on a 2-layer GraphSAGE.

Matches BASELINE.json's primary metric. Builds a synthetic map-like graph
(spatially local edges, the workload class of the reference's lane-segment
map graph), runs a jitted 2-layer GraphSAGE forward+backward with the
Pallas blocked-SpMM aggregation kernel, and reports edges/s. ``vs_baseline``
is the speedup over the XLA-native (gather + segment_sum) aggregation path
measured on the same hardware in the same run — the reference repo
publishes no numbers (BASELINE.md), so the XLA path is the comparator.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "edges/s/chip", "vs_baseline": R, ...}

Env knobs: BENCH_NODES, BENCH_DEG, BENCH_DIM, BENCH_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from sldm_gnn_tpu.graph.csr import pad_nodes
from sldm_gnn_tpu.ops.spmm import prepare_mean_aggregate, spmm_apply, spmm_xla
from sldm_gnn_tpu.ops.spmm_dense import DenseBlocks, prepare_dense_mean_aggregate, spmm_dense_apply
from sldm_gnn_tpu.ops.spmm_hybrid import prepare_hybrid_mean_aggregate, spmm_hybrid_apply
from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate, spmm_banded_apply
from sldm_gnn_tpu.ops.sage_fused import banded_sage_apply


def make_local_graph(n: int, deg: int, *, reach: int = 256, seed: int = 0):
    """Map-like graph: node ids follow spatial order, edges reach nearby ids."""
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n), deg)
    src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
    return src.astype(np.int64), dst.astype(np.int64)


def spmm_xla_chunked(x, src, dst, w, num_nodes, chunk=2_000_000):
    """Memory-bounded XLA aggregation: the one-shot gather+segment_sum
    materializes an [E, D] messages array (24+ GB at the ~50M-edge scale),
    so the baseline scans over fixed-size edge chunks instead."""
    e = src.shape[0]
    pad = (-e) % chunk
    src = jnp.concatenate([src, jnp.zeros(pad, src.dtype)])
    dst = jnp.concatenate([dst, jnp.full(pad, num_nodes, dst.dtype)])
    w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    nchunks = (e + pad) // chunk

    def body(acc, idx):
        s, d_, w_ = idx
        acc = acc + jax.ops.segment_sum(
            x[s] * w_[:, None], d_, num_segments=num_nodes
        )
        return acc, None

    acc0 = jnp.zeros((num_nodes, x.shape[1]), x.dtype)
    acc, _ = jax.lax.scan(
        body, acc0,
        (src.reshape(nchunks, chunk), dst.reshape(nchunks, chunk), w.reshape(nchunks, chunk)),
    )
    return acc


def two_layer_sage(params, x, agg, dtype=jnp.float32, remat=False):
    """2-layer mean-aggregate GraphSAGE. ``dtype`` is the compute/storage
    dtype of activations and layer weights inside the step (master params
    and the autodiff chain stay f32 outside). bf16 halves the SpMM kernel's
    dominant X-tile streaming bandwidth; the kernel's DEFAULT precision
    already rounds MXU operands to bf16, so bf16 storage costs no extra
    accuracy (ops/spmm.py). ``remat`` (BENCH_REMAT=1) checkpoints each
    layer — backward recomputes its [N, D] activations instead of keeping
    them live, trading one extra aggregation for several N*D temps; how
    ~100M-edge graphs fit one chip's HBM."""
    x = x.astype(dtype)
    params = jax.tree.map(lambda p: p.astype(dtype), params)

    def layer(h_in, wa, wb):
        return jnp.maximum(agg(h_in) @ wa + h_in @ wb, 0.0)

    if remat:
        layer = jax.checkpoint(layer)
    h = layer(x, params["w0a"], params["w0b"])
    h2 = layer(h, params["w1a"], params["w1b"])
    return h2.astype(jnp.float32)


def bench_step(fn, params, x, iters, *extra, inloop=False, prep=None):
    """Timed loop with a data-dependency chain (grads fold back into the
    params) so repeated dispatches are never identical — guards against
    any request-level caching in remote-execution environments. ``extra``
    args (e.g. the blocked edge layouts) are passed as traced jit arguments,
    NOT closure constants — constants get embedded in the serialized program
    and overflow remote-compile payload limits at large graph sizes.

    ``inloop=True`` runs all iterations inside ONE jitted ``fori_loop``
    (the standard fully-jitted JAX training loop): per-step dispatch cost
    — ~0.3 ms/step on the remote-relay TPU (bench_roofline.py methodology
    note) — is amortized to a single dispatch, so the number measures the
    chip, not the launch path."""

    def step(params, x, *extra):
        gp, gx = fn(params, x, *extra)
        new_params = jax.tree.map(lambda p, g: p - 1e-9 * g, params, gp)
        return new_params, x - 1e-9 * gx

    if inloop:
        @jax.jit
        def run(params, x, *extra):
            if prep is not None:
                # e.g. in-trace int4 view of the count tiles: ONCE per
                # program, amortized over the fori_loop (S4 cannot cross a
                # jit boundary on the relay — ops/spmm_banded.py)
                extra = prep(*extra)
            return jax.lax.fori_loop(
                0, iters, lambda _, c: step(*c, *extra), (params, x)
            )

        params2, x2 = run(params, x, *extra)
        jax.tree.map(lambda a: a.block_until_ready(), (params2, x2))
        float(x2.ravel()[0])  # warm value-fetch path
        t0 = time.perf_counter()
        # feed the warm run's outputs in: the timed request is never a
        # byte-identical duplicate of the warm one (same caching guard as
        # the dispatched path's per-step chaining)
        params3, x3 = run(params2, x2, *extra)
        float(x3.ravel()[0])
        return (time.perf_counter() - t0) / iters

    chained = jax.jit(step)
    params, x = chained(params, x, *extra)
    jax.tree.map(lambda a: a.block_until_ready(), (params, x))
    float(x.ravel()[0])  # warm value-fetch path
    t0 = time.perf_counter()
    for _ in range(iters):
        params, x = chained(params, x, *extra)
    # a value fetch (not just block_until_ready) closes the timing window:
    # remote-execution backends have been observed reporting readiness
    # before large repeated executions actually drain
    float(x.ravel()[0])
    return (time.perf_counter() - t0) / iters


def _vlog(msg):
    if os.environ.get("BENCH_VERBOSE"):
        print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main():
    n = int(os.environ.get("BENCH_NODES", 200_000))
    deg = int(os.environ.get("BENCH_DEG", 16))
    d = int(os.environ.get("BENCH_DIM", 128))
    # 100 iterations by default: on the remote-TPU relay, per-dispatch
    # tunnel latency is ~1 ms-scale and the closing value fetch costs an
    # RTT — at 10 iters those inflated the 4.1 ms headline step to 6.6 ms.
    # Large-graph runs (config 4, ~100 ms/step) can lower this via env.
    iters = int(os.environ.get("BENCH_ITERS", 100))

    backend = jax.default_backend()
    # BENCH_GRAPH=map: the REAL data path — a grid-city lane map through
    # the repo's own MapBuilder edge rules (skewed degree ~3, long-range
    # crossings, FILE emission order), instead of the idealized pre-sorted
    # local generator. BENCH_NODES then counts lane segments.
    graph_mode = os.environ.get("BENCH_GRAPH", "local")
    coords = None
    if graph_mode == "map":
        from sldm_gnn_tpu.data.synthetic import make_city_lane_map
        from sldm_gnn_tpu.build.map_builder import build_map_edges

        start, end, wd_, al_, ar_ = make_city_lane_map(n)
        n = len(start)
        coords = (start + end) / 2
        cache_f = (os.path.join(os.environ["BENCH_LAYOUT_CACHE"],
                                f"cityedges-n{n}.npz")
                   if os.environ.get("BENCH_LAYOUT_CACHE") else None)
        if cache_f and os.path.exists(cache_f):
            z = np.load(cache_f)
            src, dst = z["src"], z["dst"]
        else:
            t0 = time.perf_counter()
            src, dst = build_map_edges(start, end, wd_, al_, ar_)
            _vlog(f"map edge build: {time.perf_counter() - t0:.1f}s host (S={n})")
            if cache_f:
                os.makedirs(os.path.dirname(cache_f), exist_ok=True)
                np.savez(cache_f, src=src, dst=dst)
        src, dst = src.astype(np.int64), dst.astype(np.int64)
    else:
        src, dst = make_local_graph(n, deg)
    e = len(src)

    # BENCH_SHUFFLE=1: scramble node ids (simulates the FILE order real
    # builders emit — /root/reference/src/gbuilder.py:392-424) and recover
    # bandedness with the RCM pass (graph/reorder.py). The layouts and
    # features then live in the reordered id space — zero runtime cost; the
    # check is that the shuffled graph recovers the sorted-graph rate.
    # Map mode is already in file order: the reorder pass ALWAYS runs there.
    reordered = False
    if bool(int(os.environ.get("BENCH_SHUFFLE", 0))) or graph_mode == "map":
        from sldm_gnn_tpu.graph.reorder import (
            relabel_edges, reorder_for_banding, source_span_tiles)

        if graph_mode != "map":
            scramble = np.random.default_rng(2).permutation(n)
            src, dst = scramble[src], scramble[dst]
        t0 = time.perf_counter()
        # BENCH_ORDER=hilbert forces the Hilbert candidate (span ~3x wider
        # than RCM on city maps) — the order-robustness probe for the cmap
        # tier, whose A cost tracks nonzero tiles instead of contiguity
        if os.environ.get("BENCH_ORDER") == "hilbert" and coords is not None:
            from sldm_gnn_tpu.graph.reorder import hilbert_order

            perm = hilbert_order(coords)
        else:
            perm = reorder_for_banding(src, dst, n, coords=coords)
        if perm is not None:
            src, dst = relabel_edges(src, dst, perm)
            reordered = True
        _vlog(f"reorder: {time.perf_counter() - t0:.1f}s host, "
              f"span {source_span_tiles(src, dst, n)} tiles")

    # SpMM backend selection. 'dense' (ops/spmm_dense.py) turns the static
    # edge set into precomputed per-block-pair dense adjacency tiles —
    # ~10x fewer matmul FLOPs than the one-hot form on this locality graph
    # (2*pairs*T^2*D vs 4*E*T*D), measured 5.35x per aggregation on v5e.
    # Its A storage is pairs*T^2 per direction, so 'auto' falls back to the
    # one-hot kernel when fwd+rev tiles would exceed ~4 GB (huge graphs).
    spmm_backend = os.environ.get("BENCH_SPMM", "auto")
    # corrected-timing sweep (BASELINE.md): tile 128 (MXU-native, tighter A
    # tiles on reach-256 locality) + 4 dst blocks per grid step measured
    # best — 906M edges/s vs 802M at the old 256/2 defaults
    dense_tile = int(os.environ.get("BENCH_DENSE_TILE", 128))
    dense_k = int(os.environ.get("BENCH_DENSE_K", 4))  # dst blocks per grid step
    # banded backend (ops/spmm_banded.py): one windowed x DMA per K-group
    # instead of one tile per block pair — 1.38x per aggregation at K=8
    # K sweep at 200 iters: K8 3.24/3.29 ms, K12 3.18/3.20 ms (narrow/wide)
    banded_k = int(os.environ.get("BENCH_BANDED_K", 12))
    # wide=1 folds the slot axis into one [T, S*T] matmul per block —
    # measured within noise of the per-slot form (see spmm_banded.py)
    banded_wide = bool(int(os.environ.get("BENCH_BANDED_WIDE", 0)))
    # A-tile dtype. int8: mean aggregation factors EXACTLY into integer
    # count tiles + a per-node 1/deg scale (ops/spmm_dense.py), halving A's
    # HBM storage and streaming bandwidth vs bf16 — same math, same bf16
    # MXU rounding. At corrected timing int8 is FASTER outright (862M vs
    # 802M at tile 256: the kernel is A-streaming-bound, so half the bytes
    # beats the in-kernel i8->bf16 convert; the earlier "7% slower" was a
    # low-iteration artifact), so 'auto' simply means int8 for this mean
    # aggregation (exact). bf16 remains for non-factorable weighted cases.
    dense_dtype = os.environ.get("BENCH_DENSE_DTYPE", "auto")
    dense_budget = int(float(os.environ.get("BENCH_DENSE_BUDGET", 8e9)))
    nb = (n + dense_tile - 1) // dense_tile
    reach_blocks = 2 * 256 // dense_tile + 2  # make_local_graph reach=256
    a_bytes = lambda itemsize: 2 * nb * reach_blocks * dense_tile * dense_tile * itemsize
    if dense_dtype == "auto":
        dense_dtype = "int8"
    if spmm_backend == "auto":
        fits = a_bytes(1 if dense_dtype == "int8" else 2) < dense_budget
        # preference order: banded (windowed x streaming — fastest on
        # locality graphs; falls back to dense below when the graph is not
        # banded) > dense > hybrid (densest pairs within budget + one-hot
        # stragglers; degrades gracefully to pure one-hot)
        if fits:
            spmm_backend = "banded" if dense_dtype == "int8" else "dense"
        else:
            spmm_backend = "hybrid"

    # one-hot layout knobs: node-tile 512 measured best on v5e (the kernel
    # is MXU-utilization-bound; a 512-deep contraction uses the systolic
    # array better despite 2x the FLOPs; 1024 regresses on VMEM)
    k_per_step = int(os.environ.get("BENCH_K_PER_STEP", 2))
    tile = int(os.environ.get("BENCH_TILE", 512))
    edge_chunk = int(os.environ.get("BENCH_EDGE_CHUNK", 512))
    _vlog(f"backend={spmm_backend} dtype={dense_dtype} E={e}")
    # BENCH_LAYOUT_CACHE=<dir>: persist the built layouts (the edge set is
    # a pure function of the BENCH_* knobs, so the key encodes them) —
    # repeat runs at the ~50M-edge scale skip ~1-2 min of host fill
    cache_dir = os.environ.get("BENCH_LAYOUT_CACHE")

    def maybe_cached(key, build):
        if not cache_dir:
            return build()
        from sldm_gnn_tpu.graph.layout_io import cached_layouts

        return cached_layouts(cache_dir, key, build)

    if spmm_backend == "banded":
        # near-banded split first (ops/banded_residual.py): outlier blocks
        # must not dictate every block's span — e.g. a shuffled+RCM graph
        # leaves ~0.1% of edges outside a tight band, and pure banded would
        # pay the widened span on EVERY block. Empty residual (perfectly
        # banded, e.g. the sorted generator) keeps the plain banded layout.
        from sldm_gnn_tpu.ops.banded_residual import (
            banded_residual_sage_apply, prepare_banded_residual_mean_aggregate,
            spmm_banded_residual_apply)

        try:
            rlayout, n_pad = prepare_banded_residual_mean_aggregate(
                src, dst, n, tile=dense_tile, k=banded_k,
                # BENCH_BANDED_SPAN forces the banded/residual split span
                # (low-degree tuning: a tighter band + a few spilled edges
                # can beat the cost model's pick on A-bound graphs)
                span=int(os.environ["BENCH_BANDED_SPAN"])
                if os.environ.get("BENCH_BANDED_SPAN") else None,
                # cap counts at 7 (excess multiplicity spills to the
                # residual, exact) so the int4 A-tile view applies —
                # see BENCH_A_INT4 below
                count_cap=None if os.environ.get("BENCH_A_INT4", "auto") == "0"
                else 7)
        except ValueError as err:
            _vlog(f"banded build failed ({err}); falling back to dense")
            spmm_backend = "dense"
        else:
            if len(rlayout.r_src):
                spmm_backend = "banded_residual"
                blocked_fwd = jax.tree.map(jnp.asarray, rlayout)
                blocked_rev = None
                _vlog(
                    f"banded-residual layout: span "
                    f"{rlayout.banded_fwd.s_span}/{rlayout.banded_rev.s_span}, "
                    f"resid {rlayout.resid_frac:.5f} ({len(rlayout.r_src)} edges), "
                    f"slots {rlayout.m_fwd}/{rlayout.m_rev} of {rlayout.steps} groups")
            else:
                banded_fwd, banded_rev, n_pad = maybe_cached(
                    f"banded-{graph_mode}-n{n}-deg{deg}-t{dense_tile}-k{banded_k}-i8"
                    + ("-r" if reordered else "") + ("-wide" if banded_wide else ""),
                    lambda: prepare_banded_mean_aggregate(
                        src, dst, n, tile=dense_tile, k=banded_k, dtype=np.int8,
                        wide=banded_wide))
                blocked_fwd = jax.tree.map(jnp.asarray, banded_fwd)
                blocked_rev = jax.tree.map(jnp.asarray, banded_rev)
                _vlog(f"banded layout: A {banded_fwd.a.nbytes/1e9:.2f}+{banded_rev.a.nbytes/1e9:.2f} GB, "
                      f"s_span {banded_fwd.s_span}/{banded_rev.s_span}, wsz {banded_fwd.wsz}/{banded_rev.wsz}")
    if spmm_backend == "cmap":
        # column-tile-indirect low-degree tier (ops/spmm_cmap.py): each dst
        # block keeps only its C nonzero source tiles (scalar-prefetched
        # window-relative indices) — A bytes ∝ nb·C instead of nb·span; the
        # play for the deg≈3 city-map shape where >60% of banded count
        # tiles are zero. Produces a BandedResidualLayout, so everything
        # downstream (fused kernels, int4 view) is shared.
        from sldm_gnn_tpu.ops.banded_residual import (
            banded_residual_sage_apply, spmm_banded_residual_apply)
        from sldm_gnn_tpu.ops.spmm_cmap import (
            prepare_cmap_residual_mean_aggregate)

        rlayout, n_pad = prepare_cmap_residual_mean_aggregate(
            src, dst, n, tile=dense_tile, k=banded_k,
            c=int(os.environ["BENCH_CMAP_C"])
            if os.environ.get("BENCH_CMAP_C") else None,
            range_budget=int(os.environ.get("BENCH_CMAP_RANGE", 32)),
            resid_frac=float(os.environ.get("BENCH_CMAP_RESID", 0.005)),
            count_cap=None
            if os.environ.get("BENCH_A_INT4", "auto") == "0" else 7)
        spmm_backend = "banded_residual"
        blocked_fwd = jax.tree.map(jnp.asarray, rlayout)
        blocked_rev = None
        _vlog(
            f"cmap layout: c {rlayout.banded_fwd.s_span}/"
            f"{rlayout.banded_rev.s_span}, wsz {rlayout.banded_fwd.wsz}/"
            f"{rlayout.banded_rev.wsz}, A "
            f"{rlayout.banded_fwd.a.nbytes / 1e6:.1f}+"
            f"{rlayout.banded_rev.a.nbytes / 1e6:.1f} MB, "
            f"resid {rlayout.resid_frac:.5f} ({len(rlayout.r_src)} edges), "
            f"slots {rlayout.m_fwd}/{rlayout.m_rev} of {rlayout.steps}")
    if spmm_backend == "gather":
        # low-degree tier (ops/spmm_gather.py): sparse in-band codes + VMEM
        # row gathers — A traffic ∝ E, not N×bandwidth; the play for the
        # reference's own deg≈3 lane-map shape (BENCH_GRAPH=map)
        from sldm_gnn_tpu.ops.spmm_gather import (
            prepare_gather_residual_mean_aggregate,
            spmm_gather_residual_apply,
        )

        glayout, n_pad = prepare_gather_residual_mean_aggregate(
            src, dst, n, tile=dense_tile, k=banded_k,
            r=int(os.environ["BENCH_GATHER_R"]) if os.environ.get("BENCH_GATHER_R") else None)
        blocked_fwd = jax.tree.map(jnp.asarray, glayout)
        blocked_rev = None
        _vlog(f"gather layout: R {glayout.gather_fwd.r}, "
              f"wsz {glayout.gather_fwd.wsz}/{glayout.gather_rev.wsz}, "
              f"codes {glayout.gather_fwd.codes.nbytes/1e6:.1f} MB/dir, "
              f"resid {glayout.resid_frac:.5f} ({len(glayout.r_src)} edges)")
    if spmm_backend in ("banded", "banded_residual", "gather"):
        pass  # layouts built above
    elif spmm_backend == "hybrid":
        # density-split backend (ops/spmm_hybrid.py): dense tiles for block
        # pairs above the break-even density within the A budget; one-hot
        # chunks for stragglers. The play for density-skewed graphs and for
        # scales where even int8 pure-dense tiles outgrow the budget.
        hybrid_layout, n_pad = prepare_hybrid_mean_aggregate(
            src, dst, n, tile=dense_tile, dense_k=dense_k,
            k_per_step=k_per_step,
            min_pair_edges=int(os.environ.get("BENCH_HYBRID_MIN", dense_tile // 2)),
            a_budget_bytes=dense_budget,
            dense_dtype=np.int8 if dense_dtype == "int8" else np.float32,
        )
        dense_frac = hybrid_layout.dense_edge_fraction

        def to_dev_blocks(b):
            if b is None:
                return None
            out = jax.tree.map(jnp.asarray, b)
            if hasattr(out, "a") and out.a.dtype not in (jnp.int8,):
                out = DenseBlocks(a=out.a.astype(jnp.bfloat16), src_blk=out.src_blk,
                                  row_scale=out.row_scale, col_scale=out.col_scale,
                                  tile=out.tile)
            return out

        from sldm_gnn_tpu.ops.spmm_hybrid import HybridLayout

        blocked_fwd = HybridLayout(
            dense_fwd=to_dev_blocks(hybrid_layout.dense_fwd),
            dense_rev=to_dev_blocks(hybrid_layout.dense_rev),
            onehot_fwd=to_dev_blocks(hybrid_layout.onehot_fwd),
            onehot_rev=to_dev_blocks(hybrid_layout.onehot_rev),
            n_pad=n_pad, dense_k=dense_k, k_per_step=k_per_step,
        )
        blocked_rev = None
    elif spmm_backend == "dense":
        dense_fwd, dense_rev, n_pad = prepare_dense_mean_aggregate(
            src, dst, n, tile=dense_tile, pad_blocks_to=dense_k,
            dtype=np.int8 if dense_dtype == "int8" else np.float32,
        )

        def to_dev(b):
            a = jnp.asarray(b.a)
            if a.dtype != jnp.int8:
                a = a.astype(jnp.bfloat16)
            opt = lambda s: None if s is None else jnp.asarray(s)
            return DenseBlocks(a=a, src_blk=jnp.asarray(b.src_blk),
                               row_scale=opt(b.row_scale),
                               col_scale=opt(b.col_scale), tile=b.tile)

        _vlog(f"dense layout built: A {dense_fwd.a.nbytes/1e9:.2f}+{dense_rev.a.nbytes/1e9:.2f} GB, s_max {dense_fwd.s_max}/{dense_rev.s_max}")
        blocked_fwd, blocked_rev = to_dev(dense_fwd), to_dev(dense_rev)
        jax.tree.map(lambda a: a.block_until_ready(), (blocked_fwd, blocked_rev))
        _vlog("dense layout on device")
    else:
        blocked_fwd, blocked_rev, n_pad = prepare_mean_aggregate(
            src, dst, n, step_chunks=k_per_step, tile=tile, edge_chunk=edge_chunk
        )
        blocked_fwd = jax.tree.map(jnp.asarray, blocked_fwd)
        blocked_rev = jax.tree.map(jnp.asarray, blocked_rev)

    rng = np.random.default_rng(1)
    # x STORAGE dtype: defaults to the compute dtype (bf16) — the kernels
    # already round MXU operands to bf16, so f32 residency only doubled the
    # x/grad-x HBM footprint (6 GB at ~100M edges) and added a convert.
    # BENCH_X_DTYPE=float32 restores the old behavior.
    xdt = jnp.dtype(os.environ.get(
        "BENCH_X_DTYPE", os.environ.get("BENCH_DTYPE", "bfloat16")))
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32)).astype(xdt)
    params = {
        k: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.05)
        for k in ("w0a", "w0b", "w1a", "w1b")
    }
    src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
    from sldm_gnn_tpu.graph.csr import mean_weights

    w_j = jnp.asarray(mean_weights(dst, n_pad))

    use_pallas = backend not in ("cpu",)
    remat = bool(int(os.environ.get("BENCH_REMAT", 0)))
    # compute/storage dtype inside the step; both paths use the same dtype
    # so vs_baseline stays apples-to-apples. Default bf16: the Pallas
    # kernel's DEFAULT precision already computes on bf16 MXU operands, so
    # bf16 activation storage is numerically free and halves HBM traffic.
    dt = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))

    # BENCH_FUSED=1 (default on the banded backend): the whole SAGE layer —
    # aggregation + both linears + ReLU — runs as ONE kernel per layer
    # (ops/sage_fused.py); the aggregate never round-trips HBM. The step is
    # HBM-bound (BASELINE.md roofline), so the saved materialize/re-read
    # traffic is a direct step-time cut. BENCH_FUSED=0 restores the
    # separate-kernel step.
    fused = (bool(int(os.environ.get("BENCH_FUSED", 1)))
             and spmm_backend in ("banded", "banded_residual"))

    def loss_pallas_fused(params, x, bf, br):
        h = x.astype(dt)
        p = jax.tree.map(lambda q: q.astype(dt), params)
        if spmm_backend == "banded_residual":
            layer = lambda h, wa, wb: banded_residual_sage_apply(
                h, wa, wb, None, bf, use_pallas, 0.0)
        else:
            layer = lambda h, wa, wb: banded_sage_apply(
                h, wa, wb, None, bf, br, use_pallas, 0.0)
        if remat:
            layer = jax.checkpoint(layer)
        h = layer(h, p["w0a"], p["w0b"])
        h = layer(h, p["w1a"], p["w1b"])
        return jnp.sum(h.astype(jnp.float32))

    def loss_pallas(params, x, bf, br):
        if spmm_backend == "gather":
            from sldm_gnn_tpu.ops.spmm_gather import spmm_gather_residual_apply

            agg = lambda h: spmm_gather_residual_apply(h, bf, use_pallas)
        elif spmm_backend == "banded_residual":
            agg = lambda h: spmm_banded_residual_apply(h, bf, use_pallas)
        elif spmm_backend == "banded":
            agg = lambda h: spmm_banded_apply(h, bf, br, use_pallas)
        elif spmm_backend == "hybrid":
            agg = lambda h: spmm_hybrid_apply(h, bf, use_pallas)
        elif spmm_backend == "dense":
            agg = lambda h: spmm_dense_apply(h, bf, br, use_pallas, dense_k)
        else:
            agg = lambda h: spmm_apply(h, bf, br, n_pad, use_pallas, k_per_step)
        return jnp.sum(two_layer_sage(params, x, agg, dt, remat))

    xla_big = e * d * dt.itemsize > 2_000_000_000  # messages array would exceed ~2GB

    def loss_xla(params, x, src_j, dst_j, w_j):
        if xla_big:
            agg = lambda h: spmm_xla_chunked(h, src_j, dst_j, w_j, n_pad)
        else:
            agg = lambda h: spmm_xla(h, src_j, dst_j, w_j, n_pad)
        return jnp.sum(two_layer_sage(params, x, agg, dt, remat))

    step_pallas = jax.grad(loss_pallas_fused if fused else loss_pallas, argnums=(0, 1))
    step_xla = jax.grad(loss_xla, argnums=(0, 1))

    # BENCH_SKIP_XLA=1 skips the (slow) XLA comparator — for very large
    # graphs where the chunked-scan baseline dominates wall time;
    # vs_baseline is then reported as null
    skip_xla = bool(int(os.environ.get("BENCH_SKIP_XLA", 0)))
    # BENCH_INLOOP=1 (default): fully-jitted training loop (fori_loop over
    # steps) — the standard production shape for a JAX train loop, and the
    # honest chip measure on the remote relay (amortizes its ~0.3 ms
    # per-dispatch cost to one launch; dispatched mode charged that
    # overhead inconsistently across program variants). Both paths use the
    # same mode so vs_baseline stays apples-to-apples. BENCH_INLOOP=0
    # restores per-step dispatch timing.
    inloop = bool(int(os.environ.get("BENCH_INLOOP", 1)))
    # BENCH_A_INT4 (default auto): int4 count tiles — halves the dominant
    # A-tile HBM stream with EXACT integer math (+3.9% measured). Auto
    # enables when every count fits int4 (host check; unique-edge graphs
    # always do) and the timing runs in-loop (the in-trace convert must
    # amortize over the fori_loop). "0" disables, "1" forces.
    a_int4 = os.environ.get("BENCH_A_INT4", "auto")
    prep = None
    if inloop and a_int4 != "0" and spmm_backend in ("banded", "banded_residual"):
        from sldm_gnn_tpu.ops.spmm_banded import counts_to_int4, int4_count_safe

        if spmm_backend == "banded":
            pair = (banded_fwd, banded_rev)
        else:
            pair = (rlayout.banded_fwd, rlayout.banded_rev)
        safe = int4_count_safe(pair[0]) and int4_count_safe(pair[1])
        if a_int4 == "1" and not safe:
            # forcing past the safety gate would wrap counts >7 silently —
            # fail loudly instead of producing plausible-but-wrong math
            raise SystemExit(
                "BENCH_A_INT4=1 but count tiles exceed the int4 range "
                "[-8, 7]; the converted A would wrap. Use the "
                "banded_residual backend (count_cap=7 spills excess "
                "multiplicity) or BENCH_A_INT4=0.")
        if safe:
            if spmm_backend == "banded":
                prep = lambda bf, br: (counts_to_int4(bf), counts_to_int4(br))
            else:
                import dataclasses

                prep = lambda bf, br: (dataclasses.replace(
                    bf, banded_fwd=counts_to_int4(bf.banded_fwd),
                    banded_rev=counts_to_int4(bf.banded_rev)), br)
    _vlog(f"a_int4 prep: {'on' if prep is not None else 'off'}")
    _vlog("starting XLA baseline" if not skip_xla else "skipping XLA baseline")
    t_xla = None if skip_xla else bench_step(
        step_xla, params, x, iters, src_j, dst_j, w_j, inloop=inloop)
    _vlog("starting Pallas timing (includes one-time compile)")
    t_pallas = bench_step(step_pallas, params, x, iters, blocked_fwd, blocked_rev,
                          inloop=inloop, prep=prep)
    _vlog("Pallas timing done")

    t_best = t_pallas if skip_xla else min(t_pallas, t_xla)
    result = {
        "metric": "edges/s/chip (SpMM fwd+bwd, 2-layer GraphSAGE)",
        "value": round(e / t_best, 1),
        "unit": "edges/s",
        "vs_baseline": None if skip_xla else round(t_xla / t_pallas, 3),
        "backend": backend,
        "spmm": spmm_backend + ("+fused" if fused else ""),
        "dense_dtype": dense_dtype
        if spmm_backend in ("dense", "hybrid", "banded", "banded_residual") else None,
        "a_int4": prep is not None,
        "dense_frac": round(dense_frac, 4) if spmm_backend == "hybrid" else None,
        "dtype": dt.name,
        "graph": graph_mode,
        "reordered": reordered or None,
        "nodes": n,
        "edges": e,
        "feat_dim": d,
        "pallas_ms": round(t_pallas * 1e3, 3),
        "xla_ms": None if skip_xla else round(t_xla * 1e3, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
