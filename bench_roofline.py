"""SpMM speed-of-light (roofline) check — SURVEY.md §7 layer 9.

Builds the banded layout for a map-like graph, computes its analytic HBM
and MXU floors from the layout itself (the same terms as the kernel's
CostEstimate), times one aggregation on the real chip, and reports the
attained fraction of the binding roofline. Prints ONE JSON line.

Methodology (remote-relay rules, CLAUDE.md): all timing iterations run
inside ONE jitted ``fori_loop`` (no per-iteration dispatch), each
iteration folds the kernel output back into its input (launches are never
identical), the layout ships as traced jit arguments (not closure
constants — remote-compile payload limit), the timed top-level request
takes the warm run's outputs (never a byte-identical duplicate request),
and the window closes with a value fetch. A kernel-free control chain
with the same fold is subtracted, leaving kernel-only time.

Peak numbers default to TPU v5e (819 GB/s HBM, 197 TFLOP/s bf16 MXU,
394 TOP/s int8) and can be overridden via ROOFLINE_HBM_GBS /
ROOFLINE_MXU_TFLOPS for other chips.

Env knobs: BENCH_NODES, BENCH_DEG, BENCH_DIM, BENCH_ITERS, ROOFLINE_INT8=1
(measure the fully-int8 inference kernel instead of the bf16 path).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_local_graph
    from sldm_gnn_tpu.graph.csr import pad_nodes
    from sldm_gnn_tpu.ops.spmm_banded import (
        BandedBlocks,
        build_banded_counts,
        spmm_banded_int8_pallas,
        spmm_banded_pallas,
    )

    n = int(os.environ.get("BENCH_NODES", 200_000))
    deg = int(os.environ.get("BENCH_DEG", 16))
    d = int(os.environ.get("BENCH_DIM", 128))
    iters = int(os.environ.get("BENCH_ITERS", 200))
    use_int8 = bool(int(os.environ.get("ROOFLINE_INT8", 0)))
    hbm_gbs = float(os.environ.get("ROOFLINE_HBM_GBS", 819.0))
    mxu_tflops = float(os.environ.get(
        "ROOFLINE_MXU_TFLOPS", 394.0 if use_int8 else 197.0))

    src, dst = make_local_graph(n, deg)
    e = len(src)
    # forward layout only (the reverse is for training VJPs, not needed
    # here): int8 counts + the factored-mean 1/deg row scale
    k = 12
    fwd = build_banded_counts(src, dst, n, tile=128, k=k)
    n_pad = fwd.num_dst_blocks * fwd.tile
    deg_arr = np.bincount(dst, minlength=n_pad)
    scale = (1.0 / np.maximum(deg_arr, 1)).astype(np.float32).reshape(-1, 1)
    fwd = BandedBlocks(a=fwd.a, bo=fwd.bo, woff=fwd.woff, off=fwd.off,
                       row_scale=scale, tile=fwd.tile, wsz=fwd.wsz, k=k)
    fj = jax.tree.map(jnp.asarray, fwd)
    nb, s_span, tile, _ = np.asarray(fwd.a).shape
    steps = nb // k

    x_itemsize = 1 if use_int8 else 2  # int8 windows vs bf16 windows
    out_itemsize = 4 if use_int8 else 2
    bytes_a = fwd.a.size  # int8 count tiles
    bytes_x = steps * fwd.wsz * tile * d * x_itemsize
    bytes_out = nb * tile * d * out_itemsize
    bytes_scale = nb * tile * 4
    total_bytes = bytes_a + bytes_x + bytes_out + bytes_scale
    flops = 2 * nb * s_span * tile * tile * d
    t_hbm = total_bytes / (hbm_gbs * 1e9)
    t_mxu = flops / (mxu_tflops * 1e12)
    t_floor = max(t_hbm, t_mxu)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))

    def timed(fn, *args):
        """Warm (compile + cache-prime), then time one request whose
        inputs are the warm request's OUTPUTS — never a duplicate.
        ``fn`` must return a tuple matching its positional signature."""
        warm = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), warm)
        f = jax.tree.leaves(warm)[0]
        float(jnp.asarray(f).ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        out = fn(*warm)
        f = jax.tree.leaves(out)[0]
        float(jnp.asarray(f).ravel()[0].astype(jnp.float32))
        return time.perf_counter() - t0

    if use_int8:
        from sldm_gnn_tpu.ops.quant import quantize_tensor_xla

        xq, s = quantize_tensor_xla(x)

        @partial(jax.jit, static_argnums=2)
        def chain(xq, s, with_kernel, fj):
            def body(_, carry):
                xq, s = carry
                if with_kernel:
                    out = spmm_banded_int8_pallas(xq, s, fj)
                    s = s * (1.0 + 1e-12 * out[0, 0])
                else:
                    s = s * (1.0 + 1e-12)
                return xq, s

            return jax.lax.fori_loop(0, iters, body, (xq, s))

        t_full = timed(lambda a, b: chain(a, b, True, fj), xq, s) / iters
        t_ctrl = timed(lambda a, b: chain(a, b, False, fj), xq, s) / iters
    else:
        xb = x.astype(jnp.bfloat16)

        @partial(jax.jit, static_argnums=1)
        def chain(x, with_kernel, fj):
            def body(_, xv):
                if with_kernel:
                    return xv + 1e-9 * spmm_banded_pallas(xv, fj)
                return xv + 1e-9 * xv
            return (jax.lax.fori_loop(0, iters, body, x),)

        t_full = timed(lambda a: chain(a, True, fj), xb) / iters
        t_ctrl = timed(lambda a: chain(a, False, fj), xb) / iters

    t = max(t_full - t_ctrl, 1e-9)
    print(json.dumps({
        "metric": f"banded SpMM aggregation roofline ({'int8' if use_int8 else 'bf16'})",
        "value": round(t_floor / t, 4),
        "unit": "fraction of speed-of-light",
        "measured_ms": round(t * 1e3, 4),
        "chain_ms": round(t_full * 1e3, 4),
        "control_ms": round(t_ctrl * 1e3, 4),
        "hbm_floor_ms": round(t_hbm * 1e3, 4),
        "mxu_floor_ms": round(t_mxu * 1e3, 4),
        "binding": "hbm" if t_hbm >= t_mxu else "mxu",
        "bytes_gb": round(total_bytes / 1e9, 4),
        "gflops": round(flops / 1e9, 1),
        "edges": e,
        "edges_per_s": round(e / t, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
