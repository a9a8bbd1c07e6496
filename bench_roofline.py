"""SpMM speed-of-light (roofline) check — SURVEY.md §7 layer 9.

Builds the banded layout for a map-like graph, computes its analytic HBM
and MXU floors from the layout itself (the same terms as the kernel's
CostEstimate), times one aggregation on the real chip, and reports the
attained fraction of the binding roofline. Prints ONE JSON line.

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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_local_graph
    from sldm_gnn_tpu.ops.spmm_banded import (
        prepare_banded_mean_aggregate,
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
    fwd, _, n_pad = prepare_banded_mean_aggregate(src, dst, n, tile=128, k=12)
    fj = jax.tree.map(jnp.asarray, fwd)
    nb, s_span, tile, _ = np.asarray(fwd.a).shape
    steps = nb // fwd.k

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

    # methodology: the timed chain folds each output back into x (an
    # elementwise pass over [n_pad, d]) so consecutive kernel launches are
    # never identical; a kernel-free control chain with the SAME fold is
    # timed separately and subtracted, leaving kernel-only time. Both run
    # as one jitted fori_loop (no per-iteration dispatch) and the timing
    # window closes with a value fetch (remote-relay rule, CLAUDE.md).
    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        f = jax.tree.leaves(out)[0]
        float(jnp.asarray(f).ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        out = fn(*args)
        f = jax.tree.leaves(out)[0]
        float(jnp.asarray(f).ravel()[0].astype(jnp.float32))
        return time.perf_counter() - t0

    if use_int8:
        from functools import partial

        from sldm_gnn_tpu.ops.quant import quantize_tensor_xla

        xq, s = quantize_tensor_xla(x)

        @partial(jax.jit, static_argnums=2)
        def chain(xq, s, with_kernel):
            def body(_, carry):
                xq, s = carry
                if with_kernel:
                    out = spmm_banded_int8_pallas(xq, s, fj)
                    s = s * (1.0 + 1e-12 * out[0, 0])
                else:
                    s = s * (1.0 + 1e-12)
                return xq, s

            return jax.lax.fori_loop(0, iters, body, (xq, s))[1]

        t_full = timed(chain, xq, s, True) / iters
        t_ctrl = timed(chain, xq, s, False) / iters
    else:
        from functools import partial

        xb = x.astype(jnp.bfloat16)

        @partial(jax.jit, static_argnums=1)
        def chain(x, with_kernel):
            def body(_, xv):
                if with_kernel:
                    return xv + 1e-9 * spmm_banded_pallas(xv, fj)
                return xv + 1e-9 * xv
            return jax.lax.fori_loop(0, iters, body, x)

        t_full = timed(chain, xb, True) / iters
        t_ctrl = timed(chain, xb, False) / iters

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
