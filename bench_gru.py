"""GRU micro-benchmark: flagship temporal-encoder configurations on TPU.

The GRU scan dominates the flagship GruSage step (BASELINE.md: 1.07 ms of
2.44 ms at B=320/T=100/H=96). Compares the stock lax.scan GRU against the
MXU-aligned hidden-padding variant (ops/gru.py ``pad_to``) on forward and
forward+backward. Prints one JSON line per configuration.

Env knobs: GRU_BATCH, GRU_FRAMES, GRU_HIDDEN, GRU_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from sldm_gnn_tpu.ops.gru import gru_forward, init_gru_params


def timed(fn, args, iters):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0])  # warm the value-fetch path
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])  # close the timing window
    return (time.perf_counter() - t0) / iters


def main():
    b = int(os.environ.get("GRU_BATCH", 320))
    t = int(os.environ.get("GRU_FRAMES", 100))
    h = int(os.environ.get("GRU_HIDDEN", 96))
    # sub-ms steps need many iterations to amortize the remote relay's
    # per-dispatch latency (20 iters reported 1.4 ms for a 0.3 ms step)
    iters = int(os.environ.get("GRU_ITERS", 200))

    params = init_gru_params(jax.random.PRNGKey(0), 6, h, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 6), jnp.float32)

    blocks = [int(v) for v in os.environ.get("GRU_BLOCKS", "1").split(",")]
    cases = [("stock", None, 1)] + [
        (f"pad128_blk{k}" if k > 1 else "pad128", 128, k) for k in blocks
    ]
    for name, pad, blk in cases:
        fwd = jax.jit(lambda p, x, pad=pad, blk=blk: gru_forward(p, x, pad_to=pad, block=blk)[1])
        loss = lambda p, x, pad=pad, blk=blk: jnp.sum(gru_forward(p, x, pad_to=pad, block=blk)[1] ** 2)
        fwdbwd = jax.jit(jax.grad(loss))
        t_f = timed(fwd, (params, x), iters)
        t_fb = timed(fwdbwd, (params, x), iters)
        print(json.dumps({
            "metric": f"gru_{name}", "fwd_ms": round(t_f * 1e3, 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3), "batch": b, "frames": t,
            "hidden": h, "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
