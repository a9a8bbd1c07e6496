"""LN-fusion measurement at headline scale: 2-layer SAGE+LN+ReLU step,
fused_ln kernel vs fused-conv + XLA LayerNorm. House timing (single
jitted fori_loop, value-fetch close)."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sldm_gnn_tpu.ops.spmm_banded import prepare_banded_mean_aggregate
from sldm_gnn_tpu.ops.sage_fused import banded_sage_apply, banded_sage_ln_apply

n = int(os.environ.get("BENCH_NODES", 200_000))
deg, d, reach = 16, 128, 256
iters = int(os.environ.get("BENCH_ITERS", 100))
rng = np.random.default_rng(0)
dst = np.repeat(np.arange(n), deg)
src = np.clip(dst + rng.integers(-reach, reach + 1, n * deg), 0, n - 1)
fwd, rev, n_pad = prepare_banded_mean_aggregate(
    src, dst, n, tile=128, k=12, dtype=np.int8)
fj = jax.tree.map(jnp.asarray, fwd)
rj = jax.tree.map(jnp.asarray, rev)
x = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32)).astype(jnp.bfloat16)
params = {}
for i in range(2):
    params[f"wl{i}"] = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.05)
    params[f"wr{i}"] = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.05)
    params[f"b{i}"] = jnp.zeros((d,), jnp.float32)
    params[f"g{i}"] = jnp.ones((d,), jnp.float32)
    params[f"be{i}"] = jnp.zeros((d,), jnp.float32)


def loss_fused_ln(p, x, fj, rj):
    h = x
    pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    for i in range(2):
        h = banded_sage_ln_apply(h, pb[f"wl{i}"], pb[f"wr{i}"], pb[f"b{i}"],
                                 p[f"g{i}"], p[f"be{i}"], fj, rj, True, 0.0)
    return jnp.sum(h.astype(jnp.float32))


def loss_separate_ln(p, x, fj, rj):
    h = x
    pb = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    for i in range(2):
        y = banded_sage_apply(h, pb[f"wl{i}"], pb[f"wr{i}"], pb[f"b{i}"],
                              fj, rj, True, None)
        y32 = y.astype(jnp.float32)
        mu = y32.mean(-1, keepdims=True)
        var = ((y32 - mu) ** 2).mean(-1, keepdims=True)
        z = (y32 - mu) * jax.lax.rsqrt(var + 1e-5) * p[f"g{i}"] + p[f"be{i}"]
        h = jnp.maximum(z, 0.0).astype(x.dtype)
    return jnp.sum(h.astype(jnp.float32))


def timeit(lossf):
    step_g = jax.grad(lossf, argnums=(0, 1))

    def step(c, fj, rj):
        p, x = c
        gp, gx = step_g(p, x, fj, rj)
        return ({k: v - 1e-9 * gp[k] for k, v in p.items()}, x - 1e-9 * gx)

    @jax.jit
    def run(p, x, fj, rj):
        return jax.lax.fori_loop(0, iters, lambda _, c: step(c, fj, rj), (p, x))

    p2, x2 = run(params, x, fj, rj)
    jax.tree.map(lambda a: a.block_until_ready(), (p2, x2))
    float(x2[0, 0])  # scalar value-fetch: closes the window, no bulk pull
    t0 = time.perf_counter()
    p3, x3 = run(p2, x2, fj, rj)
    float(x3[0, 0])
    return (time.perf_counter() - t0) / iters


t_sep = timeit(loss_separate_ln)
t_fus = timeit(loss_fused_ln)
print(json.dumps({
    "metric": "2-layer SAGE+LN+ReLU fwd+bwd step", "nodes": n, "edges": len(src),
    "separate_ln_ms": round(t_sep * 1e3, 3), "fused_ln_ms": round(t_fus * 1e3, 3),
    "speedup": round(t_sep / t_fus, 3),
    "edges_per_s_fused": round(len(src) / t_fus, 1),
}))
