"""Map-branch phase isolation at flagship batch-2048 shapes (real TPU).

Arms (all in-loop, fwd+bwd where stated, value-fetch closed):
  * knn fwd            — the fused Pallas distance+select kernel alone
  * full branch        — knn + gather + dist-MLP + softmax + weighted sum
  * gather+wsum        — the combine alone with fixed weights (its
                         backward is the [V·K]-row scatter into [S, D])
  * mlp+softmax        — the score path alone
  * scatter-free full  — the knn_impl='pallas' composition (dense [V, S]
                         weight matrix, ctx = Wsel @ emb; demb is the
                         transpose MATMUL, zero scatters)

Round-5 numbers (V=22.5k, S=1000, k=5, v5e): knn 0.755 / full 2.358 /
gather+wsum 1.462 / mlp+softmax 0.159 / scatter-free 1.240 ms — the
evidence behind BASELINE.md "Scatter-free map attention".
Env: KV (rows), KS (segments), KI (iters).
"""
import time
import numpy as np, jax, jax.numpy as jnp
from sldm_gnn_tpu.ops.knn import knn_topk
from sldm_gnn_tpu.ops.knn_pallas import knn_topk_pallas

import os

V = int(os.environ.get("KV", 22528))
S = int(os.environ.get("KS", 1000))
K, D = 5, 8
ITERS = int(os.environ.get("KI", 200))
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((V, 2)).astype(np.float32) * 100)
cts = jnp.asarray(rng.standard_normal((S, 2)).astype(np.float32) * 100)
emb = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
w0 = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32) * 0.3)
b0 = jnp.zeros(16, jnp.float32)
w1 = jnp.asarray(rng.standard_normal((16, 1)).astype(np.float32) * 0.3)
b1 = jnp.zeros(1, jnp.float32)

def attention(params, k_dists, gathered):
    w0, b0, w1, b1 = params
    h = jnp.maximum(k_dists[..., None] @ w0 + b0, 0.0)
    scores = (h @ w1 + b1)[..., 0]
    w = jax.nn.softmax(scores, axis=1)[..., None]
    return jnp.sum(gathered * w, axis=1)

def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(acc, *a)
            return acc + out * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(loop(*args)); t0 = time.perf_counter(); float(loop(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3

# arm 1: knn only (pallas)
t_knn = timeit(lambda acc, p, c: knn_topk_pallas(p + acc * 0, c, K)[0][0, 0], pts, cts)
# arm 2: full branch fwd+bwd wrt (mlp params, emb)
def full(params, emb, p, c):
    k_d, idx = knn_topk_pallas(p, c, K)
    ctx = attention(params, k_d, emb[idx])
    return jnp.sum(ctx ** 2)
g = jax.grad(full, argnums=(0, 1))
def full_step(params, emb, p, c):
    (gp, ge) = g(params, emb, p, c)
    return gp[0][0, 0] + ge[0, 0]
t_full = timeit(lambda acc, pr, e, p, c: full_step(pr, e + acc * 0, p + acc * 0, c), (w0, b0, w1, b1), emb, pts, cts)
print(f"knn fwd only: {t_knn:.3f} ms")
print(f"full branch fwd+bwd: {t_full:.3f} ms  -> epilogue {t_full - t_knn:.3f} ms")

# ---- decompose the epilogue: (a) gather+weighted-sum only, (b) MLP+softmax only
idx_fixed = knn_topk_pallas(pts, cts, K)[1]
kd_fixed = knn_topk_pallas(pts, cts, K)[0]
wfix = jnp.asarray(rng.standard_normal((V, K)).astype(np.float32))

def gather_sum(emb, w):
    g = emb[idx_fixed]                     # [V, K, D]
    return jnp.sum(jnp.sum(g * w[..., None], axis=1) ** 2)

g_gs = jax.grad(gather_sum, argnums=(0, 1))
t_gs = timeit(lambda acc, e, w: g_gs(e + acc * 0, w)[0][0, 0], emb, wfix)

def mlp_soft(params, kd):
    w0, b0, w1, b1 = params
    h = jnp.maximum(kd[..., None] @ w0 + b0, 0.0)
    scores = (h @ w1 + b1)[..., 0]
    w = jax.nn.softmax(scores, axis=1)
    return jnp.sum(w ** 2)

g_ms = jax.grad(mlp_soft, argnums=0)
t_ms = timeit(lambda acc, pr, kd: g_ms(pr, kd + acc * 0)[0][0, 0], (w0, b0, w1, b1), kd_fixed)
print(f"gather+wsum fwd+bwd: {t_gs:.3f} ms")
print(f"mlp+softmax fwd+bwd: {t_ms:.3f} ms")

# ---- scatter-free full branch (the knn_impl='pallas' composition)
def full_dense(params, emb, p, c):
    k_d, idx = knn_topk_pallas(p, c, K)
    w0, b0, w1, b1 = params
    h = jnp.maximum(k_d[..., None] @ w0 + b0, 0.0)
    scores = (h @ w1 + b1)[..., 0]
    w2 = jax.nn.softmax(scores, axis=1)
    lane = jnp.arange(S, dtype=idx.dtype)[None, :]
    wsel = jnp.zeros((p.shape[0], S), w2.dtype)
    for j in range(K):
        wsel = wsel + jnp.where(lane == idx[:, j:j+1], w2[:, j:j+1], 0.0)
    ctx = jax.lax.dot(wsel, emb, precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(ctx ** 2)

g_fd = jax.grad(full_dense, argnums=(0, 1))
def fd_step(params, emb, p, c):
    (gp, ge) = g_fd(params, emb, p, c)
    return gp[0][0, 0] + ge[0, 0]
t_fd = timeit(lambda acc, pr, e, p, c: fd_step(pr, e + acc * 0, p + acc * 0, c),
              (w0, b0, w1, b1), emb, pts, cts)
print(f"scatter-free full branch fwd+bwd: {t_fd:.3f} ms")
