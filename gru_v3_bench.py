import time
import numpy as np, jax, jax.numpy as jnp
from sldm_gnn_tpu.ops.gru import init_gru_params
from sldm_gnn_tpu.ops.gru_pallas import gru_last_pallas, gru_last_sg_pallas

N, T, D, H, RB, ITERS = 22528, 100, 6, 96, 2048, 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, T, D)).astype(np.float32))
p = init_gru_params(jax.random.PRNGKey(0), D, H, 1)
args = (p.w_ih0, p.b_ih0, p.w_hh0, p.b_hh0)

for name, fn in (("v2 recompute", gru_last_pallas),
                 ("v3 store-gates", gru_last_sg_pallas)):
    def loss(w_ih, b_ih, w_hh, b_hh, xx):
        return jnp.sum(fn(xx, w_ih, b_ih, w_hh, b_hh, RB, False, False) ** 2)
    g = jax.grad(loss, argnums=(0, 1, 2, 3))
    @jax.jit
    def loop(w_ih, b_ih, w_hh, b_hh, xx):
        def body(i, c):
            gr = g(w_ih + c * 0, b_ih, w_hh, b_hh, xx)
            return c + gr[0][0, 0] * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(loop(*args, x))
    t0 = time.perf_counter(); float(loop(*args, x))
    print(f"{name} fwd+bwd: {(time.perf_counter()-t0)/ITERS*1e3:.3f} ms")

    @jax.jit
    def loop_f(w_ih, b_ih, w_hh, b_hh, xx):
        def body(i, c):
            h = fn(xx, w_ih + c * 0, b_ih, w_hh, b_hh, RB, False, False)
            return c + h[0, 0] * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(loop_f(*args, x))
    t0 = time.perf_counter(); float(loop_f(*args, x))
    print(f"{name} fwd-only: {(time.perf_counter()-t0)/ITERS*1e3:.3f} ms")
