"""GRU temporal encoder as a ``jax.lax.scan`` over frames.

Gate-for-gate parity with the cuDNN/torch GRU the reference uses
(/root/reference/src/models/grusage.py:53-58, ``nn.GRU(batch_first=True)``,
gate order r,z,n):

    r  = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z  = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n  = tanh  (x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h

The scan carries the hidden state over the (static-length) frame axis; the
three gates of one layer are computed as two fused matmuls ([B,in]x[in,3H]
and [B,H]x[H,3H]) so the MXU sees large batched GEMMs instead of six small
ones. Multi-layer stacking runs layers sequentially, matching torch.

TPU note: on TPU the whole scan body fuses into two GEMMs + elementwise VPU
work per step; with hidden sizes that are multiples of 128 the MXU tiles
perfectly. A Pallas fused variant is unnecessary — XLA already keeps h in
registers/VMEM between steps under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    """Per-layer stacked GRU parameters.

    w_ih: [L, in_or_H, 3H]  (input->hidden, pre-transposed for x @ w)
    w_hh: [L, H, 3H]
    b_ih: [L, 3H]
    b_hh: [L, 3H]

    Layer 0 consumes ``input_size`` features; layers 1.. consume H. To keep a
    single stacked array, layer 0's w_ih is stored separately.
    """

    w_ih0: jax.Array  # [input_size, 3H]
    w_hh0: jax.Array  # [H, 3H]
    b_ih0: jax.Array  # [3H]
    b_hh0: jax.Array  # [3H]
    w_ih: jax.Array  # [L-1, H, 3H] (possibly L-1 == 0)
    w_hh: jax.Array  # [L-1, H, 3H]
    b_ih: jax.Array  # [L-1, 3H]
    b_hh: jax.Array  # [L-1, 3H]


def init_gru_params(
    key: jax.Array, input_size: int, hidden_size: int, num_layers: int, dtype=jnp.float32
) -> GRUParams:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch's GRU reset."""
    bound = 1.0 / (hidden_size**0.5)
    ks = jax.random.split(key, 8)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype=dtype, minval=-bound, maxval=bound)

    lrest = max(num_layers - 1, 0)
    return GRUParams(
        w_ih0=u(ks[0], (input_size, 3 * hidden_size)),
        w_hh0=u(ks[1], (hidden_size, 3 * hidden_size)),
        b_ih0=u(ks[2], (3 * hidden_size,)),
        b_hh0=u(ks[3], (3 * hidden_size,)),
        w_ih=u(ks[4], (lrest, hidden_size, 3 * hidden_size)),
        w_hh=u(ks[5], (lrest, hidden_size, 3 * hidden_size)),
        b_ih=u(ks[6], (lrest, 3 * hidden_size)),
        b_hh=u(ks[7], (lrest, 3 * hidden_size)),
    )


def _gru_layer(
    x_seq: jax.Array, w_ih, w_hh, b_ih, b_hh, h0: jax.Array, *, block: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Run one GRU layer over [B, T, D] -> (outputs [B, T, H], h_last [B, H]).

    ``block`` unrolls K consecutive frames inside each scan step (blocked
    recurrence): identical math and f32 reduction order — the recurrence
    stays strictly sequential — but 1/K the scan-step count. The per-step
    [B, H]x[H, 3H] matmul is far below MXU saturation at flagship sizes, so
    the scan's per-step overhead dominates; blocking amortizes it. Used
    when ``block`` divides T; callers pass T's divisors only.
    """
    hidden = w_hh.shape[0]

    # Precompute all input projections in one big GEMM: [B, T, 3H]
    xproj = jnp.einsum("btd,dh->bth", x_seq, w_ih) + b_ih

    def cell(h, xp_t):
        hproj = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hproj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    xproj_t = jnp.moveaxis(xproj, 1, 0)  # [T, B, 3H]
    T = xproj_t.shape[0]
    if block > 1 and T % block == 0:
        def step(h, xp_blk):  # xp_blk [K, B, 3H]
            hs = []
            for k in range(block):
                h = cell(h, xp_blk[k])
                hs.append(h)
            return h, jnp.stack(hs)

        h_last, hs = jax.lax.scan(step, h0, xproj_t.reshape(T // block, block, *xproj_t.shape[1:]))
        hs = hs.reshape(T, *hs.shape[2:])
    else:
        def step1(h, xp):
            h2 = cell(h, xp)
            return h2, h2

        h_last, hs = jax.lax.scan(step1, h0, xproj_t)
    return jnp.moveaxis(hs, 0, 1), h_last


def _pad_gates(w_ih, w_hh, b_ih, b_hh, hidden: int, hp: int):
    """Zero-pad per-gate parameter blocks from H to Hp lanes (and w_hh's
    contraction dim). Exact: padded lanes see xr=hr=0 → r=z=0.5, n=0, so a
    zero-initialized padded hidden state stays exactly zero through every
    step, and the real lanes' sums gain only zero terms."""

    def padcols(w):
        d = w.shape[0]
        return jnp.pad(w.reshape(d, 3, hidden), ((0, 0), (0, 0), (0, hp - hidden))).reshape(
            d, 3 * hp
        )

    w_ih_p = padcols(w_ih)
    w_hh_p = jnp.pad(padcols(w_hh), ((0, hp - hidden), (0, 0)))
    b_ih_p = jnp.pad(b_ih.reshape(3, hidden), ((0, 0), (0, hp - hidden))).reshape(-1)
    b_hh_p = jnp.pad(b_hh.reshape(3, hidden), ((0, 0), (0, hp - hidden))).reshape(-1)
    return w_ih_p, w_hh_p, b_ih_p, b_hh_p


def gru_forward(
    params: GRUParams, x: jax.Array, *, pad_to: int | None = None, block: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Multi-layer GRU over ``x [B, T, D]``.

    Returns ``(outputs [B, T, H], h_last [B, H])`` where ``h_last`` is the
    final hidden state of the *top* layer — the reference's
    ``hlast[-1,:,:]`` (grusage.py:160-161).

    ``pad_to`` rounds the hidden width up to a multiple of ``pad_to``
    inside the scan (e.g. 128 → MXU-aligned 3H lanes for the reference's
    H=96) and slices the result back; exact modulo f32 reduction order.

    ``block`` unrolls that many frames per scan step (blocked recurrence;
    bit-identical — see :func:`_gru_layer`). Values that don't divide T
    fall back to 1.
    """
    batch = x.shape[0]
    hidden = params.w_hh0.shape[0]
    if pad_to is not None and hidden % pad_to:
        hp = ((hidden + pad_to - 1) // pad_to) * pad_to
        w_ih0, w_hh0, b_ih0, b_hh0 = _pad_gates(
            params.w_ih0, params.w_hh0, params.b_ih0, params.b_hh0, hidden, hp
        )
        rest = []
        for layer in range(params.w_ih.shape[0]):
            wi, wh, bi, bh = _pad_gates(
                params.w_ih[layer], params.w_hh[layer], params.b_ih[layer],
                params.b_hh[layer], hidden, hp,
            )
            # inner layers consume the padded outputs of the layer below
            rest.append((jnp.pad(wi, ((0, hp - hidden), (0, 0))), wh, bi, bh))
        padded = GRUParams(
            w_ih0=w_ih0, w_hh0=w_hh0, b_ih0=b_ih0, b_hh0=b_hh0,
            w_ih=jnp.stack([r[0] for r in rest]) if rest else params.w_ih[:, :0, :0],
            w_hh=jnp.stack([r[1] for r in rest]) if rest else params.w_hh[:, :0, :0],
            b_ih=jnp.stack([r[2] for r in rest]) if rest else params.b_ih[:, :0],
            b_hh=jnp.stack([r[3] for r in rest]) if rest else params.b_hh[:, :0],
        )
        out, h_last = gru_forward(padded, x, block=block)
        return out[..., :hidden], h_last[:, :hidden]
    # derive h0 from x (instead of a bare zeros) so that under shard_map
    # with replication tracking the scan carry inherits x's varying-axes
    # type — a literal zeros carry is "replicated" and fails vma typing
    h0 = jnp.zeros((batch, hidden), dtype=x.dtype) + 0.0 * x[:, 0, 0:1]

    out, h_last = _gru_layer(
        x, params.w_ih0, params.w_hh0, params.b_ih0, params.b_hh0, h0, block=block
    )

    num_rest = params.w_ih.shape[0]
    for layer in range(num_rest):  # static unroll; num_layers is tiny (1-2)
        out, h_last = _gru_layer(
            out,
            params.w_ih[layer],
            params.w_hh[layer],
            params.b_ih[layer],
            params.b_hh[layer],
            h0,
            block=block,
        )
    return out, h_last
