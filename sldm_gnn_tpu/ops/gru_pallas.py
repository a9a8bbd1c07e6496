"""Fused Pallas GRU scan.

The flagship model's dominant cost is the 100-step GRU recurrence
(BASELINE.md: 1.07 of 2.44 ms per train step). Under plain XLA each scan
step is a separate dispatch of a small matmul + elementwise ops; this
kernel keeps the hidden state in VMEM across the whole sequence:

  * the input projections ``xproj = x @ W_ih + b_ih`` are precomputed as
    one big MXU GEMM in XLA (time-parallel);
  * the Pallas grid runs one step per frame: ``hproj = h @ W_hh + b_hh``
    on the MXU from VMEM-resident weights, gate math on the VPU, carry in
    a VMEM scratch — no HBM round trip of ``h`` between steps;
  * backward is a reverse-grid BPTT kernel that recomputes the gates from
    the stored per-step states (checkpoint-free: storing h_t is enough),
    accumulating ``dW_hh``/``db_hh`` in VMEM scratch and emitting
    per-step ``dxproj`` cotangents; input-projection grads then fold back
    into one big XLA GEMM.

Gate math is bit-identical to ops/gru.py (torch GRU parity: r,z,n order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .gru import GRUParams


def _fwd_kernel(xproj_ref, whh_ref, bhh_ref, hs_ref, h_scr):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    hidden = h.shape[1]
    hproj = (
        jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + bhh_ref[0]
    )
    xp = xproj_ref[0]
    xr, xz, xn = xp[:, :hidden], xp[:, hidden : 2 * hidden], xp[:, 2 * hidden :]
    hr, hz, hn = hproj[:, :hidden], hproj[:, hidden : 2 * hidden], hproj[:, 2 * hidden :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    hs_ref[0] = h_new


def _bwd_kernel(xproj_ref, hprev_ref, whh_ref, bhh_ref, ghs_ref,
                dxproj_ref, dwhh_ref, dbhh_ref, dh_scr, dw_scr, db_scr, *, seq_len):
    from jax.experimental import pallas as pl

    s = pl.program_id(0)  # reverse step: time t = seq_len - 1 - s
    t = seq_len - 1 - s

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    hidden = dh_scr.shape[1]
    h_prev = jnp.where(t > 0, hprev_ref[0], jnp.zeros_like(hprev_ref[0]))

    # recompute forward gates at step t
    hproj = (
        jnp.dot(h_prev, whh_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + bhh_ref[0]
    )
    xp = xproj_ref[0]
    xr, xz, xn = xp[:, :hidden], xp[:, hidden : 2 * hidden], xp[:, 2 * hidden :]
    hr, hz, hn = hproj[:, :hidden], hproj[:, hidden : 2 * hidden], hproj[:, 2 * hidden :]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    dh = dh_scr[:] + ghs_ref[0]

    dn = dh * (1.0 - z)
    dz = dh * (h_prev - n)
    dh_direct = dh * z

    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)

    dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1)

    dxproj_ref[0] = dxp
    dw_scr[:] += jnp.dot(h_prev.T, dhp, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    db_scr[:] += jnp.sum(dhp, axis=0, keepdims=True)

    dh_scr[:] = dh_direct + jnp.dot(
        dhp, whh_ref[:].T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(s == seq_len - 1)
    def _():
        dwhh_ref[:] = dw_scr[:]
        dbhh_ref[0] = db_scr[0]


def _run_fwd(xproj, w_hh, b_hh, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, H3 = xproj.shape
    H = w_hh.shape[0]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, H3), lambda t: (0, 0)),
            pl.BlockSpec((1, H3), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(xproj, w_hh, b_hh.reshape(1, H3))


def _run_bwd(xproj, hs, w_hh, b_hh, g_hs, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, H3 = xproj.shape
    H = w_hh.shape[0]
    # hprev[t] = hs[t-1]; clamped at t=0 (kernel zeroes it via pl.when)
    return pl.pallas_call(
        partial(_bwd_kernel, seq_len=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), lambda s: (T - 1 - s, 0, 0)),
            pl.BlockSpec((1, B, H), lambda s: (jnp.maximum(T - 2 - s, 0), 0, 0)),
            pl.BlockSpec((H, H3), lambda s: (0, 0)),
            pl.BlockSpec((1, H3), lambda s: (0, 0)),
            pl.BlockSpec((1, B, H), lambda s: (T - 1 - s, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H3), lambda s: (T - 1 - s, 0, 0)),
            pl.BlockSpec((H, H3), lambda s: (0, 0)),
            pl.BlockSpec((1, H3), lambda s: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H3), jnp.float32),
            pltpu.VMEM((1, H3), jnp.float32),
        ],
        interpret=interpret,
    )(xproj, hs, w_hh, b_hh.reshape(1, H3), g_hs)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_scan_pallas(xproj, w_hh, b_hh, interpret=False):
    """hs [T, B, H] from per-step input projections xproj [T, B, 3H]."""
    return _run_fwd(xproj, w_hh, b_hh, interpret=interpret)


def _scan_fwd(xproj, w_hh, b_hh, interpret):
    hs = _run_fwd(xproj, w_hh, b_hh, interpret=interpret)
    return hs, (xproj, hs, w_hh, b_hh)


def _scan_bwd(interpret, res, g_hs):
    xproj, hs, w_hh, b_hh = res
    dxproj, dw_hh, db_hh = _run_bwd(xproj, hs, w_hh, b_hh, g_hs, interpret=interpret)
    return dxproj, dw_hh, db_hh.reshape(-1)


gru_scan_pallas.defvjp(_scan_fwd, _scan_bwd)


def gru_forward_pallas(params: GRUParams, x: jax.Array, *, interpret: bool = False):
    """Drop-in replacement for ops.gru.gru_forward using the fused kernel.

    Returns (outputs [B, T, H], h_last [B, H]).
    """
    def layer(x_seq, w_ih, w_hh, b_ih, b_hh):
        xproj = jnp.einsum("btd,dh->bth", x_seq, w_ih) + b_ih  # big XLA GEMM
        hs = gru_scan_pallas(jnp.moveaxis(xproj, 1, 0), w_hh, b_hh, interpret)
        return jnp.moveaxis(hs, 0, 1)

    out = layer(x, params.w_ih0, params.w_hh0, params.b_ih0, params.b_hh0)
    for l in range(params.w_ih.shape[0]):
        out = layer(out, params.w_ih[l], params.w_hh[l], params.b_ih[l], params.b_hh[l])
    return out, out[:, -1, :]
