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


# ---------------------------------------------------------------------------
# Row-blocked fused GRU (v2): the TPU-native batch-scale path.
#
# The kernels above block the WHOLE batch into VMEM ([B, 3H] f32 per frame),
# which caps B at a few thousand rows and leans on an XLA-materialized
# [B, T, 3H] f32 xproj — at flagship batch 2048 (~22k rows, T=100, H=96)
# that one residual is ~2.6 GB/step of HBM traffic, and the round-4 batch
# curve showed the step pinned at ~3% MFU because of it (BASELINE.md).
#
# v2 structure (grid = (row_blocks, T), frames innermost):
#   * the hidden state lives in a [RB, H] bf16 VMEM scratch across all T
#     frames of a row block — rows of a GRU are independent, so row blocks
#     are embarrassingly parallel and RB bounds VMEM, not B;
#   * BOTH projections are computed in-kernel ([RB, D]x[D, 3H] and
#     [RB, H]x[H, 3H] MXU matmuls, f32 accumulate) — x (~[N, T, 6]) is the
#     only per-step input stream and xproj never exists in HBM;
#   * the ONLY backward residual is hs in bf16 ([T, N, H]): backward
#     recomputes the gates from hs[t-1] exactly as forward computed them
#     (forward also reads its carry from the bf16 scratch, so the
#     recomputation is bit-consistent), runs reverse BPTT with a [RB, H]
#     f32 dh carry, and accumulates dW_ih/dW_hh/db in VMEM scratch flushed
#     once at grid end (sage_fused.py's in-kernel dW pattern);
#   * only h_last takes a cotangent: the flagship consumes just the final
#     hidden state (/root/reference/src/models/grusage.py:160-161), so the
#     [T, N, H] upstream-zeros cotangent of the full-sequence form never
#     materializes.
#
# Precision: matmul operands bf16 (MXU-native), accumulation + gate math
# f32, carry stored bf16. ~1e-2 relative vs the f32 scan after 100 frames;
# parity-critical callers keep ops/gru.py (tests/test_gru_pallas.py holds
# the tolerance contract).
# ---------------------------------------------------------------------------


def _fwd2_kernel(x_ref, wih_ref, bih_ref, whh_ref, bhh_ref, hs_ref, h_scr):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    hidden = h_scr.shape[1]
    h = h_scr[:]
    xp = (
        jnp.dot(x_ref[0].astype(jnp.bfloat16), wih_ref[:],
                preferred_element_type=jnp.float32)
        + bih_ref[0]
    )
    hproj = (
        jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        + bhh_ref[0]
    )
    xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    hr, hz, hn = (hproj[:, :hidden], hproj[:, hidden:2 * hidden],
                  hproj[:, 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(jnp.bfloat16)
    h_scr[:] = h_new
    hs_ref[0] = h_new


def _bwd2_kernel(x_ref, hs_prev_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                 g_ref, *refs, seq_len, with_dx, seq_cot=False):
    from jax.experimental import pallas as pl

    if with_dx:
        (dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
         dh_scr, dwih_scr, dwhh_scr) = refs
    else:
        (dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
         dh_scr, dwih_scr, dwhh_scr) = refs
        dx_ref = None

    r_blk = pl.program_id(0)
    s = pl.program_id(1)  # reverse step: time t = seq_len - 1 - s
    t = seq_len - 1 - s

    @pl.when(jnp.logical_and(r_blk == 0, s == 0))
    def _():
        dwih_scr[:] = jnp.zeros_like(dwih_scr)
        dwhh_scr[:] = jnp.zeros_like(dwhh_scr)

    # cotangent wiring: h_last-only (g_ref [rb, H], seeded into the carry
    # once at the last frame) vs full-sequence (g_ref a per-frame
    # [1, rb, H] block added to the carry every step)
    @pl.when(s == 0)
    def _():
        if seq_cot:
            dh_scr[:] = jnp.zeros_like(dh_scr)
        else:
            dh_scr[:] = g_ref[:]

    hidden = dh_scr.shape[1]
    h_prev = jnp.where(t > 0, hs_prev_ref[0], jnp.zeros_like(hs_prev_ref[0]))

    # recompute the forward gates at step t (bit-consistent: forward also
    # consumed the bf16-stored carry)
    xp = (
        jnp.dot(x_ref[0].astype(jnp.bfloat16), wih_ref[:],
                preferred_element_type=jnp.float32)
        + bih_ref[0]
    )
    hproj = (
        jnp.dot(h_prev, whh_ref[:], preferred_element_type=jnp.float32)
        + bhh_ref[0]
    )
    xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    hr, hz, hn = (hproj[:, :hidden], hproj[:, hidden:2 * hidden],
                  hproj[:, 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_prev_f = h_prev.astype(jnp.float32)

    dh = dh_scr[:]
    if seq_cot:
        dh = dh + g_ref[0]
    dn = dh * (1.0 - z)
    dz = dh * (h_prev_f - n)
    dh_direct = dh * z

    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)

    dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1)
    dxp_b = dxp.astype(jnp.bfloat16)
    dhp_b = dhp.astype(jnp.bfloat16)

    if dx_ref is not None:
        # dx_t = dxp @ W_ih^T  (bf16 operands, f32 accumulate)
        dx_ref[0] = jax.lax.dot_general(
            dxp_b, wih_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # sublane-contracting accumulations (rows are the contracted dim); a
    # ones column folds the bias gradient (column sum) into the same MXU
    # pass — a full [rb]-deep VPU reduction per step costs more than the
    # extra matmul lane
    ones = jnp.ones((x_ref.shape[1], 1), jnp.bfloat16)
    dwih_scr[:] += jax.lax.dot_general(
        jnp.concatenate([x_ref[0].astype(jnp.bfloat16), ones], axis=1),
        dxp_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwhh_scr[:] += jax.lax.dot_general(
        jnp.concatenate([h_prev, ones], axis=1), dhp_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dh_scr[:] = dh_direct + jax.lax.dot_general(
        dhp_b, whh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jnp.logical_and(r_blk == pl.num_programs(0) - 1, s == seq_len - 1))
    def _():
        d_in = dwih_ref.shape[0]
        dwih_ref[:] = dwih_scr[:d_in]
        dbih_ref[0] = dwih_scr[d_in]
        hidden = dwhh_ref.shape[0]
        dwhh_ref[:] = dwhh_scr[:hidden]
        dbhh_ref[0] = dwhh_scr[hidden]


def _round_rows(n: int, rb: int) -> int:
    return ((n + rb - 1) // rb) * rb


# scoped-VMEM ceiling for the v2 kernels: the defaults (16 MB) cap rb at
# ~1024 in the backward; larger row blocks amortize per-grid-step cost
_V2_VMEM_LIMIT = 100 * 1024 * 1024


def _v2_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_V2_VMEM_LIMIT)


def _run_fwd2(xt, w_ih, b_ih, w_hh, b_hh, *, rb, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, D = xt.shape
    H = w_hh.shape[0]
    H3 = 3 * H
    return pl.pallas_call(
        _fwd2_kernel,
        grid=(N // rb, T),
        compiler_params=_v2_params(),
        in_specs=[
            pl.BlockSpec((1, rb, D), lambda r, t: (t, r, 0)),
            pl.BlockSpec((D, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, H), lambda r, t: (t, r, 0)),
        out_shape=jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.bfloat16)],
        interpret=interpret,
    )(xt, w_ih, b_ih.reshape(1, H3), w_hh, b_hh.reshape(1, H3))


def _run_bwd2(xt, hs, w_ih, b_ih, w_hh, b_hh, g, *, rb, with_dx=True,
              seq_cot=False, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, D = xt.shape
    H = w_hh.shape[0]
    H3 = 3 * H
    kernel = partial(_bwd2_kernel, seq_len=T, with_dx=with_dx,
                     seq_cot=seq_cot)
    dx_spec = [pl.BlockSpec((1, rb, D), lambda r, s: (T - 1 - s, r, 0))]
    dx_shape = [jax.ShapeDtypeStruct((T, N, D), jnp.float32)]
    g_spec = (pl.BlockSpec((1, rb, H), lambda r, s: (T - 1 - s, r, 0))
              if seq_cot else
              pl.BlockSpec((rb, H), lambda r, s: (r, 0)))
    return pl.pallas_call(
        kernel,
        grid=(N // rb, T),
        compiler_params=_v2_params(),
        in_specs=[
            pl.BlockSpec((1, rb, D), lambda r, s: (T - 1 - s, r, 0)),
            # hs[t-1]; the t==0 read is clamped to frame 0 and zeroed in-kernel
            pl.BlockSpec((1, rb, H),
                         lambda r, s: (jnp.maximum(T - 2 - s, 0), r, 0)),
            pl.BlockSpec((D, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
            g_spec,
        ],
        out_specs=(dx_spec if with_dx else []) + [
            pl.BlockSpec((D, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
        ],
        out_shape=(dx_shape if with_dx else []) + [
            jax.ShapeDtypeStruct((D, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, H), jnp.float32),
            pltpu.VMEM((D + 1, H3), jnp.float32),  # last row = db_ih
            pltpu.VMEM((H + 1, H3), jnp.float32),  # last row = db_hh
        ],
        interpret=interpret,
    )(xt, hs, w_ih, b_ih.reshape(1, H3), w_hh, b_hh.reshape(1, H3), g)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_last_pallas(x, w_ih, b_ih, w_hh, b_hh, rb=1024, interpret=False,
                    with_dx=True):
    """Final hidden state ``h_last [N, H]`` of a single-layer GRU over
    ``x [N, T, D]`` via the row-blocked fused kernel (header comment).

    ``rb``: rows per VMEM block (clamped and padded to divide N).
    Gate math matches ops/gru.py (torch r,z,n order); operands bf16.

    ``with_dx=False`` SKIPS the input cotangent (dx comes back as
    symbolic zeros): one fewer MXU pass + the [N, T, D] write per
    backward step. Only for callers whose ``x`` is non-differentiated
    input data — GruSage's temporal features in training. Differentiating
    through x with with_dx=False silently yields zero gradients.
    """
    h, _ = _gru_last_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret)
    return h


def _gru_last_prep(x, rb):
    N = x.shape[0]
    # bf16 blocks tile (16, 128): keep the sublane dim a multiple of 16
    rb = max(16, min(rb, _round_rows(N, 16)))
    n_pad = _round_rows(N, rb)
    xt = jnp.moveaxis(x, 1, 0)  # [T, N, D]
    if n_pad != N:
        xt = jnp.pad(xt, ((0, 0), (0, n_pad - N), (0, 0)))
    return xt, rb, n_pad


def _gru_last_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret):
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    hs = _run_fwd2(xt, w_ih.astype(jnp.bfloat16), b_ih,
                   w_hh.astype(jnp.bfloat16), b_hh, rb=rb,
                   interpret=interpret)
    h_last = hs[-1, :N].astype(jnp.float32)
    return h_last, (x, hs, w_ih, b_ih, w_hh, b_hh)


def _gru_last_bwd(rb, interpret, with_dx, res, g_hl):
    x, hs, w_ih, b_ih, w_hh, b_hh = res
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    g_pad = g_hl.astype(jnp.float32)
    if n_pad != N:
        g_pad = jnp.pad(g_pad, ((0, n_pad - N), (0, 0)))
    # padded rows carry zero cotangent -> zero dW/dx contribution
    outs = _run_bwd2(
        xt, hs, w_ih.astype(jnp.bfloat16), b_ih, w_hh.astype(jnp.bfloat16),
        b_hh, g_pad, rb=rb, with_dx=with_dx, interpret=interpret)
    if with_dx:
        dxt, dwih, dbih, dwhh, dbhh = outs
        dx = jnp.moveaxis(dxt[:, :N], 0, 1)
    else:
        dwih, dbih, dwhh, dbhh = outs
        dx = jnp.zeros_like(x)  # dead unless someone differentiates x
    return dx, dwih, dbih.reshape(-1), dwhh, dbhh.reshape(-1)


gru_last_pallas.defvjp(
    lambda x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx=True:
        _gru_last_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret),
    _gru_last_bwd,
)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_seq_pallas(x, w_ih, b_ih, w_hh, b_hh, rb=1024, interpret=False,
                   with_dx=True):
    """Full output sequence ``hs [N, T, H]`` (f32) of a single-layer GRU
    via the v2 row-blocked kernel — the large-batch replacement for the
    whole-batch-in-VMEM :func:`gru_scan_pallas`. Backward adds the
    per-frame upstream cotangent to the BPTT carry inside the same
    reverse kernel. ``with_dx``: see :func:`gru_last_pallas`."""
    hs, _ = _gru_seq_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx)
    return hs


def _gru_seq_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx):
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    hs = _run_fwd2(xt, w_ih.astype(jnp.bfloat16), b_ih,
                   w_hh.astype(jnp.bfloat16), b_hh, rb=rb,
                   interpret=interpret)
    out = jnp.moveaxis(hs[:, :N], 0, 1).astype(jnp.float32)
    return out, (x, hs, w_ih, b_ih, w_hh, b_hh)


def _gru_seq_bwd(rb, interpret, with_dx, res, g_hs):
    x, hs, w_ih, b_ih, w_hh, b_hh = res
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    g = jnp.moveaxis(g_hs.astype(jnp.float32), 1, 0)  # [T, N, H]
    if n_pad != N:
        g = jnp.pad(g, ((0, 0), (0, n_pad - N), (0, 0)))
    outs = _run_bwd2(
        xt, hs, w_ih.astype(jnp.bfloat16), b_ih, w_hh.astype(jnp.bfloat16),
        b_hh, g, rb=rb, with_dx=with_dx, seq_cot=True, interpret=interpret)
    if with_dx:
        dxt, dwih, dbih, dwhh, dbhh = outs
        dx = jnp.moveaxis(dxt[:, :N], 0, 1)
    else:
        dwih, dbih, dwhh, dbhh = outs
        dx = jnp.zeros_like(x)
    return dx, dwih, dbih.reshape(-1), dwhh, dbhh.reshape(-1)


gru_seq_pallas.defvjp(
    lambda x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx:
        _gru_seq_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx),
    _gru_seq_bwd,
)


def gru_last_forward(params: GRUParams, x: jax.Array, *, rb: int = 1024,
                     interpret: bool = False,
                     with_dx: bool = True,
                     store_gates: bool = False) -> jax.Array:
    """``h_last [B, H]`` for a GRU stack via the v2 fused kernels: lower
    layers run :func:`gru_seq_pallas` (full sequences feed the next
    layer), the top layer :func:`gru_last_pallas` (no sequence output,
    no [T, N, H]-zeros cotangent). ``with_dx=False``: see
    :func:`gru_last_pallas` (applies to the bottom layer's input).
    ``store_gates=True`` runs every layer through the store-gates
    backward (v3 header): :func:`gru_seq_sg_pallas` for lower layers,
    :func:`gru_last_sg_pallas` for the top."""
    out = x
    w_ihs = [params.w_ih0] + [params.w_ih[l]
                              for l in range(params.w_ih.shape[0])]
    w_hhs = [params.w_hh0] + [params.w_hh[l]
                              for l in range(params.w_hh.shape[0])]
    b_ihs = [params.b_ih0] + [params.b_ih[l]
                              for l in range(params.b_ih.shape[0])]
    b_hhs = [params.b_hh0] + [params.b_hh[l]
                              for l in range(params.b_hh.shape[0])]
    last = len(w_ihs) - 1
    seq = gru_seq_sg_pallas if store_gates else gru_seq_pallas
    for l in range(last):
        dx_l = with_dx if l == 0 else True  # inter-layer grads always flow
        out = seq(out, w_ihs[l], b_ihs[l], w_hhs[l], b_hhs[l],
                  rb, interpret, dx_l)
    dx_top = with_dx if last == 0 else True
    top = gru_last_sg_pallas if store_gates else gru_last_pallas
    return top(out, w_ihs[last], b_ihs[last], w_hhs[last],
               b_hhs[last], rb, interpret, dx_top)


# ---------------------------------------------------------------------------
# v3: store-gates backward (trade HBM for VPU transcendentals).
#
# The v2 backward RECOMPUTES the forward gates each step — one hproj MXU
# pass plus 2 sigmoid + 1 tanh over [rb, H] per frame, ~40% of the
# backward's time at flagship shapes — while the forward kernel is
# VPU-bound with most of its HBM bandwidth idle (it writes only hs,
# 432 MB at batch 2048 vs a ~5 ms VPU-limited runtime). v3's forward
# additionally streams the gate activations r|z|n|hn to HBM as ONE
# packed bf16 [T, N, 4H] tensor (the write hides under the VPU work),
# and the backward reads them back instead of recomputing — no hproj
# matmul, no transcendentals. Cost: bf16 rounding of the gate values
# used by BPTT (the v2 recompute was f32 from the bf16 carry), inside
# the fast path's existing ~1e-2-class contract vs the f32 scan.
# ---------------------------------------------------------------------------


def _fwd3_kernel(x_ref, wih_ref, bih_ref, whh_ref, bhh_ref, hs_ref,
                 gates_ref, h_scr):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    hidden = h_scr.shape[1]
    h = h_scr[:]
    xp = (
        jnp.dot(x_ref[0].astype(jnp.bfloat16), wih_ref[:],
                preferred_element_type=jnp.float32)
        + bih_ref[0]
    )
    hproj = (
        jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        + bhh_ref[0]
    )
    xr, xz, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    hr, hz, hn = (hproj[:, :hidden], hproj[:, hidden:2 * hidden],
                  hproj[:, 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = ((1.0 - z) * n + z * h.astype(jnp.float32)).astype(jnp.bfloat16)
    h_scr[:] = h_new
    hs_ref[0] = h_new
    gates_ref[0] = jnp.concatenate([r, z, n, hn], axis=1).astype(jnp.bfloat16)


def _bwd3_kernel(x_ref, hprev_ref, gates_ref, wih_ref, whh_ref, g_ref,
                 *refs, seq_len, with_dx, seq_cot=False):
    from jax.experimental import pallas as pl

    if with_dx:
        (dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
         dh_scr, dwih_scr, dwhh_scr) = refs
    else:
        (dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
         dh_scr, dwih_scr, dwhh_scr) = refs
        dx_ref = None

    r_blk = pl.program_id(0)
    s = pl.program_id(1)
    t = seq_len - 1 - s

    @pl.when(jnp.logical_and(r_blk == 0, s == 0))
    def _():
        dwih_scr[:] = jnp.zeros_like(dwih_scr)
        dwhh_scr[:] = jnp.zeros_like(dwhh_scr)

    @pl.when(s == 0)
    def _():
        if seq_cot:
            dh_scr[:] = jnp.zeros_like(dh_scr)
        else:
            dh_scr[:] = g_ref[:]

    hidden = dh_scr.shape[1]
    h_prev = jnp.where(t > 0, hprev_ref[0], jnp.zeros_like(hprev_ref[0]))

    gt = gates_ref[0]
    r = gt[:, :hidden].astype(jnp.float32)
    z = gt[:, hidden:2 * hidden].astype(jnp.float32)
    n = gt[:, 2 * hidden:3 * hidden].astype(jnp.float32)
    hn = gt[:, 3 * hidden:].astype(jnp.float32)
    h_prev_f = h_prev.astype(jnp.float32)

    dh = dh_scr[:]
    if seq_cot:
        dh = dh + g_ref[0]
    dn = dh * (1.0 - z)
    dz = dh * (h_prev_f - n)
    dh_direct = dh * z

    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)

    dxp_b = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1).astype(jnp.bfloat16)
    dhp_b = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1).astype(jnp.bfloat16)

    if dx_ref is not None:
        dx_ref[0] = jax.lax.dot_general(
            dxp_b, wih_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ones = jnp.ones((x_ref.shape[1], 1), jnp.bfloat16)
    dwih_scr[:] += jax.lax.dot_general(
        jnp.concatenate([x_ref[0].astype(jnp.bfloat16), ones], axis=1),
        dxp_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwhh_scr[:] += jax.lax.dot_general(
        jnp.concatenate([h_prev, ones], axis=1), dhp_b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dh_scr[:] = dh_direct + jax.lax.dot_general(
        dhp_b, whh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jnp.logical_and(r_blk == pl.num_programs(0) - 1, s == seq_len - 1))
    def _():
        d_in = dwih_ref.shape[0]
        dwih_ref[:] = dwih_scr[:d_in]
        dbih_ref[0] = dwih_scr[d_in]
        dwhh_ref[:] = dwhh_scr[:hidden]
        dbhh_ref[0] = dwhh_scr[hidden]


def _run_fwd3(xt, w_ih, b_ih, w_hh, b_hh, *, rb, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, D = xt.shape
    H = w_hh.shape[0]
    H3 = 3 * H
    return pl.pallas_call(
        _fwd3_kernel,
        grid=(N // rb, T),
        compiler_params=_v2_params(),
        in_specs=[
            pl.BlockSpec((1, rb, D), lambda r, t: (t, r, 0)),
            pl.BlockSpec((D, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, H), lambda r, t: (t, r, 0)),
            pl.BlockSpec((1, rb, 4 * H), lambda r, t: (t, r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, N, 4 * H), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.bfloat16)],
        interpret=interpret,
    )(xt, w_ih, b_ih.reshape(1, H3), w_hh, b_hh.reshape(1, H3))


def _run_bwd3(xt, hs, gates, w_ih, w_hh, g, *, rb, with_dx=True,
              seq_cot=False, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, D = xt.shape
    H = w_hh.shape[0]
    H3 = 3 * H
    kernel = partial(_bwd3_kernel, seq_len=T, with_dx=with_dx,
                     seq_cot=seq_cot)
    dx_spec = [pl.BlockSpec((1, rb, D), lambda r, s: (T - 1 - s, r, 0))]
    dx_shape = [jax.ShapeDtypeStruct((T, N, D), jnp.float32)]
    g_spec = (pl.BlockSpec((1, rb, H), lambda r, s: (T - 1 - s, r, 0))
              if seq_cot else
              pl.BlockSpec((rb, H), lambda r, s: (r, 0)))
    return pl.pallas_call(
        kernel,
        grid=(N // rb, T),
        compiler_params=_v2_params(),
        in_specs=[
            pl.BlockSpec((1, rb, D), lambda r, s: (T - 1 - s, r, 0)),
            pl.BlockSpec((1, rb, H),
                         lambda r, s: (jnp.maximum(T - 2 - s, 0), r, 0)),
            pl.BlockSpec((1, rb, 4 * H), lambda r, s: (T - 1 - s, r, 0)),
            pl.BlockSpec((D, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, s: (0, 0)),
            g_spec,
        ],
        out_specs=(dx_spec if with_dx else []) + [
            pl.BlockSpec((D, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((H, H3), lambda r, s: (0, 0)),
            pl.BlockSpec((1, H3), lambda r, s: (0, 0)),
        ],
        out_shape=(dx_shape if with_dx else []) + [
            jax.ShapeDtypeStruct((D, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, H), jnp.float32),
            pltpu.VMEM((D + 1, H3), jnp.float32),
            pltpu.VMEM((H + 1, H3), jnp.float32),
        ],
        interpret=interpret,
    )(xt, hs, gates, w_ih, w_hh, g)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_last_sg_pallas(x, w_ih, b_ih, w_hh, b_hh, rb=1024, interpret=False,
                       with_dx=True):
    """:func:`gru_last_pallas` with the store-gates backward (v3 header
    comment): the forward streams packed bf16 r|z|n|hn to HBM and the
    backward reads them instead of recomputing — no hproj matmul, no
    transcendentals in BPTT. Same API and cotangent structure."""
    h, _ = _gru_last_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret)
    return h


def _gru_last_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret):
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    hs, gates = _run_fwd3(xt, w_ih.astype(jnp.bfloat16), b_ih,
                          w_hh.astype(jnp.bfloat16), b_hh, rb=rb,
                          interpret=interpret)
    h_last = hs[-1, :N].astype(jnp.float32)
    return h_last, (x, hs, gates, w_ih, w_hh)


def _gru_last_sg_bwd(rb, interpret, with_dx, res, g_hl):
    x, hs, gates, w_ih, w_hh = res
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    g_pad = g_hl.astype(jnp.float32)
    if n_pad != N:
        g_pad = jnp.pad(g_pad, ((0, n_pad - N), (0, 0)))
    outs = _run_bwd3(
        xt, hs, gates, w_ih.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
        g_pad, rb=rb, with_dx=with_dx, interpret=interpret)
    if with_dx:
        dxt, dwih, dbih, dwhh, dbhh = outs
        dx = jnp.moveaxis(dxt[:, :N], 0, 1)
    else:
        dwih, dbih, dwhh, dbhh = outs
        dx = jnp.zeros_like(x)
    return dx, dwih, dbih.reshape(-1), dwhh, dbhh.reshape(-1)


def _gru_last_sg_fwd_vjp(x, w_ih, b_ih, w_hh, b_hh, rb, interpret,
                         with_dx=True):
    return _gru_last_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret)


gru_last_sg_pallas.defvjp(_gru_last_sg_fwd_vjp, _gru_last_sg_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gru_seq_sg_pallas(x, w_ih, b_ih, w_hh, b_hh, rb=1024, interpret=False,
                      with_dx=True):
    """:func:`gru_seq_pallas` with the store-gates backward (v3 header):
    full output sequence ``hs [N, T, H]`` f32; BPTT reads the packed
    bf16 gates instead of recomputing, with the per-frame upstream
    cotangent folded into the same reverse kernel."""
    hs, _ = _gru_seq_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret,
                            with_dx)
    return hs


def _gru_seq_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx):
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    hs, gates = _run_fwd3(xt, w_ih.astype(jnp.bfloat16), b_ih,
                          w_hh.astype(jnp.bfloat16), b_hh, rb=rb,
                          interpret=interpret)
    out = jnp.moveaxis(hs[:, :N], 0, 1).astype(jnp.float32)
    return out, (x, hs, gates, w_ih, w_hh)


def _gru_seq_sg_bwd(rb, interpret, with_dx, res, g_hs):
    x, hs, gates, w_ih, w_hh = res
    N = x.shape[0]
    xt, rb, n_pad = _gru_last_prep(x, rb)
    g = jnp.moveaxis(g_hs.astype(jnp.float32), 1, 0)  # [T, N, H]
    if n_pad != N:
        g = jnp.pad(g, ((0, 0), (0, n_pad - N), (0, 0)))
    outs = _run_bwd3(
        xt, hs, gates, w_ih.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
        g, rb=rb, with_dx=with_dx, seq_cot=True, interpret=interpret)
    if with_dx:
        dxt, dwih, dbih, dwhh, dbhh = outs
        dx = jnp.moveaxis(dxt[:, :N], 0, 1)
    else:
        dwih, dbih, dwhh, dbhh = outs
        dx = jnp.zeros_like(x)
    return dx, dwih, dbih.reshape(-1), dwhh, dbhh.reshape(-1)


gru_seq_sg_pallas.defvjp(
    lambda x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx:
        _gru_seq_sg_fwd(x, w_ih, b_ih, w_hh, b_hh, rb, interpret, with_dx),
    _gru_seq_sg_bwd,
)
