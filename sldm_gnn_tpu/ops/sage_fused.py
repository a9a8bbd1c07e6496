"""Fused banded SAGE layer — aggregation epilogue fusion.

The unfused layer (models/blocked_sage.py, bench.py two_layer_sage) runs

    y = act( lin_l(mean_agg(x)) + lin_r(x) )

as three HBM round-trips: the banded kernel writes ``agg`` [N, D], XLA
reads it back for ``lin_l``, and reads x again for ``lin_r``. At the
headline config the step is HBM-bound (BASELINE.md roofline table), so
those materialize/re-read trips ARE the remaining cost: ~2·N·D bytes per
layer of pure epilogue traffic.

This op folds the whole layer into the banded kernel's output write:

    out[b] = act( rs[b]·(Σ_s A[b,s] @ xw[off+s]) @ Wl  +  xw[own_b] @ Wr + bias )

The aggregate lives only in VMEM ([T, D] per block); ``lin_r``'s input is
free because the block's own rows are ALWAYS resident in its group's x
window (the builder keeps ``bo[b] <= b`` and ``off[b] + s_span <= wsz``,
ops/spmm_banded.py build_banded_blocks) — no extra bytes move for either
linear. Per layer this removes the agg write + agg read + the second x
read (~3·N·D) and emits one [T, H] write instead.

Backward (custom VJP) needs ONE reverse aggregation — the same count as
the unfused layer — because the transpose factors through the aggregate:

    t   = Âᵀ @ g̃          (g̃ = g·act'(y); banded kernel, reverse layout)
    dx  = t @ Wlᵀ + g̃ @ Wrᵀ
    dWl = xᵀ @ t           (= (Âx)ᵀ g̃ without ever materializing Âx)
    dWr = xᵀ @ g̃,  db = Σ g̃

MXU operands round to bf16 like every DEFAULT-precision kernel here
(~1e-2 rel err; CLAUDE.md invariants) — parity-sensitive callers keep the
unfused path. Reference semantics being fused: SAGEConv mean-aggregate +
lin_l/lin_r (reference src/models/blocks/sageblock.py:8,18 via PyG).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .spmm import _operand_vma
from .spmm_banded import BandedBlocks, _window_prologue, spmm_banded_pallas, spmm_banded_xla


def _fused_kernel(woff_ref, *rest, s_span, K, tile, wsz,
                  has_row, has_bias, slope, has_resid, has_ln, eps,
                  has_ypre=False, has_cmap=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    off_ref = rest.pop(0)
    cmap_ref = rest.pop(0) if has_cmap else None
    rg_ref = rest.pop(0) if has_resid else None
    if has_ypre:
        rest.pop(0)  # rg_b: consumed only by the ypre output's index map
    a_ref = rest.pop(0)
    rs_ref = rest.pop(0) if has_row else None
    wl_ref = rest.pop(0)
    wr_ref = rest.pop(0)
    b_ref = rest.pop(0) if has_bias else None
    gamma_ref = rest.pop(0) if has_ln else None
    beta_ref = rest.pop(0) if has_ln else None
    r_hbm = rest.pop(0) if has_resid else None
    x_hbm = rest.pop(0)
    out_ref = rest.pop(0)
    xhat_ref = rest.pop(0) if has_ln else None
    rstd_ref = rest.pop(0) if has_ln else None
    ypre_ref = rest.pop(0) if has_ypre else None
    xw, sems = rest[:2]
    if has_resid:
        rw, rsem = rest[2], rest[3]

    slot = _window_prologue(woff_ref, x_hbm, xw, sems, tile, wsz)
    g = pl.program_id(0)
    d = wl_ref.shape[0]
    if has_resid:
        # compact residual aggregate (ops/banded_residual.py): only the few
        # grid groups with overflow edges fetch their slot — a gated manual
        # DMA, NOT a BlockSpec operand (slot/dummy alternation would defeat
        # Pallas's revisit skipping and re-stream ~K*T*D on every step)
        rgv = rg_ref[g]

        @pl.when(rgv > 0)
        def _():
            cp = pltpu.make_async_copy(r_hbm.at[rgv], rw.at[0], rsem)
            cp.start()
            cp.wait()
    wl = wl_ref[:].astype(jnp.bfloat16)
    wr = wr_ref[:].astype(jnp.bfloat16)
    for kk in range(K):
        offk = off_ref[g * K + kk]
        acc = jnp.zeros((tile, d), jnp.float32)
        for s in range(s_span):
            # cmap: arbitrary window tile per slot (ops/spmm_cmap.py)
            col = (cmap_ref[(g * K + kk) * s_span + s] if has_cmap
                   else offk + s)
            xs = xw[slot, pl.ds(col * tile, tile), :]
            acc += jnp.dot(
                a_ref[kk, s].astype(jnp.bfloat16),
                xs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        if has_row:
            acc = acc * rs_ref[kk * tile:(kk + 1) * tile]
        if has_resid:
            # rows already carry their mean weights — add after the banded
            # half's row scaling; residual-free groups read stale scratch,
            # masked by the where (NaN-safe: select, not multiply)
            r_tile = rw[0, kk * tile:(kk + 1) * tile, :].astype(jnp.float32)
            acc += jnp.where(rgv > 0, r_tile, 0.0)
        # own rows: window-resident by layout construction (bo <= block id,
        # off + s_span <= wsz), offset = global block id - window base
        own = (g * K + kk) - woff_ref[g]
        xo = xw[slot, pl.ds(own * tile, tile), :]
        out = jnp.dot(acc.astype(jnp.bfloat16), wl, preferred_element_type=jnp.float32)
        out += jnp.dot(xo.astype(jnp.bfloat16), wr, preferred_element_type=jnp.float32)
        if has_bias:
            out += b_ref[0]
        if has_ypre:
            # pre-epilogue y for the group's boundary slot (overlap path):
            # the block's VMEM buffer is flushed to HBM only when rg_b[g]
            # changes between steps, so untouched runs cost ~nothing; slot
            # 0 collects garbage from untouched groups and is never read
            ypre_ref[0, kk * tile:(kk + 1) * tile] = out
        if has_ln:
            # LayerNorm over the feature lanes, f32 stats, in the output
            # write: the pre-activation never round-trips HBM. xhat + rstd
            # are the backward residuals (models/blocks.py eps invariant)
            mu = jnp.mean(out, axis=1, keepdims=True)
            xc = out - mu
            var = jnp.mean(xc * xc, axis=1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
            xh = xc * rstd
            xhat_ref[kk * tile:(kk + 1) * tile] = xh.astype(xhat_ref.dtype)
            rstd_ref[kk * tile:(kk + 1) * tile] = rstd
            out = xh * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
        if slope is not None:
            out = jnp.where(out > 0, out, slope * out)
        out_ref[kk * tile:(kk + 1) * tile] = out.astype(out_ref.dtype)


def banded_sage_fwd_pallas(
    x: jax.Array,
    wl: jax.Array,
    wr: jax.Array,
    bias: jax.Array | None,
    blocks: BandedBlocks,
    *,
    negative_slope: float | None = None,
    out_dtype=None,
    interpret: bool = False,
    resid=None,
    ln=None,
    eps: float = 1e-5,
    ypre=None,
):
    """One fused SAGE layer over the banded layout (forward only; use
    :func:`banded_sage_apply` for training). ``negative_slope``: None = no
    activation, 0.0 = ReLU, else LeakyReLU.

    ``ypre=(rg_b, m_b)``: emit an EXTRA compact output ``y_pre_c
    [m_b, K*T, H] f32`` holding each mapped group's pre-LN/pre-activation
    ``y`` (post-bias). Slot 0 is a dummy that collects garbage from
    unmapped groups. This is the overlap path's handshake: the kernel
    never touches collective-dependent operands, and a small XLA epilogue
    completes the mapped rows after the all-to-all lands
    (parallel/halo_fused.py halo_fused_sage_ov).

    ``resid=(r_c, rg)``: compact residual aggregate ``r_c [m, K*T, H_in]``
    (slot 0 = zeros) + per-group slot map ``rg [steps]`` — added to each
    block's aggregate through a scalar-prefetch-indexed BlockSpec (groups
    without residual revisit the dummy slot, so no extra DMA moves for
    them). See ops/banded_residual.py.

    ``ln=(gamma, beta)``: fold LayerNorm(eps) over the feature axis into
    the output write — the layer becomes act(LN(ÂxWl + xWr + b)) in ONE
    kernel (activation applies AFTER the norm, the model family's
    ordering). Returns ``(out, xhat, rstd)``: xhat (at x's dtype) and
    rstd (f32 [N, 1]) are exactly the residuals the LN backward needs, so
    the pre-activation never materializes in HBM in either direction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, d = x.shape
    h = wl.shape[1]
    assert wl.shape == (d, h) and wr.shape == (d, h), (wl.shape, wr.shape, d)
    assert not blocks.wide, "fused kernel uses the per-slot (narrow) layout"
    assert blocks.col_scale is None, "pass the FORWARD layout (row_scale form)"
    tile, K, wsz = blocks.tile, blocks.k, blocks.wsz
    nb = blocks.num_dst_blocks
    s_span = blocks.s_span
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K
    out_dtype = x.dtype if out_dtype is None else out_dtype

    has_row = blocks.row_scale is not None
    has_bias = bias is not None
    has_resid = resid is not None
    has_ln = ln is not None
    specs = [pl.BlockSpec((K, s_span, tile, tile), lambda g, *_: (g, 0, 0, 0))]
    args = [blocks.a]
    if has_row:
        specs.append(pl.BlockSpec((K * tile, 1), lambda g, *_: (g, 0)))
        args.append(blocks.row_scale)
    specs += [
        pl.BlockSpec((d, h), lambda g, *_: (0, 0)),
        pl.BlockSpec((d, h), lambda g, *_: (0, 0)),
    ]
    args += [wl, wr]
    if has_bias:
        specs.append(pl.BlockSpec((1, h), lambda g, *_: (0, 0)))
        args.append(bias.reshape(1, h))
    if has_ln:
        gamma, beta = ln
        assert gamma.shape == (h,) and beta.shape == (h,), (gamma.shape, h)
        specs += [pl.BlockSpec((1, h), lambda g, *_: (0, 0)),
                  pl.BlockSpec((1, h), lambda g, *_: (0, 0))]
        args += [gamma.reshape(1, h), beta.reshape(1, h)]
    prefetch = [blocks.woff, blocks.off]
    has_cmap = blocks.cmap is not None
    if has_cmap:
        prefetch.append(blocks.cmap)
    scratch = [
        pltpu.VMEM((2, wsz * tile, d), x.dtype),  # double-buffered window
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_resid:
        r_c, rg = resid
        assert r_c.shape[1] == K * tile and r_c.shape[2] == d, r_c.shape
        # rg rides the scalar prefetch (gates the in-kernel DMA); r_c stays
        # in HBM and only affected groups fetch their slot
        specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(r_c)
        prefetch.append(rg)
        scratch += [pltpu.VMEM((1, K * tile, d), r_c.dtype),
                    pltpu.SemaphoreType.DMA(())]
    has_ypre = ypre is not None
    if has_ypre:
        rg_b, m_b = ypre
        prefetch.append(rg_b)  # read ONLY by the ypre output's index map
    specs.append(pl.BlockSpec(memory_space=pl.ANY))  # x in HBM; windows DMA'd
    args.append(x)

    vma = _operand_vma(x, wl, wr, blocks.a, blocks.off)
    if has_ln:
        out_specs = [
            pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0)),   # out
            pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0)),   # xhat
            pl.BlockSpec((K * tile, 1), lambda g, *_: (g, 0)),   # rstd
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad, h), out_dtype, vma=vma),
            jax.ShapeDtypeStruct((n_pad, h), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32, vma=vma),
        ]
    else:
        out_specs = [pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0))]
        out_shape = [jax.ShapeDtypeStruct((n_pad, h), out_dtype, vma=vma)]
    if has_ypre:
        # block index = the group's boundary slot (rg_b is the LAST
        # prefetch operand); unmapped groups revisit dummy slot 0
        out_specs.append(pl.BlockSpec(
            (1, K * tile, h), lambda g, *pf: (pf[-1][g], 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((m_b, K * tile, h), jnp.float32, vma=vma))
    if len(out_specs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    else:
        out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # woff [steps], off [steps*K], rg?
        grid=(steps,),
        in_specs=specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    slope = None if negative_slope is None else float(negative_slope)
    return pl.pallas_call(
        partial(_fused_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz,
                has_row=has_row, has_bias=has_bias, slope=slope,
                has_resid=has_resid, has_ln=has_ln, eps=float(eps),
                has_ypre=has_ypre, has_cmap=has_cmap),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tile * d * (s_span * tile + 2 * h),
            bytes_accessed=blocks.a.size * blocks.a.dtype.itemsize
            + steps * wsz * tile * d * x.dtype.itemsize
            + (2 if has_ln else 1) * n_pad * h * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, *args)


def _bwd_kernel(woff_ref, off_ref, *rest, s_span, K, tile, wsz, has_scale,
                has_resid, fuse_dw, has_cmap=False):
    """Reverse fused kernel: per destination block b,
        t[b]  = Σ_s (A_rev[b,s] ⊙ scale[off+s]) @ g[off+s]   (= Âᵀ g̃ rows)
        dx[b] = t[b] @ Wlᵀ + g[own_b] @ Wrᵀ
    The g̃ windows stream UNSCALED (the Wrᵀ term needs raw rows); the
    forward-degree col scale streams alongside as [wsz, T] windows (one
    row per source block — lane-aligned) and folds into the A tile's
    COLUMNS, algebraically identical to scaling the g rows:
    A @ (s ⊙ g) = (A ⊙ sᵀ) @ g. This removes the XLA pre-scale pass (a
    full [N, H] materialize + re-read) without any lane→sublane relayout
    in the kernel.

    ``fuse_dw``: stream the saved x in per-group [K·T, D] blocks and
    accumulate   dWl += xₒᵀ t[b],   dWr += xₒᵀ g[own_b]   into VMEM-
    resident [D, H] outputs (constant index map — flushed once at grid
    end). t then never round-trips HBM at all: the kernel's outputs are
    (dx, dWl, dWr) and the XLA dW matmuls (two more full reads of x plus
    re-reads of t and g̃) disappear from the step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    cmap_ref = rest.pop(0) if has_cmap else None
    rg_ref = rest.pop(0) if has_resid else None
    a_ref = rest.pop(0)
    wlt_ref = rest.pop(0)
    wrt_ref = rest.pop(0)
    tr_hbm = rest.pop(0) if has_resid else None
    scale_hbm = rest.pop(0)
    g_hbm = rest.pop(0)
    if fuse_dw:
        x_ref = rest.pop(0)
        dx_ref, dwl_ref, dwr_ref = rest[:3]
        gw, sw, sems = rest[3:6]
        if has_resid:
            rw, rsem = rest[6], rest[7]
        t_ref = None
    else:
        t_ref, dx_ref, gw, sw, sems = rest[:5]
        if has_resid:
            rw, rsem = rest[5], rest[6]

    g = pl.program_id(0)
    num = pl.num_programs(0)

    def window_dma(slot, g_):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(woff_ref[g_] * tile, wsz * tile), :],
            gw.at[slot], sems.at[slot],
        )

    def scale_dma(slot, g_):
        return pltpu.make_async_copy(
            scale_hbm.at[pl.ds(woff_ref[g_], wsz), :],
            sw.at[slot], sems.at[2 + slot],
        )

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        window_dma(0, 0).start()
        if has_scale:
            scale_dma(0, 0).start()

    @pl.when(g + 1 < num)
    def _():
        window_dma(jax.lax.rem(g + 1, 2), g + 1).start()
        if has_scale:
            scale_dma(jax.lax.rem(g + 1, 2), g + 1).start()

    window_dma(slot, g).wait()
    if has_scale:
        scale_dma(slot, g).wait()
    if has_resid:
        # gated manual fetch of the group's compact Rᵀg̃ slot (see the
        # forward kernel's rationale)
        rgv = rg_ref[g]

        @pl.when(rgv > 0)
        def _():
            cp = pltpu.make_async_copy(tr_hbm.at[rgv], rw.at[0], rsem)
            cp.start()
            cp.wait()

    if fuse_dw:
        # dW accumulators live in the (revisited) output blocks: zero once
        @pl.when(g == 0)
        def _():
            dwl_ref[...] = jnp.zeros_like(dwl_ref)
            dwr_ref[...] = jnp.zeros_like(dwr_ref)

    wlt = wlt_ref[:].astype(jnp.bfloat16)
    wrt = wrt_ref[:].astype(jnp.bfloat16)
    tdot = (((0,), (0,)), ((), ()))  # xₒᵀ @ rhs: contract the sublane dim
    for kk in range(K):
        offk = off_ref[g * K + kk]
        h = gw.shape[-1]
        acc = jnp.zeros((tile, h), jnp.float32)
        for s in range(s_span):
            col = (cmap_ref[(g * K + kk) * s_span + s] if has_cmap
                   else offk + s)
            rows = gw[slot, pl.ds(col * tile, tile), :]
            a_s = a_ref[kk, s].astype(jnp.bfloat16)
            if has_scale:
                # scale columns of A (== scaling the g rows): [1, T] lane
                # vector broadcast over sublanes — relayout-free
                a_s = a_s * sw[slot, pl.ds(col, 1), :].astype(jnp.bfloat16)
            acc += jnp.dot(
                a_s,
                rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        if has_resid:
            # compact Rᵀ g̃ slot (weights already folded in): completes
            # acc to the FULL Âᵀ g̃ before both the t write and the dx
            # matmuls (ops/banded_residual.py); stale scratch is masked
            r_tile = rw[0, kk * tile:(kk + 1) * tile, :].astype(jnp.float32)
            acc += jnp.where(rgv > 0, r_tile, 0.0)
        if not fuse_dw:
            t_ref[kk * tile:(kk + 1) * tile] = acc.astype(t_ref.dtype)
        own = (g * K + kk) - woff_ref[g]
        go = gw[slot, pl.ds(own * tile, tile), :]
        dx = jnp.dot(acc.astype(jnp.bfloat16), wlt, preferred_element_type=jnp.float32)
        dx += jnp.dot(go.astype(jnp.bfloat16), wrt, preferred_element_type=jnp.float32)
        dx_ref[kk * tile:(kk + 1) * tile] = dx.astype(dx_ref.dtype)
        if fuse_dw:
            xo = x_ref[kk * tile:(kk + 1) * tile].astype(jnp.bfloat16)
            dwl_ref[...] += jax.lax.dot_general(
                xo, acc.astype(jnp.bfloat16), dimension_numbers=tdot,
                preferred_element_type=jnp.float32)
            dwr_ref[...] += jax.lax.dot_general(
                xo, go.astype(jnp.bfloat16), dimension_numbers=tdot,
                preferred_element_type=jnp.float32)


def banded_sage_bwd_pallas(
    gq: jax.Array,
    wl: jax.Array,
    wr: jax.Array,
    blocks_rev: BandedBlocks,
    *,
    out_dtype=None,
    interpret: bool = False,
    resid=None,
    x: jax.Array | None = None,
):
    """Fused backward: returns ``(t, dx)`` where ``t = Âᵀ gq`` (feeds
    dWl = xᵀt) and ``dx = t @ Wlᵀ + gq @ Wrᵀ`` — one kernel instead of a
    scale pre-pass, a reverse aggregation, and two XLA matmuls re-reading
    t and gq. ``gq`` is the activation-masked upstream gradient,
    UNSCALED; ``blocks_rev`` is the reverse layout whose ``col_scale``
    (the forward 1/deg) streams as a window alongside gq.

    ``resid=(t_c, rg)``: compact reverse residual ``t_c [m, K*T, H]``
    (Rᵀ g̃ rows, slot 0 = zeros) + per-group slot map — added into the
    aggregate before the in-kernel dx matmuls (ops/banded_residual.py).

    ``x``: the layer's saved input. When given, the dW matmuls fold into
    the kernel too — x streams once as per-group [K·T, D] blocks, dWl/dWr
    accumulate in VMEM-resident f32 [D, H] outputs, and ``t`` never
    touches HBM. Returns ``(dx, dwl, dwr)`` instead of ``(t, dx)``;
    removes ~3 full [N, D] passes per layer from the backward (the t
    write + re-read and one of the two XLA x reads)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, h = gq.shape
    d = wl.shape[0]
    assert wl.shape == (d, h) and wr.shape == (d, h)
    assert not blocks_rev.wide, "fused bwd kernel uses the narrow layout"
    assert blocks_rev.row_scale is None, "pass the REVERSE layout (col_scale form)"
    tile, K, wsz = blocks_rev.tile, blocks_rev.k, blocks_rev.wsz
    nb = blocks_rev.num_dst_blocks
    s_span = blocks_rev.s_span
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K
    out_dtype = gq.dtype if out_dtype is None else out_dtype
    has_scale = blocks_rev.col_scale is not None
    has_resid = resid is not None
    fuse_dw = x is not None
    # [N, 1] → [nb, T]: one lane-aligned row per source block, DMA-able
    # as [wsz, T] windows (a [rows, 1] slice violates Mosaic lane tiling)
    scale = (blocks_rev.col_scale.reshape(nb, tile) if has_scale
             else jnp.ones((1, tile), jnp.float32))  # placeholder operand

    specs = [
        pl.BlockSpec((K, s_span, tile, tile), lambda g, *_: (g, 0, 0, 0)),
        pl.BlockSpec((h, d), lambda g, *_: (0, 0)),  # Wlᵀ
        pl.BlockSpec((h, d), lambda g, *_: (0, 0)),  # Wrᵀ
    ]
    # the kernel consumes W transposes: pass [H, D] views (host-side
    # transpose of a [D, H] param — 64 KB, negligible)
    args = [blocks_rev.a, wl.T, wr.T]
    prefetch = [blocks_rev.woff, blocks_rev.off]
    has_cmap = blocks_rev.cmap is not None
    if has_cmap:
        prefetch.append(blocks_rev.cmap)
    scratch = [
        pltpu.VMEM((2, wsz * tile, h), gq.dtype),
        pltpu.VMEM((2, wsz, tile), jnp.float32),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    if has_resid:
        t_c, rg = resid
        assert t_c.shape[1] == K * tile and t_c.shape[2] == h, t_c.shape
        specs.append(pl.BlockSpec(memory_space=pl.ANY))  # gated manual DMA
        args.append(t_c)
        prefetch.append(rg)
        scratch += [pltpu.VMEM((1, K * tile, h), t_c.dtype),
                    pltpu.SemaphoreType.DMA(())]
    specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # scale in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # gq in HBM
    ]
    args += [scale, gq]
    if fuse_dw:
        assert x.shape == (n_pad, d), (x.shape, n_pad, d)
        specs.append(pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)))
        args.append(x)
        out_specs = (
            pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)),   # dx
            pl.BlockSpec((d, h), lambda g, *_: (0, 0)),          # dWl
            pl.BlockSpec((d, h), lambda g, *_: (0, 0)),          # dWr
        )
        dw_vma = _operand_vma(gq, wl, wr, blocks_rev.a)
        out_shape = (
            jax.ShapeDtypeStruct((n_pad, d), out_dtype,
                                 vma=_operand_vma(gq, wl, wr, blocks_rev.a)),
            jax.ShapeDtypeStruct((d, h), jnp.float32, vma=dw_vma),
            jax.ShapeDtypeStruct((d, h), jnp.float32, vma=dw_vma),
        )
    else:
        out_specs = (
            pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0)),
            pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((n_pad, h), out_dtype,
                                 vma=_operand_vma(gq, wl, blocks_rev.a)),
            jax.ShapeDtypeStruct((n_pad, d), out_dtype,
                                 vma=_operand_vma(gq, wl, wr, blocks_rev.a)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # woff, off, rg?
        grid=(steps,),
        in_specs=specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        partial(_bwd_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz,
                has_scale=has_scale, has_resid=has_resid, fuse_dw=fuse_dw,
                has_cmap=has_cmap),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tile * h * (s_span * tile + 2 * d)
            + (4 * nb * tile * d * h if fuse_dw else 0),
            bytes_accessed=blocks_rev.a.size * blocks_rev.a.dtype.itemsize
            + steps * wsz * tile * (h * gq.dtype.itemsize + 4)
            + (n_pad * d * x.dtype.itemsize if fuse_dw
               else n_pad * h * jnp.dtype(out_dtype).itemsize)
            + n_pad * d * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, *args)
    return outs


def _act(y, slope):
    return y if slope is None else jnp.where(y > 0, y, slope * y)


def _fused_fwd_impl(x, wl, wr, bias, blocks, use_pallas, negative_slope, interpret):
    if use_pallas:
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, blocks, negative_slope=negative_slope,
            interpret=interpret)
    agg = spmm_banded_xla(x, blocks)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    return _act(y, negative_slope).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def banded_sage_apply(x, wl, wr, bias, blocks_fwd: BandedBlocks,
                      blocks_rev: BandedBlocks, use_pallas: bool,
                      negative_slope: float | None = None,
                      interpret: bool = False):
    """Differentiable fused SAGE layer: act(Â x Wl + x Wr + bias).
    ``bias`` may be None. Backward routes through ONE reverse banded
    aggregation (see module docstring) — same aggregation count as the
    unfused layer, none of its epilogue HBM round-trips."""
    return _fused_fwd_impl(x, wl, wr, bias, blocks_fwd, use_pallas,
                           negative_slope, interpret)


def _fused_vjp_fwd(x, wl, wr, bias, blocks_fwd, blocks_rev, use_pallas,
                   negative_slope, interpret):
    y = _fused_fwd_impl(x, wl, wr, bias, blocks_fwd, use_pallas,
                        negative_slope, interpret)
    # y (not the pre-activation) suffices for act': leaky/relu preserve sign
    res = (x, wl, wr, bias, blocks_rev, y if negative_slope is not None else None)
    return y, res


def _fused_vjp_bwd(use_pallas, negative_slope, interpret, res, g):
    x, wl, wr, bias, blocks_rev, y = res
    if negative_slope is not None:
        g = jnp.where(y > 0, g, jnp.asarray(negative_slope, g.dtype) * g)
    # t = Âᵀ g̃ — stream g̃ at the activation storage dtype (the unfused
    # backward aggregates its dagg at this dtype too)
    gq = g.astype(x.dtype)
    f32 = jnp.float32
    if use_pallas and not blocks_rev.wide:
        # fused reverse kernel: dx = t@Wlᵀ + g̃@Wrᵀ AND the dW matmuls in
        # one pass — no scale pre-pass, and t (= Âᵀg̃) never touches HBM:
        # dWl/dWr accumulate in VMEM against the streamed x blocks
        dx, dwl, dwr = banded_sage_bwd_pallas(gq, wl, wr, blocks_rev,
                                              x=x, interpret=interpret)
        dx = dx.astype(x.dtype)
        dwl, dwr = dwl.astype(wl.dtype), dwr.astype(wr.dtype)
    else:
        if use_pallas:
            t = spmm_banded_pallas(gq, blocks_rev, interpret=interpret)
        else:
            t = spmm_banded_xla(gq, blocks_rev)
        # matmuls at the storage dtype with f32 accumulation: f32 casts of
        # the big operands would materialize copies AND drop the MXU rate
        dx = (
            jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
            + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
        ).astype(x.dtype)
        dwl = jnp.dot(x.T, t.astype(x.dtype),
                      preferred_element_type=f32).astype(wl.dtype)
        dwr = jnp.dot(x.T, gq.astype(x.dtype),
                      preferred_element_type=f32).astype(wr.dtype)
    db = None if bias is None else g.sum(axis=0).astype(bias.dtype)
    return dx, dwl, dwr, db, None, None


banded_sage_apply.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _bwd_ln_kernel(woff_ref, off_ref, *rest, s_span, K, tile, wsz, has_scale,
                   has_resid, slope, has_ln_act, has_cmap=False):
    """Fully-fused LN backward: streams the RAW upstream gradient g and the
    forward's xhat/rstd residuals as windows and derives dL/dy_pre
    IN-KERNEL — the XLA prologue pass (read g + xhat, write dy) and its
    [N, H] dy materialization disappear. Per window:

        z   = γ·xhat + β                  (act' sign — z is never stored)
        g̃   = g·act'(z)
        gz  = g̃·γ
        dyᵤ = gz − mean(gz) − xhat·mean(gz·xhat)     (dy WITHOUT rstd)

    rstd folds into the aggregation the same way the 1/deg col-scale
    does (A @ (r ⊙ dy) == (A ⊙ rᵀ) @ dy), streaming as [wsz, T]
    lane-aligned windows; the own-row terms (Wrᵀ, dWr, db) read rstd in
    sublane form from a [N, 1] blocked operand — no lane↔sublane
    relayouts anywhere. dγ/dβ/db accumulate in-kernel over OWN rows
    (each node owned by exactly one block → exact row sums)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    rest = list(rest)
    cmap_ref = rest.pop(0) if has_cmap else None
    rg_ref = rest.pop(0) if has_resid else None
    a_ref = rest.pop(0)
    wlt_ref = rest.pop(0)
    wrt_ref = rest.pop(0)
    gamma_ref = rest.pop(0)
    beta_ref = rest.pop(0)
    tr_hbm = rest.pop(0) if has_resid else None
    scale_hbm = rest.pop(0)
    rstdw_hbm = rest.pop(0)   # [nb, T] lane-aligned rstd rows
    g_hbm = rest.pop(0)       # RAW dL/dout
    xh_hbm = rest.pop(0)      # forward xhat residual
    rstdb_ref = rest.pop(0)   # [K*T, 1] blocked rstd (own rows, sublane)
    x_ref = rest.pop(0)       # [K*T, D] blocked x (own rows)
    dx_ref, dwl_ref, dwr_ref, dstats_ref = rest[:4]
    gw, xhw, sw, rw, dyw, sems = rest[4:10]
    if has_resid:
        rsw, rsem = rest[10], rest[11]

    g = pl.program_id(0)
    num = pl.num_programs(0)

    def win(slot, g_, hbm, dst, sem_i, rows):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(woff_ref[g_] * rows, wsz * rows), :]
            if rows > 1 else hbm.at[pl.ds(woff_ref[g_], wsz), :],
            dst.at[slot], sems.at[sem_i + slot])

    def start_all(slot, g_):
        win(slot, g_, g_hbm, gw, 0, tile).start()
        win(slot, g_, xh_hbm, xhw, 2, tile).start()
        win(slot, g_, rstdw_hbm, rw, 4, 1).start()
        if has_scale:
            win(slot, g_, scale_hbm, sw, 6, 1).start()

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        start_all(0, 0)
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        dstats_ref[...] = jnp.zeros_like(dstats_ref)

    @pl.when(g + 1 < num)
    def _():
        start_all(jax.lax.rem(g + 1, 2), g + 1)

    win(slot, g, g_hbm, gw, 0, tile).wait()
    win(slot, g, xh_hbm, xhw, 2, tile).wait()
    win(slot, g, rstdw_hbm, rw, 4, 1).wait()
    if has_scale:
        win(slot, g, scale_hbm, sw, 6, 1).wait()
    if has_resid:
        rgv = rg_ref[g]

        @pl.when(rgv > 0)
        def _():
            cp = pltpu.make_async_copy(tr_hbm.at[rgv], rsw.at[0], rsem)
            cp.start()
            cp.wait()

    gamma = gamma_ref[0].astype(f32)
    beta = beta_ref[0].astype(f32)

    def dy_unscaled(G, XH):
        z = XH * gamma + beta
        Gt = jnp.where(z > 0, G, slope * G) if has_ln_act else G
        gz = Gt * gamma
        m1 = jnp.mean(gz, axis=1, keepdims=True)
        m2 = jnp.mean(gz * XH, axis=1, keepdims=True)
        return gz - m1 - XH * m2, Gt

    dyw[...], _ = dy_unscaled(gw[slot].astype(f32), xhw[slot].astype(f32))

    wlt = wlt_ref[:].astype(jnp.bfloat16)
    wrt = wrt_ref[:].astype(jnp.bfloat16)
    tdot = (((0,), (0,)), ((), ()))
    h = gw.shape[-1]
    d = x_ref.shape[-1]
    for kk in range(K):
        offk = off_ref[g * K + kk]
        acc = jnp.zeros((tile, h), f32)
        for s in range(s_span):
            col = (cmap_ref[(g * K + kk) * s_span + s] if has_cmap
                   else offk + s)
            rows = dyw[pl.ds(col * tile, tile), :]
            a_s = a_ref[kk, s].astype(f32)
            # fold rstd (and 1/deg when present) into A's COLUMNS — the
            # algebraic twin of scaling the dy rows, relayout-free
            cs = rw[slot, pl.ds(col, 1), :]
            if has_scale:
                cs = cs * sw[slot, pl.ds(col, 1), :]
            a_s = (a_s * cs).astype(jnp.bfloat16)
            acc += jnp.dot(a_s, rows.astype(jnp.bfloat16),
                           preferred_element_type=f32)
        if has_resid:
            r_tile = rsw[0, kk * tile:(kk + 1) * tile, :].astype(f32)
            acc += jnp.where(rgv > 0, r_tile, 0.0)
        own = (g * K + kk) - woff_ref[g]
        # own-row terms: recompute g̃ for the tile (cheap VPU) and scale
        # dyᵤ by the blocked sublane rstd
        Go = gw[slot, pl.ds(own * tile, tile), :].astype(f32)
        XHo = xhw[slot, pl.ds(own * tile, tile), :].astype(f32)
        _, Gto = dy_unscaled(Go, XHo)
        rso = rstdb_ref[kk * tile:(kk + 1) * tile]  # [T, 1] f32
        dyo = dyw[pl.ds(own * tile, tile), :] * rso
        dx = jnp.dot(acc.astype(jnp.bfloat16), wlt, preferred_element_type=f32)
        dx += jnp.dot(dyo.astype(jnp.bfloat16), wrt, preferred_element_type=f32)
        dx_ref[kk * tile:(kk + 1) * tile] = dx.astype(dx_ref.dtype)
        xo = x_ref[kk * tile:(kk + 1) * tile].astype(jnp.bfloat16)
        dwl_ref[...] += jax.lax.dot_general(
            xo, acc.astype(jnp.bfloat16), dimension_numbers=tdot,
            preferred_element_type=f32)
        dwr_ref[...] += jax.lax.dot_general(
            xo, dyo.astype(jnp.bfloat16), dimension_numbers=tdot,
            preferred_element_type=f32)
        dstats_ref[...] += jnp.concatenate([
            jnp.sum(Gto * XHo, axis=0, keepdims=True),   # dgamma
            jnp.sum(Gto, axis=0, keepdims=True),         # dbeta
            jnp.sum(dyo, axis=0, keepdims=True),         # db (bias pre-LN)
            jnp.zeros((1, h), f32),
        ], axis=0)


def banded_sage_ln_bwd_pallas(
    g: jax.Array,
    xhat: jax.Array,
    rstd: jax.Array,
    wl: jax.Array,
    wr: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    blocks_rev: BandedBlocks,
    x: jax.Array,
    *,
    negative_slope: float | None,
    out_dtype=None,
    interpret: bool = False,
    resid=None,
):
    """One-kernel LN-layer backward (see :func:`_bwd_ln_kernel`): consumes
    the RAW ``g = dL/dout`` plus the forward's ``xhat``/``rstd [N, 1]``
    residuals and returns ``(dx, dwl, dwr, dstats)`` with
    ``dstats = [dgamma; dbeta; db; 0] [4, H]`` — no XLA prologue pass, no
    dy materialization, t never leaves VMEM.

    ``resid=(t_c, rg)``: compact reverse residual of the COMPLETE dy
    (computed by the caller for the few overflow rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, h = g.shape
    d = wl.shape[0]
    assert wl.shape == (d, h) and wr.shape == (d, h)
    assert not blocks_rev.wide, "LN bwd kernel uses the narrow layout"
    assert blocks_rev.row_scale is None, "pass the REVERSE layout (col_scale form)"
    assert xhat.shape == (n_pad, h) and rstd.shape == (n_pad, 1), (xhat.shape, rstd.shape)
    assert x.shape == (n_pad, d), (x.shape, n_pad, d)
    tile, K, wsz = blocks_rev.tile, blocks_rev.k, blocks_rev.wsz
    nb = blocks_rev.num_dst_blocks
    s_span = blocks_rev.s_span
    assert n_pad == nb * tile, (n_pad, nb, tile)
    steps = nb // K
    out_dtype = x.dtype if out_dtype is None else out_dtype
    has_scale = blocks_rev.col_scale is not None
    has_resid = resid is not None
    scale = (blocks_rev.col_scale.reshape(nb, tile) if has_scale
             else jnp.ones((1, tile), jnp.float32))
    rstd_rows = rstd.reshape(nb, tile)  # lane-aligned window form

    specs = [
        pl.BlockSpec((K, s_span, tile, tile), lambda gg, *_: (gg, 0, 0, 0)),
        pl.BlockSpec((h, d), lambda gg, *_: (0, 0)),   # Wlᵀ
        pl.BlockSpec((h, d), lambda gg, *_: (0, 0)),   # Wrᵀ
        pl.BlockSpec((1, h), lambda gg, *_: (0, 0)),   # gamma
        pl.BlockSpec((1, h), lambda gg, *_: (0, 0)),   # beta
    ]
    args = [blocks_rev.a, wl.T, wr.T, gamma.reshape(1, h), beta.reshape(1, h)]
    prefetch = [blocks_rev.woff, blocks_rev.off]
    has_cmap = blocks_rev.cmap is not None
    if has_cmap:
        prefetch.append(blocks_rev.cmap)
    scratch = [
        pltpu.VMEM((2, wsz * tile, h), g.dtype),       # g windows
        pltpu.VMEM((2, wsz * tile, h), xhat.dtype),    # xhat windows
        pltpu.VMEM((2, wsz, tile), jnp.float32),       # 1/deg windows
        pltpu.VMEM((2, wsz, tile), jnp.float32),       # rstd windows
        pltpu.VMEM((wsz * tile, h), jnp.float32),      # dyᵤ (this step)
        pltpu.SemaphoreType.DMA((8,)),
    ]
    if has_resid:
        t_c, rg = resid
        assert t_c.shape[1] == K * tile and t_c.shape[2] == h, t_c.shape
        specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(t_c)
        prefetch.append(rg)
        scratch += [pltpu.VMEM((1, K * tile, h), t_c.dtype),
                    pltpu.SemaphoreType.DMA(())]
    specs += [
        pl.BlockSpec(memory_space=pl.ANY),                      # 1/deg rows
        pl.BlockSpec(memory_space=pl.ANY),                      # rstd rows
        pl.BlockSpec(memory_space=pl.ANY),                      # g
        pl.BlockSpec(memory_space=pl.ANY),                      # xhat
        pl.BlockSpec((K * tile, 1), lambda gg, *_: (gg, 0)),    # rstd blocked
        pl.BlockSpec((K * tile, d), lambda gg, *_: (gg, 0)),    # x blocked
    ]
    args += [scale, rstd_rows, g, xhat, rstd, x]

    out_specs = (
        pl.BlockSpec((K * tile, d), lambda gg, *_: (gg, 0)),    # dx
        pl.BlockSpec((d, h), lambda gg, *_: (0, 0)),            # dWl
        pl.BlockSpec((d, h), lambda gg, *_: (0, 0)),            # dWr
        pl.BlockSpec((4, h), lambda gg, *_: (0, 0)),            # dstats
    )
    vma = _operand_vma(g, xhat, wl, wr, blocks_rev.a)
    out_shape = (
        jax.ShapeDtypeStruct((n_pad, d), out_dtype, vma=vma),
        jax.ShapeDtypeStruct((d, h), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((d, h), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((4, h), jnp.float32, vma=vma),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(steps,),
        in_specs=specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    slope = 0.0 if negative_slope is None else float(negative_slope)
    return pl.pallas_call(
        partial(_bwd_ln_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz,
                has_scale=has_scale, has_resid=has_resid, slope=slope,
                has_ln_act=negative_slope is not None, has_cmap=has_cmap),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tile * h * (s_span * tile + 2 * d)
            + 4 * nb * tile * d * h,
            bytes_accessed=blocks_rev.a.size * blocks_rev.a.dtype.itemsize
            + steps * wsz * tile * (g.dtype.itemsize + xhat.dtype.itemsize) * h
            + n_pad * d * (x.dtype.itemsize + jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, *args)


# ------------------------------------------- LayerNorm-fused layer (VJP)


def _ln_fwd_xla(y, gamma, beta, eps):
    """f32 LayerNorm over the last axis; returns (z, xhat, rstd[N,1])."""
    y32 = y.astype(jnp.float32)
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    xc = y32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32), xhat, rstd


def _ln_bwd_prologue(g, xhat, rstd, gamma, beta, slope):
    """(dL/dout, LN residuals) -> (dL/dy_pre, dgamma, dbeta) — one fused
    XLA elementwise+row-reduce pass over [N, H]:

        z     = gamma·xhat + beta           (act' sign, no saved z)
        g̃     = g·act'(z)
        gz    = g̃·gamma
        dy    = rstd·(gz − mean(gz) − xhat·mean(gz·xhat))
        dγ/dβ = Σ_rows g̃·xhat / Σ_rows g̃
    """
    xhat32 = xhat.astype(jnp.float32)
    gamma32 = gamma.astype(jnp.float32)
    if slope is not None:
        z = xhat32 * gamma32 + beta.astype(jnp.float32)
        g = jnp.where(z > 0, g, jnp.asarray(slope, g.dtype) * g)
    gf = g.astype(jnp.float32)
    dgamma = (gf * xhat32).sum(axis=0).astype(gamma.dtype)
    dbeta = gf.sum(axis=0).astype(beta.dtype)
    gz = gf * gamma32
    m1 = gz.mean(axis=-1, keepdims=True)
    m2 = (gz * xhat32).mean(axis=-1, keepdims=True)
    dy = (gz - m1 - xhat32 * m2) * rstd
    return dy, dgamma, dbeta


def _ln_fused_fwd_impl(x, wl, wr, bias, gamma, beta, blocks, use_pallas,
                       slope, eps, interpret):
    if use_pallas:
        return banded_sage_fwd_pallas(
            x, wl, wr, bias, blocks, negative_slope=slope,
            ln=(gamma, beta), eps=eps, interpret=interpret)
    agg = spmm_banded_xla(x, blocks)
    y = agg @ wl + x @ wr
    if bias is not None:
        y = y + bias
    z, xhat, rstd = _ln_fwd_xla(y, gamma, beta, eps)
    return _act(z, slope).astype(x.dtype), xhat.astype(x.dtype), rstd


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def banded_sage_ln_apply(x, wl, wr, bias, gamma, beta,
                         blocks_fwd: BandedBlocks, blocks_rev: BandedBlocks,
                         use_pallas: bool,
                         negative_slope: float | None = None,
                         eps: float = 1e-5,
                         interpret: bool = False):
    """Differentiable SAGE layer WITH its LayerNorm + activation:
    act(LN(Â x Wl + x Wr + bias; gamma, beta, eps)) as one fused kernel
    each way — the pre-activation never materializes in HBM (forward
    saves xhat/rstd instead; backward turns dL/dout into dL/dy_pre in one
    XLA pass and rides the fused reverse kernel with in-kernel dW).
    Matches the model family's conv -> LayerNorm(1e-5) -> act ordering
    (reference src/models/blocks/sageblock.py:8-20)."""
    out, _, _ = _ln_fused_fwd_impl(x, wl, wr, bias, gamma, beta, blocks_fwd,
                                   use_pallas, negative_slope, eps, interpret)
    return out


def _ln_vjp_fwd(x, wl, wr, bias, gamma, beta, blocks_fwd, blocks_rev,
                use_pallas, negative_slope, eps, interpret):
    out, xhat, rstd = _ln_fused_fwd_impl(
        x, wl, wr, bias, gamma, beta, blocks_fwd, use_pallas,
        negative_slope, eps, interpret)
    return out, (x, wl, wr, bias, gamma, beta, xhat, rstd, blocks_rev)


def _ln_vjp_bwd(use_pallas, negative_slope, eps, interpret, res, g):
    x, wl, wr, bias, gamma, beta, xhat, rstd, blocks_rev = res
    f32 = jnp.float32
    if use_pallas and not blocks_rev.wide:
        # one-kernel backward: dy derived in-kernel from the raw g and the
        # xhat/rstd residuals; dgamma/dbeta/db accumulate in-kernel too
        dx, dwl, dwr, dstats = banded_sage_ln_bwd_pallas(
            g.astype(x.dtype), xhat, rstd, wl, wr, gamma, beta, blocks_rev,
            x, negative_slope=negative_slope, interpret=interpret)
        db = None if bias is None else dstats[2].astype(bias.dtype)
        return (dx.astype(x.dtype), dwl.astype(wl.dtype),
                dwr.astype(wr.dtype), db, dstats[0].astype(gamma.dtype),
                dstats[1].astype(beta.dtype), None, None)
    dy, dgamma, dbeta = _ln_bwd_prologue(g, xhat, rstd, gamma, beta,
                                         negative_slope)
    gq = dy.astype(x.dtype)
    if use_pallas:
        t = spmm_banded_pallas(gq, blocks_rev, interpret=interpret)
    else:
        t = spmm_banded_xla(gq, blocks_rev)
    dx = (
        jnp.dot(t, wl.T.astype(t.dtype), preferred_element_type=f32)
        + jnp.dot(gq, wr.T.astype(gq.dtype), preferred_element_type=f32)
    ).astype(x.dtype)
    dwl = jnp.dot(x.T, t.astype(x.dtype),
                  preferred_element_type=f32).astype(wl.dtype)
    dwr = jnp.dot(x.T, gq.astype(x.dtype),
                  preferred_element_type=f32).astype(wr.dtype)
    db = None if bias is None else dy.sum(axis=0).astype(bias.dtype)
    return dx, dwl, dwr, db, dgamma, dbeta, None, None


banded_sage_ln_apply.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
