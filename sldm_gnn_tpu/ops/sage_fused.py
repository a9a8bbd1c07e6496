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
                  has_row, has_bias, slope, has_resid):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    off_ref = rest.pop(0)
    rg_ref = rest.pop(0) if has_resid else None
    a_ref = rest.pop(0)
    rs_ref = rest.pop(0) if has_row else None
    wl_ref = rest.pop(0)
    wr_ref = rest.pop(0)
    b_ref = rest.pop(0) if has_bias else None
    r_hbm = rest.pop(0) if has_resid else None
    x_hbm, out_ref, xw, sems = rest[:4]
    if has_resid:
        rw, rsem = rest[4], rest[5]

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
            xs = xw[slot, pl.ds((offk + s) * tile, tile), :]
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
):
    """One fused SAGE layer over the banded layout (forward only; use
    :func:`banded_sage_apply` for training). ``negative_slope``: None = no
    activation, 0.0 = ReLU, else LeakyReLU.

    ``resid=(r_c, rg)``: compact residual aggregate ``r_c [m, K*T, H_in]``
    (slot 0 = zeros) + per-group slot map ``rg [steps]`` — added to each
    block's aggregate through a scalar-prefetch-indexed BlockSpec (groups
    without residual revisit the dummy slot, so no extra DMA moves for
    them). See ops/banded_residual.py."""
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
    prefetch = [blocks.woff, blocks.off]
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
    specs.append(pl.BlockSpec(memory_space=pl.ANY))  # x in HBM; windows DMA'd
    args.append(x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # woff [steps], off [steps*K], rg?
        grid=(steps,),
        in_specs=specs,
        out_specs=pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0)),
        scratch_shapes=scratch,
    )
    slope = None if negative_slope is None else float(negative_slope)
    return pl.pallas_call(
        partial(_fused_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz,
                has_row=has_row, has_bias=has_bias, slope=slope,
                has_resid=has_resid),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, h), out_dtype,
            vma=_operand_vma(x, wl, wr, blocks.a, blocks.off)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tile * d * (s_span * tile + 2 * h),
            bytes_accessed=blocks.a.size * blocks.a.dtype.itemsize
            + steps * wsz * tile * d * x.dtype.itemsize
            + n_pad * h * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, *args)


def _bwd_kernel(woff_ref, off_ref, *rest, s_span, K, tile, wsz, has_scale,
                has_resid):
    """Reverse fused kernel: per destination block b,
        t[b]  = Σ_s (A_rev[b,s] ⊙ scale[off+s]) @ g[off+s]   (= Âᵀ g̃ rows)
        dx[b] = t[b] @ Wlᵀ + g[own_b] @ Wrᵀ
    The g̃ windows stream UNSCALED (the Wrᵀ term needs raw rows); the
    forward-degree col scale streams alongside as [wsz, T] windows (one
    row per source block — lane-aligned) and folds into the A tile's
    COLUMNS, algebraically identical to scaling the g rows:
    A @ (s ⊙ g) = (A ⊙ sᵀ) @ g. This removes the XLA pre-scale pass (a
    full [N, H] materialize + re-read) without any lane→sublane relayout
    in the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = list(rest)
    rg_ref = rest.pop(0) if has_resid else None
    a_ref = rest.pop(0)
    wlt_ref = rest.pop(0)
    wrt_ref = rest.pop(0)
    tr_hbm = rest.pop(0) if has_resid else None
    scale_hbm, g_hbm, t_ref, dx_ref, gw, sw, sems = rest[:7]
    if has_resid:
        rw, rsem = rest[7], rest[8]

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

    wlt = wlt_ref[:].astype(jnp.bfloat16)
    wrt = wrt_ref[:].astype(jnp.bfloat16)
    for kk in range(K):
        offk = off_ref[g * K + kk]
        h = gw.shape[-1]
        acc = jnp.zeros((tile, h), jnp.float32)
        for s in range(s_span):
            rows = gw[slot, pl.ds((offk + s) * tile, tile), :]
            a_s = a_ref[kk, s].astype(jnp.bfloat16)
            if has_scale:
                # scale columns of A (== scaling the g rows): [1, T] lane
                # vector broadcast over sublanes — relayout-free
                a_s = a_s * sw[slot, pl.ds(offk + s, 1), :].astype(jnp.bfloat16)
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
        t_ref[kk * tile:(kk + 1) * tile] = acc.astype(t_ref.dtype)
        own = (g * K + kk) - woff_ref[g]
        go = gw[slot, pl.ds(own * tile, tile), :]
        dx = jnp.dot(acc.astype(jnp.bfloat16), wlt, preferred_element_type=jnp.float32)
        dx += jnp.dot(go.astype(jnp.bfloat16), wrt, preferred_element_type=jnp.float32)
        dx_ref[kk * tile:(kk + 1) * tile] = dx.astype(dx_ref.dtype)


def banded_sage_bwd_pallas(
    gq: jax.Array,
    wl: jax.Array,
    wr: jax.Array,
    blocks_rev: BandedBlocks,
    *,
    out_dtype=None,
    interpret: bool = False,
    resid=None,
):
    """Fused backward: returns ``(t, dx)`` where ``t = Âᵀ gq`` (feeds
    dWl = xᵀt) and ``dx = t @ Wlᵀ + gq @ Wrᵀ`` — one kernel instead of a
    scale pre-pass, a reverse aggregation, and two XLA matmuls re-reading
    t and gq. ``gq`` is the activation-masked upstream gradient,
    UNSCALED; ``blocks_rev`` is the reverse layout whose ``col_scale``
    (the forward 1/deg) streams as a window alongside gq.

    ``resid=(t_c, rg)``: compact reverse residual ``t_c [m, K*T, H]``
    (Rᵀ g̃ rows, slot 0 = zeros) + per-group slot map — added into the
    aggregate before the in-kernel dx matmuls (ops/banded_residual.py)."""
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # woff, off, rg?
        grid=(steps,),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((K * tile, h), lambda g, *_: (g, 0)),
            pl.BlockSpec((K * tile, d), lambda g, *_: (g, 0)),
        ),
        scratch_shapes=scratch,
    )
    t, dx = pl.pallas_call(
        partial(_bwd_kernel, s_span=s_span, K=K, tile=tile, wsz=wsz,
                has_scale=has_scale, has_resid=has_resid),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, h), out_dtype,
                                 vma=_operand_vma(gq, wl, blocks_rev.a)),
            jax.ShapeDtypeStruct((n_pad, d), out_dtype,
                                 vma=_operand_vma(gq, wl, wr, blocks_rev.a)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tile * h * (s_span * tile + 2 * d),
            bytes_accessed=blocks_rev.a.size * blocks_rev.a.dtype.itemsize
            + steps * wsz * tile * (h * gq.dtype.itemsize + 4)
            + n_pad * (h + d) * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*prefetch, *args)
    return t, dx


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
        # fused reverse kernel: t AND dx = t@Wlᵀ + g̃@Wrᵀ in one pass —
        # no scale pre-pass, no re-reads of t/g̃ for the dx matmuls
        t, dx = banded_sage_bwd_pallas(gq, wl, wr, blocks_rev,
                                       interpret=interpret)
        dx = dx.astype(x.dtype)
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
    dwl = jnp.dot(x.T, t.astype(x.dtype), preferred_element_type=f32).astype(wl.dtype)
    dwr = jnp.dot(x.T, gq.astype(x.dtype), preferred_element_type=f32).astype(wr.dtype)
    db = None if bias is None else g.sum(axis=0).astype(bias.dtype)
    return dx, dwl, dwr, db, None, None


banded_sage_apply.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
