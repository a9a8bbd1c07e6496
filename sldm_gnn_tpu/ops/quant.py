"""Int8 quantization kernels (inference-path compression).

Per-row symmetric int8 quantization of feature/weight matrices with either
deterministic round-to-nearest or TPU-PRNG stochastic rounding (the Pallas
built-in ``pltpu.stochastic_round``), plus an int8×int8→int32 matmul helper
so quantized inference runs the MXU at its int8 rate. XLA reference
implementations back the tests and CPU path.

Usage sketch (quantized linear):

    qw, sw = quantize_rows(w.T)            # per-output-channel scales
    qx, sx = quantize_rows(x)              # per-row activation scales
    y = int8_matmul(qx, sx, qw, sw)        # == (x @ w) up to quant error
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_rows_xla(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Reference path: per-row absmax int8 quantization."""
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant_kernel(seed_ref, x_ref, q_ref, s_ref, *, stochastic):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    scaled = x / scale
    if stochastic:
        # pltpu.stochastic_round only targets bf16/fp8 dtypes; int8
        # stochastic rounding is the classic floor(x + U[0,1)) construction
        # from raw PRNG bits instead
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        # Mosaic has no uint32->f32 cast: pack the top 23 random bits into a
        # float32 mantissa with exponent 0 -> uniform in [1, 2), subtract 1
        mant = jnp.bitwise_or(
            jnp.right_shift(bits, jnp.uint32(9)), jnp.uint32(0x3F800000)
        )
        u = pltpu.bitcast(mant, jnp.float32) - 1.0
        q = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)
    else:
        q = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    q_ref[:] = q
    s_ref[:] = scale.astype(jnp.float32)


def quantize_rows_pallas(
    x: jax.Array,
    *,
    stochastic: bool = False,
    seed: int = 0,
    block_rows: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pallas per-row int8 quantization; rows must divide into block_rows
    (pad beforehand) and the row count must be a multiple of 8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    br = min(block_rows, n)
    assert n % br == 0, f"rows {n} not a multiple of block {br}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // br,),
        in_specs=[pl.BlockSpec((br, d), lambda i, seed: (i, 0))],
        out_specs=[
            pl.BlockSpec((br, d), lambda i, seed: (i, 0)),
            pl.BlockSpec((br, 1), lambda i, seed: (i, 0)),
        ],
    )
    q, s = pl.pallas_call(
        partial(_quant_kernel, stochastic=stochastic),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.array([seed], jnp.int32), x)
    return q, s


def dequantize_rows(q: jax.Array, scales: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scales


def quantize_tensor_xla(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-TENSOR absmax int8 quantization: one scalar scale for the whole
    matrix. Coarser than :func:`quantize_rows_xla` (outlier rows cost
    everyone precision) but lets SpMM fold dequantization into a single
    output rescale instead of a per-edge scale gather — see
    :func:`sldm_gnn_tpu.ops.spmm.spmm_pallas_int8_pt`. Returns
    ``(q [n, d] int8, scale [1] f32)``."""
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(1).astype(jnp.float32)


def int8_matmul(qx: jax.Array, sx: jax.Array, qw: jax.Array, sw: jax.Array) -> jax.Array:
    """``(x @ w)`` from int8 operands: int8×int8→int32 on the MXU, then one
    f32 rescale. ``qw``/``sw`` quantized per output channel (rows of w.T)."""
    acc = jax.lax.dot_general(
        qx, qw.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw.T
