"""SDDMM kernel tests: per-edge dot products, layout round trip, VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sldm_gnn_tpu.graph.csr import block_edges, pad_nodes
from sldm_gnn_tpu.ops.sddmm import (
    chunk_scores_to_edge_order,
    prepare_sddmm,
    sddmm_apply,
    sddmm_pallas,
    sddmm_xla,
    _sddmm_chunk_xla,
)


def test_sddmm_xla_matches_naive(rng):
    n, e, d = 60, 300, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = rng.standard_normal((n, d)).astype(np.float32)
    got = np.asarray(sddmm_xla(jnp.array(x), jnp.array(y), jnp.array(src), jnp.array(dst)))
    want = np.array([x[dst[i]] @ y[src[i]] for i in range(e)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sddmm_pallas_interpret_matches_xla(rng):
    n, e, d = 300, 1200, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    n_pad = pad_nodes(n)
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    y = rng.standard_normal((n_pad, d)).astype(np.float32)
    blocked = block_edges(src, dst, n_pad)

    chunks = sddmm_pallas(jnp.array(x), jnp.array(y), blocked, interpret=True)
    got = np.asarray(chunk_scores_to_edge_order(chunks, blocked, e))
    want = np.asarray(sddmm_xla(jnp.array(x), jnp.array(y), jnp.array(src), jnp.array(dst)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # chunk-layout XLA path agrees too
    chunks2 = _sddmm_chunk_xla(jnp.array(x), jnp.array(y), blocked)
    got2 = np.asarray(chunk_scores_to_edge_order(chunks2, blocked, e))
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-4)


def test_sddmm_apply_grads_match_autodiff(rng):
    n, e, d = 50, 250, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    fwd, rev, n_pad = prepare_sddmm(src, dst, n)
    x = jnp.array(rng.standard_normal((n_pad, d)).astype(np.float32))
    y = jnp.array(rng.standard_normal((n_pad, d)).astype(np.float32))
    srcj, dstj = jnp.array(src), jnp.array(dst)
    coef = jnp.array(rng.standard_normal(e).astype(np.float32))

    def loss_custom(x, y):
        s = sddmm_apply(x, y, fwd, rev, n_pad, False, e)
        return jnp.sum(jnp.tanh(s) * coef)

    def loss_plain(x, y):
        return jnp.sum(jnp.tanh(sddmm_xla(x, y, srcj, dstj)) * coef)

    np.testing.assert_allclose(
        float(loss_custom(x, y)), float(loss_plain(x, y)), rtol=1e-5
    )
    gx1, gy1 = jax.grad(loss_custom, argnums=(0, 1))(x, y)
    gx2, gy2 = jax.grad(loss_plain, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), rtol=1e-4, atol=1e-5)


def test_edge_attention_composition(rng):
    """SDDMM scores -> per-destination softmax -> weighted SpMM equals a
    dense masked attention on a small graph (the GAT-style layer the two
    kernels compose into)."""
    from sldm_gnn_tpu.ops.spmm import spmm_xla

    n, d = 12, 4
    # dense-ish graph
    src, dst = np.nonzero(~np.eye(n, dtype=bool))
    keep = rng.random(len(src)) < 0.4
    src, dst = src[keep].astype(np.int64), dst[keep].astype(np.int64)
    e = len(src)
    x = rng.standard_normal((n, d)).astype(np.float32)

    scores = np.asarray(sddmm_xla(jnp.array(x), jnp.array(x), jnp.array(src), jnp.array(dst)))
    # per-destination softmax over incoming edges
    alpha = np.zeros(e, np.float32)
    for i in range(n):
        m = dst == i
        if m.any():
            s = scores[m]
            ex = np.exp(s - s.max())
            alpha[m] = ex / ex.sum()
    out = np.asarray(
        spmm_xla(jnp.array(x), jnp.array(src), jnp.array(dst), jnp.array(alpha), n)
    )

    # dense reference
    att = np.full((n, n), -np.inf, np.float32)
    att[dst, src] = scores
    with np.errstate(over="ignore"):
        w = np.exp(att - att.max(axis=1, keepdims=True))
    w[np.isnan(w)] = 0.0
    denom = w.sum(axis=1, keepdims=True)
    w = np.divide(w, denom, out=np.zeros_like(w), where=denom > 0)
    want = w @ x
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
