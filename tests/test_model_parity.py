"""Golden-value parity: flax GruSage on a PaddedGraphBatch must reproduce
the torch reference semantics (tests/torch_ref.py) bit-closely in fp32.

This is the activation-parity check SURVEY.md §4 calls for: identical
weights are transplanted from the torch replica into the flax param tree and
the logits of real (non-padded) graphs are compared.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sldm_gnn_tpu.graph.batching import BatchDims, pad_and_batch
from sldm_gnn_tpu.graph.containers import GraphArrays
from sldm_gnn_tpu.models import GruSage, GruSageConfig, MapData

from tests.torch_ref import TorchGruSage


def _lin(mod):
    return {"kernel": jnp.array(mod.weight.detach().numpy().T), "bias": jnp.array(mod.bias.detach().numpy())}


def _lin_nb(mod):
    return {"kernel": jnp.array(mod.weight.detach().numpy().T)}


def _sage_block_params(block):
    out = {}
    for i, (conv, norm) in enumerate(zip(block.convs, block.norms)):
        out[f"conv{i}"] = {"lin_l": _lin(conv.lin_l), "lin_r": _lin_nb(conv.lin_r)}
        out[f"norm{i}"] = {
            "scale": jnp.array(norm.weight.detach().numpy()),
            "bias": jnp.array(norm.bias.detach().numpy()),
        }
    return out


def _gru_params(gru):
    sd = {k: v.detach().numpy() for k, v in gru.state_dict().items()}
    L, H = gru.num_layers, gru.hidden_size
    rest = lambda pat: (
        np.stack([sd[pat.format(l)] for l in range(1, L)])
        if L > 1
        else np.zeros((0,) + sd[pat.format(0)].shape, np.float32)
    )
    out = {
        "w_ih0": jnp.array(sd["weight_ih_l0"].T),
        "w_hh0": jnp.array(sd["weight_hh_l0"].T),
        "b_ih0": jnp.array(sd["bias_ih_l0"]),
        "b_hh0": jnp.array(sd["bias_hh_l0"]),
        "w_ih": jnp.array(np.swapaxes(rest("weight_ih_l{}"), -1, -2)),
        "w_hh": jnp.array(np.swapaxes(rest("weight_hh_l{}"), -1, -2)),
        "b_ih": jnp.array(rest("bias_ih_l{}")),
        "b_hh": jnp.array(rest("bias_hh_l{}")),
    }
    return out


def transplant(tm: TorchGruSage, map_included: bool) -> dict:
    params = {
        "st_emb": {"embedding": jnp.array(tm.st_emb.weight.detach().numpy())},
        "gru": _gru_params(tm.gru),
        "fc1s": {f"fc{i}": _lin(fc) for i, fc in enumerate(tm.fc1s)},
        "sage": _sage_block_params(tm.sage),
        "fc2s": {f"fc{i}": _lin(fc) for i, fc in enumerate(tm.fc2s)},
        "linout": _lin(tm.linout),
    }
    if map_included:
        params["map_encoder"] = {
            "lane_embedding": {
                "embedding": jnp.array(tm.map_encoder.lane_embedding.weight.detach().numpy())
            },
            "sage": _sage_block_params(tm.map_encoder.sage),
        }
        params["map_attention"] = {
            "attn_fc0": _lin(tm.map_attention.attn_mlp[0]),
            "attn_fc1": _lin(tm.map_attention.attn_mlp[2]),
        }
    return params


def _mk_graphs(rng, n_graphs, F, L=2):
    gs = []
    for _ in range(n_graphs):
        v = int(rng.integers(3, 8))
        e = int(rng.integers(2, v * (v - 1) + 1))
        src = rng.integers(0, v, e).astype(np.int32)
        dst = (src + 1 + rng.integers(0, v - 1, e).astype(np.int32)) % v  # no self loops
        gs.append(
            GraphArrays(
                x=rng.standard_normal((v, F, 6)).astype(np.float32),
                xsttype=rng.integers(0, 5, v).astype(np.int32),
                xdims=rng.standard_normal((v, 2)).astype(np.float32),
                edge_index=np.stack([src, dst]),
                edge_attr=rng.standard_normal((e, 4)).astype(np.float32),
                y=rng.integers(0, 2, L).astype(np.float32),
                pos_raw=rng.standard_normal((v, F, 2)).astype(np.float32),
            )
        )
    return gs


@pytest.mark.parametrize("map_included", [False, True])
@pytest.mark.parametrize("pooling", ["double", "mean", "max"])
def test_grusage_matches_torch(rng, map_included, pooling):
    torch.manual_seed(3)
    F, L = 12, 2
    gs = _mk_graphs(rng, 4, F)

    tm = TorchGruSage(
        gru_hidden=16,
        gru_layers=2,
        fc1dims=(16,),
        sage_hdims=(16, 16),
        fc2dims=(8,),
        out_dim=L,
        emb_dim=4,
        negative_slope=0.1,
        pooling=pooling,
        map_included=map_included,
    ).eval()

    # --- torch golden path over the concatenated (unpadded) batch
    xs = np.concatenate([g.x for g in gs])
    stt = np.concatenate([g.xsttype for g in gs])
    xd = np.concatenate([g.xdims for g in gs])
    pr = np.concatenate([g.pos_raw for g in gs])
    offs = np.cumsum([0] + [g.num_nodes for g in gs])
    ei = np.concatenate(
        [g.edge_index + offs[i] for i, g in enumerate(gs)], axis=1
    )
    bvec = np.concatenate([np.full(g.num_nodes, i) for i, g in enumerate(gs)])

    S = 14
    feats = rng.standard_normal((S, 9)).astype(np.float32)
    lane_cats = rng.integers(0, 3, S).astype(np.int64)
    mape = np.stack([rng.integers(0, S, 25), rng.integers(0, S, 25)]).astype(np.int64)
    cents = rng.standard_normal((S, 2)).astype(np.float32)

    map_args = (
        (torch.tensor(feats), torch.tensor(lane_cats), torch.tensor(mape), torch.tensor(cents))
        if map_included
        else None
    )
    with torch.no_grad():
        golden = tm(
            torch.tensor(xs),
            torch.tensor(stt.astype(np.int64)),
            torch.tensor(xd),
            torch.tensor(pr),
            torch.tensor(ei.astype(np.int64)),
            torch.tensor(bvec),
            len(gs),
            map_args,
        ).numpy()

    # --- flax path over the padded batch
    dims = BatchDims(
        node_capacity=40, edge_capacity=120, graph_capacity=6, num_frames=F, num_labels=L
    )
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))
    cfg = GruSageConfig(
        frames_num=F,
        gru_hidden_size=16,
        gru_num_layers=2,
        fc1dims=(16,),
        sage_hidden_dims=(16, 16),
        fc2dims=(8,),
        out_dim=L,
        emb_dim=4,
        dropout=0.25,  # inactive at train=False
        negative_slope=0.1,
        global_pooling=pooling,
        map_included=map_included,
        num_lane_types=3,
        mapenc_sage_hdims=(8, 8),
        mapenc_lane_embdim=2,
    )
    model = GruSage(cfg)
    params = transplant(tm, map_included)
    md = (
        MapData(
            feats=jnp.array(feats),
            lane_type_cats=jnp.array(lane_cats.astype(np.int32)),
            edge_src=jnp.array(mape[0].astype(np.int32)),
            edge_dst=jnp.array(mape[1].astype(np.int32)),
            centroids=jnp.array(cents),
        )
        if map_included
        else None
    )
    logits = np.asarray(model.apply({"params": params}, batch, map_data=md, train=False))

    np.testing.assert_allclose(logits[: len(gs)], golden, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_baked_map_embeddings_match_live(rng):
    """Inference with pre-baked map embeddings must equal the live map path
    (the reference's snapshot trick, grusage.py:144-149)."""
    torch.manual_seed(5)
    F, L = 8, 1
    gs = _mk_graphs(rng, 3, F, L)
    dims = BatchDims(node_capacity=32, edge_capacity=128, graph_capacity=4, num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))

    S = 10
    md = MapData(
        feats=jnp.array(rng.standard_normal((S, 9)).astype(np.float32)),
        lane_type_cats=jnp.array(rng.integers(0, 3, S).astype(np.int32)),
        edge_src=jnp.array(rng.integers(0, S, 15).astype(np.int32)),
        edge_dst=jnp.array(rng.integers(0, S, 15).astype(np.int32)),
        centroids=jnp.array(rng.standard_normal((S, 2)).astype(np.float32)),
    )
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=True, num_lane_types=3,
    )
    model = GruSage(cfg)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch, map_data=md, train=False)
    live = model.apply(vs, batch, map_data=md, train=False)

    baked = model.apply(
        vs,
        batch,
        map_embeddings=model.apply(vs, md, method=GruSage.encode_map),
        map_centroids=md.centroids,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(live), np.asarray(baked), rtol=1e-6)


@pytest.mark.slow
def test_bf16_compute_mode(rng):
    """compute_dtype='bfloat16' runs the dense/SAGE stacks in bf16 with f32
    params/logits, loosely matching the f32 model on identical weights."""
    F, L = 8, 2
    gs = _mk_graphs(rng, 3, F, L)
    dims = BatchDims(node_capacity=32, edge_capacity=128, graph_capacity=4,
                     num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))

    base = dict(
        frames_num=F, gru_hidden_size=16, fc1dims=(16,), sage_hidden_dims=(16,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=False,
    )
    m32 = GruSage(GruSageConfig(**base))
    m16 = GruSage(GruSageConfig(**base, compute_dtype="bfloat16"))
    vs = m32.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    # params are f32 in both modes (param_dtype default)
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(vs["params"]))
    out32 = np.asarray(m32.apply(vs, batch, train=False))
    out16j = m16.apply(vs, batch, train=False)
    assert out16j.dtype == jnp.float32  # logits head stays f32
    np.testing.assert_allclose(np.asarray(out16j), out32, rtol=0.1, atol=0.05)


def test_dense_aligned_batch_matches_flat(rng):
    """pad_and_batch_aligned + the scatter-free dense SAGE/pool path must
    reproduce the flat segment-op path's logits (same params; fp32
    summation-order tolerance)."""
    import jax
    import jax.numpy as jnp

    from sldm_gnn_tpu.graph.batching import (BatchDims, pad_and_batch,
                                             pad_and_batch_aligned)
    from sldm_gnn_tpu.graph.containers import GraphArrays
    from sldm_gnn_tpu.models import GruSage, GruSageConfig

    F, L = 5, 3
    gs = []
    for i in range(6):
        v = int(rng.integers(2, 7))
        x = rng.standard_normal((v, F, 6)).astype(np.float32)
        ne = int(rng.integers(1, v * v))
        src = rng.integers(0, v, ne).astype(np.int32)
        dst = rng.integers(0, v, ne).astype(np.int32)
        y = (rng.random(L) < 0.5).astype(np.float32)
        gs.append(GraphArrays(
            x=x, xsttype=rng.integers(0, 5, v).astype(np.int32),
            xdims=rng.uniform(1, 3, (v, 2)).astype(np.float32),
            edge_index=np.stack([src, dst]),
            edge_attr=np.zeros((ne, 4), np.float32), y=y,
            pos_raw=x[:, :, :2]))

    flat_dims = BatchDims(node_capacity=48, edge_capacity=256,
                          graph_capacity=6, num_frames=F, num_labels=L)
    flat = jax.tree.map(jnp.asarray, pad_and_batch(gs, flat_dims))
    dense = jax.tree.map(jnp.asarray, pad_and_batch_aligned(
        gs, 8, num_frames=F, num_labels=L))
    assert dense.adj is not None and dense.adj.shape == (6, 8, 8)

    cfg = GruSageConfig(frames_num=F, gru_hidden_size=8, fc1dims=(8,),
                        sage_hidden_dims=(8, 8), fc2dims=(8,), out_dim=L,
                        dropout=None)
    model = GruSage(cfg)
    params = model.init(jax.random.PRNGKey(0), flat)["params"]
    lf = np.asarray(model.apply({"params": params}, flat))
    ld = np.asarray(model.apply({"params": params}, dense))
    np.testing.assert_allclose(ld, lf, rtol=2e-5, atol=2e-5)


def test_knn_impl_pallas_matches_topk(rng):
    """GruSage(knn_impl='pallas') reproduces the topk model's logits AND
    its train-step parameter gradients on identical weights (the fused
    distance+select kernel carries no cotangent — positions/centroids
    are input data; only indices and primal k_dists cross into the
    differentiated graph)."""
    from dataclasses import replace

    torch.manual_seed(7)
    F, L = 8, 2
    gs = _mk_graphs(rng, 3, F, L)
    dims = BatchDims(node_capacity=32, edge_capacity=128, graph_capacity=4,
                     num_frames=F, num_labels=L)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(gs, dims))

    S = 150  # non-128-multiple lane padding in the kernel
    md = MapData(
        feats=jnp.array(rng.standard_normal((S, 9)).astype(np.float32)),
        lane_type_cats=jnp.array(rng.integers(0, 3, S).astype(np.int32)),
        edge_src=jnp.array(rng.integers(0, S, 40).astype(np.int32)),
        edge_dst=jnp.array(rng.integers(0, S, 40).astype(np.int32)),
        centroids=jnp.array(rng.standard_normal((S, 2)).astype(np.float32) * 10),
    )
    cfg = GruSageConfig(
        frames_num=F, gru_hidden_size=8, fc1dims=(8,), sage_hidden_dims=(8,),
        fc2dims=(8,), out_dim=L, emb_dim=4, dropout=None, negative_slope=0.1,
        map_included=True, num_lane_types=3,
    )
    m0 = GruSage(cfg)
    m1 = GruSage(replace(cfg, knn_impl="pallas"))
    vs = m0.init({"params": jax.random.PRNGKey(0)}, batch, map_data=md, train=False)

    out0 = m0.apply(vs, batch, map_data=md, train=False)
    out1 = m1.apply(vs, batch, map_data=md, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)

    def mk_loss(model):
        def loss(p):
            lg = model.apply(p, batch, map_data=md, train=False)
            return jnp.mean(jnp.where(batch.graph_mask[:, None], lg, 0.0) ** 2)
        return loss

    g0 = jax.grad(mk_loss(m0))(vs)
    g1 = jax.grad(mk_loss(m1))(vs)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_dense_map_adj_matches_edge_encoder(rng):
    """MapData.adj (dense_map_adj) runs the map encoder scatter-free and
    matches the edge-scatter path — outputs AND parameter grads — on a
    multigraph with masked padding edges."""
    from dataclasses import replace as dreplace

    from sldm_gnn_tpu.models.map_modules import MapEncoder, dense_map_adj

    S = 60
    es = rng.integers(0, S, 140).astype(np.int32)
    ed = rng.integers(0, S, 140).astype(np.int32)
    es[10] = es[11]; ed[10] = ed[11]  # duplicate edge: multiplicity counts
    mask = np.ones(140, bool); mask[-15:] = False  # padding edges dropped
    md = MapData(
        feats=jnp.array(rng.standard_normal((S, 9)).astype(np.float32)),
        lane_type_cats=jnp.array(rng.integers(0, 3, S).astype(np.int32)),
        edge_src=jnp.array(es), edge_dst=jnp.array(ed),
        centroids=jnp.array(rng.standard_normal((S, 2)).astype(np.float32)),
        edge_mask=jnp.array(mask),
    )
    md_dense = dreplace(md, adj=jnp.asarray(dense_map_adj(md)))

    enc = MapEncoder(num_lane_types=3, sage_hidden_dims=(8, 8))
    vs = enc.init({"params": jax.random.PRNGKey(0)}, md, train=False)
    out0 = enc.apply(vs, md, train=False)
    out1 = enc.apply(vs, md_dense, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)

    g0 = jax.grad(lambda p: jnp.sum(enc.apply(p, md, train=False) ** 2))(vs)
    g1 = jax.grad(lambda p: jnp.sum(enc.apply(p, md_dense, train=False) ** 2))(vs)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
