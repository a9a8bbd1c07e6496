"""Hand-written torch implementation of the reference GruSage semantics,
used purely to generate golden values for parity tests (the real reference
depends on torch-geometric, which is not installed; these modules re-state
its documented math: SAGEConv mean aggregation, LayerNorm stacks, map
encoder/attention, global mean/max pooling).

NOT part of the framework — test-only helper.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchSageConv(nn.Module):
    """PyG SAGEConv(aggr='mean') semantics: lin_l(mean_agg) + lin_r(x)."""

    def __init__(self, din, dout):
        super().__init__()
        self.lin_l = nn.Linear(din, dout, bias=True)
        self.lin_r = nn.Linear(din, dout, bias=False)

    def forward(self, x, edge_index):
        src, dst = edge_index[0], edge_index[1]
        agg = torch.zeros_like(x)
        deg = torch.zeros(x.size(0), dtype=x.dtype)
        if src.numel():
            agg = agg.index_add(0, dst, x[src])
            deg = deg.index_add(0, dst, torch.ones(src.numel(), dtype=x.dtype))
        agg = agg / deg.clamp(min=1).unsqueeze(1)
        return self.lin_l(agg) + self.lin_r(x)


class TorchSageBlock(nn.Module):
    def __init__(self, hdims, negative_slope=None):
        super().__init__()
        self.convs = nn.ModuleList(
            [TorchSageConv(hdims[i], hdims[i + 1]) for i in range(len(hdims) - 1)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(h) for h in hdims[1:]])
        self.negative_slope = negative_slope

    def forward(self, x, edge_index):
        for conv, norm in zip(self.convs, self.norms):
            x = conv(x, edge_index)
            x = norm(x)
            x = F.leaky_relu(x, self.negative_slope) if self.negative_slope is not None else F.relu(x)
        return x


class TorchMapEncoder(nn.Module):
    def __init__(self, num_lane_types, lane_embed_dim, feat_dim, sage_hdims, negative_slope):
        super().__init__()
        self.lane_embedding = nn.Embedding(num_lane_types, lane_embed_dim)
        self.sage = TorchSageBlock([feat_dim + lane_embed_dim] + list(sage_hdims), negative_slope)

    def forward(self, feats, lane_cats, edge_index):
        x = torch.cat([feats, self.lane_embedding(lane_cats)], dim=1)
        return self.sage(x, edge_index)


class TorchMapAttention(nn.Module):
    def __init__(self, k=5):
        super().__init__()
        self.k = k
        self.attn_mlp = nn.Sequential(nn.Linear(1, 16), nn.ReLU(), nn.Linear(16, 1))

    def forward(self, positions, centroids, map_embeddings):
        diff = positions.unsqueeze(1) - centroids.unsqueeze(0)
        dists = torch.norm(diff, dim=2)
        neg, idx = torch.topk(-dists, k=self.k, dim=1)
        k_dists = -neg
        gathered = map_embeddings[idx, :]
        scores = self.attn_mlp(k_dists.unsqueeze(2)).squeeze(2)
        weights = F.softmax(scores, dim=1).unsqueeze(2)
        return torch.sum(gathered * weights, dim=1)


class TorchGruSage(nn.Module):
    """Reference GruSage forward (grusage.py:152-192), eval mode only
    (no dropout), over a single concatenated multi-graph batch."""

    def __init__(
        self,
        *,
        dyn_feats=6,
        gru_hidden=16,
        gru_layers=1,
        fc1dims=(16,),
        sage_hdims=(16, 16),
        fc2dims=(8,),
        out_dim=1,
        num_st_types=256,
        emb_dim=4,
        negative_slope=0.1,
        pooling="double",
        map_included=False,
        num_lane_types=3,
        map_feat_dim=9,
        mapenc_lane_embdim=2,
        mapenc_sage_hdims=(8, 8),
        map_topk=5,
    ):
        super().__init__()
        self.st_emb = nn.Embedding(num_st_types, emb_dim)
        self.gru = nn.GRU(dyn_feats, gru_hidden, num_layers=gru_layers, batch_first=True)
        d = gru_hidden + 2 + emb_dim
        dims1 = [d] + list(fc1dims)
        self.fc1s = nn.ModuleList(
            [nn.Linear(dims1[i], dims1[i + 1]) for i in range(len(dims1) - 1)]
        )
        d = dims1[-1]
        self.map_included = map_included
        if map_included:
            self.map_encoder = TorchMapEncoder(
                num_lane_types, mapenc_lane_embdim, map_feat_dim, mapenc_sage_hdims, negative_slope
            )
            self.map_attention = TorchMapAttention(map_topk)
            d += mapenc_sage_hdims[-1]
        self.sage = TorchSageBlock([d] + list(sage_hdims), negative_slope)
        d = sage_hdims[-1]
        self.pooling = pooling
        if pooling == "double":
            d *= 2
        dims2 = [d] + list(fc2dims)
        self.fc2s = nn.ModuleList(
            [nn.Linear(dims2[i], dims2[i + 1]) for i in range(len(dims2) - 1)]
        )
        self.linout = nn.Linear(dims2[-1], out_dim)
        self.negative_slope = negative_slope

    def _act(self, x):
        return (
            F.leaky_relu(x, self.negative_slope)
            if self.negative_slope is not None
            else F.relu(x)
        )

    def forward(self, x, xsttype, xdims, pos_raw, edge_index, batch_vec, num_graphs, map_args=None):
        st = self.st_emb(xsttype)
        _, h = self.gru(x)
        h = h[-1]
        z = torch.cat([h, xdims, st], dim=1)
        for fc in self.fc1s:
            z = self._act(fc(z))
        if self.map_included:
            feats, lane_cats, map_edges, centroids = map_args
            memb = self.map_encoder(feats, lane_cats, map_edges)
            ctx = self.map_attention(pos_raw[:, -1, :], centroids, memb)
            z = torch.cat([z, ctx], dim=1)
        z = self.sage(z, edge_index)
        # global pooling per graph
        pooled = []
        for g in range(num_graphs):
            zg = z[batch_vec == g]
            if self.pooling == "mean":
                pooled.append(zg.mean(0))
            elif self.pooling == "max":
                pooled.append(zg.max(0).values)
            else:
                pooled.append(torch.cat([zg.mean(0), zg.max(0).values]))
        z = torch.stack(pooled)
        for fc in self.fc2s:
            z = self._act(fc(z))
        return self.linout(z)
