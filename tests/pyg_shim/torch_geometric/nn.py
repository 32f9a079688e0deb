"""Clean-room implementations of the five torch_geometric.nn symbols used
by /root/reference/Models/BuckGNN.py:3-6, matching the documented PyG
semantics:

- SAGEConv(in, out, normalize, aggr): out = lin_l(aggr_{j->i} x_j) +
  lin_r(x_i), optional L2 row-normalization; lin_l carries the bias,
  lin_r doesn't (PyG SAGEConv docs). Messages flow edge_index[0] ->
  edge_index[1].
- global_{mean,max,add}_pool(x, batch): segment reductions over the
  graph-id vector (batch=None -> one graph).
- SAGPooling(in, ratio, GNN, **kw): score = GNN(x, edge_index) squeezed,
  tanh nonlinearity, per-graph top-ceil(ratio*n) selection, x[perm] *
  score[perm], edges filtered to kept nodes and relabeled.

Used ONLY by tests/test_reference_model_parity.py so the reference file
runs unmodified; the framework itself never imports this.
"""

import math

import torch
import torch.nn as nn

from torch_scatter import scatter_add, scatter_max, scatter_mean


def global_add_pool(x, batch):
    if batch is None:
        return x.sum(dim=0, keepdim=True)
    n = int(batch.max().item()) + 1
    return scatter_add(x, batch, dim_size=n)


def global_mean_pool(x, batch):
    if batch is None:
        return x.mean(dim=0, keepdim=True)
    n = int(batch.max().item()) + 1
    return scatter_mean(x, batch, dim_size=n)


def global_max_pool(x, batch):
    if batch is None:
        return x.max(dim=0, keepdim=True).values
    n = int(batch.max().item()) + 1
    return scatter_max(x, batch, dim_size=n)[0]


class SAGEConv(nn.Module):
    def __init__(self, in_channels, out_channels, normalize=False,
                 aggr="mean", root_weight=True, bias=True):
        super().__init__()
        self.aggr = "add" if aggr == "sum" else aggr
        self.normalize = normalize
        self.root_weight = root_weight
        self.lin_l = nn.Linear(in_channels, out_channels, bias=bias)
        if root_weight:
            self.lin_r = nn.Linear(in_channels, out_channels, bias=False)

    def forward(self, x, edge_index):
        src, dst = edge_index[0], edge_index[1]
        n = x.size(0)
        msg = x[src]
        if self.aggr == "add":
            agg = scatter_add(msg, dst, dim_size=n)
        elif self.aggr == "mean":
            agg = scatter_mean(msg, dst, dim_size=n)
        elif self.aggr == "max":
            agg = scatter_max(msg, dst, dim_size=n)[0]
        else:
            raise ValueError(self.aggr)
        out = self.lin_l(agg)
        if self.root_weight:
            out = out + self.lin_r(x)
        if self.normalize:
            out = out / out.norm(p=2, dim=-1, keepdim=True).clamp_min(1e-12)
        return out


def _topk(score, ratio, batch):
    """Per-graph top-ceil(ratio*n) node indices, descending score within
    each graph, graphs in order."""
    n_graphs = int(batch.max().item()) + 1
    perm = []
    for g in range(n_graphs):
        idx = torch.where(batch == g)[0]
        k = int(math.ceil(ratio * idx.numel()))
        top = torch.topk(score[idx], k).indices
        perm.append(idx[top])
    return torch.cat(perm)


class SAGPooling(nn.Module):
    def __init__(self, in_channels, ratio=0.5, GNN=SAGEConv, min_score=None,
                 multiplier=1.0, nonlinearity=torch.tanh, **kwargs):
        super().__init__()
        if min_score is not None:
            raise NotImplementedError("shim supports min_score=None only")
        self.ratio = ratio
        self.multiplier = multiplier
        self.nonlinearity = nonlinearity
        self.gnn = GNN(in_channels, 1, **kwargs)

    def forward(self, x, edge_index, edge_attr=None, batch=None, attn=None):
        if batch is None:
            batch = edge_index.new_zeros(x.size(0))
        attn = x if attn is None else attn
        score = self.gnn(attn, edge_index).view(-1)
        score = self.nonlinearity(score)
        perm = _topk(score, self.ratio, batch)
        x = x[perm] * score[perm].view(-1, 1)
        if self.multiplier != 1.0:
            x = self.multiplier * x
        # filter_adj: keep edges whose endpoints both survive, relabel
        n = score.size(0)
        lut = torch.full((n,), -1, dtype=torch.long, device=x.device)
        lut[perm] = torch.arange(perm.numel(), device=x.device)
        row, col = lut[edge_index[0]], lut[edge_index[1]]
        keep = (row >= 0) & (col >= 0)
        edge_index = torch.stack([row[keep], col[keep]])
        if edge_attr is not None:
            edge_attr = edge_attr[keep]
        return x, edge_index, edge_attr, batch[perm], perm, score[perm]
