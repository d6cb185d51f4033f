"""Torch reference implementation of the layer semantics the reference repo
gets from DGL 0.8.2 (dgl.nn.pytorch.SAGEConv('pool')) — used to generate
golden activations for parity tests (SURVEY.md §4(b)).

DGL itself is not installable in this environment, so this re-states the
documented 0.8.x semantics directly (see SURVEY.md §2.2):
    h_pool_j = relu(fc_pool(h_j))
    m_i      = elementwise max over in-neighbors j of i (0 if none)
    out_i    = fc_self(h_i) + fc_neigh(m_i) + bias
with fc_self/fc_neigh bias-free and one shared zero-init output bias.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class RefSagePool(nn.Module):
    def __init__(self, in_feats, out_feats):
        super().__init__()
        self.fc_pool = nn.Linear(in_feats, in_feats)
        self.fc_self = nn.Linear(in_feats, out_feats, bias=False)
        self.fc_neigh = nn.Linear(in_feats, out_feats, bias=False)
        self.bias = nn.Parameter(torch.zeros(out_feats))
        gain = nn.init.calculate_gain("relu")
        nn.init.xavier_uniform_(self.fc_pool.weight, gain=gain)
        nn.init.xavier_uniform_(self.fc_self.weight, gain=gain)
        nn.init.xavier_uniform_(self.fc_neigh.weight, gain=gain)

    def forward(self, adj_lists, x):
        pooled = F.relu(self.fc_pool(x))
        m = torch.zeros_like(pooled)
        for i, nb in enumerate(adj_lists):
            if len(nb):
                m[i] = pooled[nb].max(dim=0).values
        m = self.fc_neigh(m)
        return self.fc_self(x) + m + self.bias


class RefGNN32(nn.Module):
    """Mirror of /root/reference/code/model.py:10-31 (GNN32)."""

    def __init__(self, in_feats, h1, h2, h3, h4, num_classes):
        super().__init__()
        self.conv1 = RefSagePool(in_feats, h1)
        self.conv2 = RefSagePool(h1, h2)
        self.conv3 = RefSagePool(h2, h3)
        self.liner1 = nn.Linear(h3, h4)
        self.liner2 = nn.Linear(h4, num_classes)

    def forward(self, adj_lists, x, return_acts=False):
        acts = {}
        h = self.conv1(adj_lists, x)
        acts["conv1"] = h
        h = F.leaky_relu(h)
        h = self.conv2(adj_lists, h)
        acts["conv2"] = h
        h = F.leaky_relu(h)
        h = self.conv3(adj_lists, h)
        acts["conv3"] = h
        h = F.leaky_relu(h)
        h = self.liner1(h)
        acts["liner1"] = h
        h = F.leaky_relu(h)
        h = self.liner2(h)
        acts["liner2"] = h
        out = torch.sigmoid(h)
        acts["out"] = out
        if return_acts:
            return acts
        return out


def adj_lists_from_edges(src, dst, n, self_loops=True):
    """In-neighbor lists including explicit self-loops (dgl.add_self_loop)."""
    lists = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        lists[int(d)].append(int(s))
    if self_loops:
        for i in range(n):
            lists[i].append(i)
    return lists


def export_sage_params(conv: RefSagePool):
    """Torch (out,in) weights → JAX (in,out) param dict."""
    return {
        "w_pool": conv.fc_pool.weight.detach().numpy().T.copy(),
        "b_pool": conv.fc_pool.bias.detach().numpy().copy(),
        "w_self": conv.fc_self.weight.detach().numpy().T.copy(),
        "w_neigh": conv.fc_neigh.weight.detach().numpy().T.copy(),
        "bias": conv.bias.detach().numpy().copy(),
    }


def export_linear_params(lin: nn.Linear):
    return {
        "weight": lin.weight.detach().numpy().T.copy(),
        "bias": lin.bias.detach().numpy().copy(),
    }


def export_gnn32_params(model: RefGNN32):
    return {
        "conv1": export_sage_params(model.conv1),
        "conv2": export_sage_params(model.conv2),
        "conv3": export_sage_params(model.conv3),
        "liner1": export_linear_params(model.liner1),
        "liner2": export_linear_params(model.liner2),
    }
