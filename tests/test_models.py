"""Golden parity tests: JAX model vs torch implementation of the reference
DGL-0.8.2 semantics (SURVEY.md §4(b), "allclose ladder" step 1)."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from plagnn_tpu.ops import build_graph, pad_features
from plagnn_tpu.models import gnn32_activations, gnn32_apply, init_gnn32
from plagnn_tpu.models.layers import init_sage_conv, sage_conv

from torch_reference import (
    RefGNN32,
    RefSagePool,
    adj_lists_from_edges,
    export_gnn32_params,
    export_sage_params,
)


def make_graph(rng, n=80, avg_deg=5):
    edges = set()
    for i in range(n):
        for j in rng.choice(n, size=int(rng.integers(1, avg_deg * 2)), replace=False):
            if int(j) != i:
                edges.add((int(j), int(i)))
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    g = build_graph(src, dst, n, add_self_loops=True,
                    widths=(4, 16), node_multiple=16, edge_multiple=32)
    return g, src, dst


def test_sage_pool_layer_parity(rng):
    torch.manual_seed(70)
    g, src, dst = make_graph(rng)
    n, fin, fout = 80, 11, 6
    x = rng.standard_normal((n, fin)).astype(np.float32)

    ref = RefSagePool(fin, fout)
    adj = adj_lists_from_edges(src, dst, n)
    with torch.no_grad():
        ref_out = ref(adj, torch.from_numpy(x)).numpy()

    params = jax.tree.map(jnp.asarray, export_sage_params(ref))
    xp = jnp.asarray(pad_features(x, g.n_nodes))
    out = jax.jit(lambda p, x: sage_conv(p, g, x, "pool"))(params, xp)
    np.testing.assert_allclose(np.asarray(out)[:n], ref_out, rtol=1e-4, atol=1e-5)


def test_gnn32_full_forward_parity(rng):
    torch.manual_seed(70)
    g, src, dst = make_graph(rng)
    n, fin = 80, 23
    x = rng.standard_normal((n, fin)).astype(np.float32)

    ref = RefGNN32(fin, 13, 9, 7, 5, 12)
    adj = adj_lists_from_edges(src, dst, n)
    with torch.no_grad():
        ref_acts = ref(adj, torch.from_numpy(x), return_acts=True)

    params = jax.tree.map(jnp.asarray, export_gnn32_params(ref))
    xp = jnp.asarray(pad_features(x, g.n_nodes))
    acts = jax.jit(lambda p, x: gnn32_activations(p, g, x))(params, xp)

    # Per-layer allclose ladder.
    for name in ["conv1", "conv2", "conv3", "liner1", "liner2", "out"]:
        np.testing.assert_allclose(
            np.asarray(acts[name])[:n],
            ref_acts[name].numpy(),
            rtol=1e-3,
            atol=1e-5,
            err_msg=f"layer {name} diverged",
        )


def test_gnn32_gradient_parity(rng):
    """Backward parity: same weighted-BCE-style loss, compare dL/dparams."""
    torch.manual_seed(70)
    g, src, dst = make_graph(rng)
    n, fin = 80, 23
    x = rng.standard_normal((n, fin)).astype(np.float32)
    y = (rng.random((n, 12)) < 0.3).astype(np.float32)

    ref = RefGNN32(fin, 13, 9, 7, 5, 12)
    adj = adj_lists_from_edges(src, dst, n)
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y)
    out = ref(adj, xt)
    loss_t = -(yt * torch.log(torch.clamp(out, 1e-9, 10.0))
               + (1 - yt) * torch.log(torch.clamp(1 - out, 1e-9, 10.0))).sum() / n
    loss_t.backward()

    params = jax.tree.map(jnp.asarray, export_gnn32_params(ref))
    xp = jnp.asarray(pad_features(x, g.n_nodes))
    yp = jnp.asarray(pad_features(y, g.n_nodes))
    mask = jnp.asarray(np.arange(g.n_nodes) < n)

    def loss_fn(p):
        o = gnn32_apply(p, g, xp)
        ll = yp * jnp.log(jnp.clip(o, 1e-9, 10.0)) + (1 - yp) * jnp.log(
            jnp.clip(1 - o, 1e-9, 10.0)
        )
        return -jnp.sum(jnp.where(mask[:, None], ll, 0.0)) / n

    lj, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(lj), float(loss_t), rtol=1e-4)

    pairs = [
        ("conv1", "w_pool", ref.conv1.fc_pool.weight.grad.numpy().T),
        ("conv1", "w_self", ref.conv1.fc_self.weight.grad.numpy().T),
        ("conv1", "w_neigh", ref.conv1.fc_neigh.weight.grad.numpy().T),
        ("conv1", "bias", ref.conv1.bias.grad.numpy()),
        ("conv3", "w_pool", ref.conv3.fc_pool.weight.grad.numpy().T),
        ("liner2", "weight", ref.liner2.weight.grad.numpy().T),
        ("liner2", "bias", ref.liner2.bias.grad.numpy()),
    ]
    for mod, name, expected in pairs:
        np.testing.assert_allclose(
            np.asarray(grads[mod][name]), expected, rtol=1e-3, atol=1e-5,
            err_msg=f"grad {mod}.{name} diverged",
        )


def test_init_distributions(rng):
    """Init matches torch distributions statistically (exact RNG parity with
    torch is impossible across frameworks; distribution parity is the
    contract, SURVEY.md §7)."""
    key = jax.random.PRNGKey(0)
    p = init_sage_conv(key, 503, 400, "pool")
    # xavier_uniform gain sqrt(2): bound = sqrt(2)*sqrt(6/(503+400))
    import math
    bound = math.sqrt(2.0) * math.sqrt(6.0 / (503 + 400))
    w = np.asarray(p["w_self"])
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.std() - bound / math.sqrt(3)) < 0.02 * bound
    assert np.all(np.asarray(p["bias"]) == 0.0)
    bp = np.asarray(p["b_pool"])
    b2 = 1.0 / math.sqrt(503)
    assert bp.min() >= -b2 and bp.max() <= b2


def test_gcn2_model(rng):
    """GCN2 (2-layer GraphConv, BASELINE config 1) against a dense oracle."""
    from plagnn_tpu.models import gcn2_apply, init_gcn2

    g, src, dst = make_graph(rng)
    n, fin, hid = 80, 11, 8
    x = rng.standard_normal((n, fin)).astype(np.float32)
    params = init_gcn2(jax.random.PRNGKey(1), fin, hid)
    xp = jnp.asarray(pad_features(x, g.n_nodes))
    out = np.asarray(jax.jit(lambda p, x: gcn2_apply(p, g, x))(params, xp))

    # dense oracle: D^-1/2 A D^-1/2 with explicit self loops
    a = np.zeros((g.n_nodes, g.n_nodes), np.float32)
    a[src, dst] = 1.0
    a[np.arange(n), np.arange(n)] = 1.0
    d_in = np.maximum(a.sum(0), 1.0)
    d_out = np.maximum(a.sum(1), 1.0)

    def prop(h):
        return (a.T @ (h / np.sqrt(d_out)[:, None])) / np.sqrt(d_in)[:, None]

    w1 = np.asarray(params["conv1"]["weight"])
    b1 = np.asarray(params["conv1"]["bias"])
    w2 = np.asarray(params["conv2"]["weight"])
    b2 = np.asarray(params["conv2"]["bias"])
    h = np.asarray(xp)
    # in_feats(11) > hidden(8): W first, then propagate (DGL mat-mul order)
    h = prop(h @ w1) + b1
    h = np.maximum(h, 0)
    # hidden(8) < classes(12): propagate first, then W
    h = prop(h) @ w2 + b2
    ref = 1.0 / (1.0 + np.exp(-h))
    np.testing.assert_allclose(out[:n], ref[:n], rtol=1e-4, atol=1e-5)
