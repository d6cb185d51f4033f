"""Benchmark: aggregated SpMM (fwd+bwd) edges/s/chip on a PLA-GNN-scale graph.

Headline metric per BASELINE.json: segment-max SpMM forward+backward
throughput on the full-batch PPI graph (24,041 nodes, ~700k directed edges
incl. self-loops, 503-dim features — main.py:40, utils.py:46-49 scale).
``vs_baseline`` is the fraction of speed-of-light HBM bandwidth: the op is
bandwidth-bound at ~2·(F·4)B per edge per direction (gather fwd + routed
scatter bwd), so SOL edges/s = BW / bytes-per-edge.

Prints exactly ONE JSON line to stdout; human-readable details go to stderr.
"""
import json
import sys
import time

import numpy as np


# v5e (TPU v5 lite) HBM bandwidth ~819 GB/s; v5p ~2765 GB/s.
HBM_BYTES_PER_SEC = {
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "cpu": 50e9,
}


def detect_bw(device_kind: str) -> float:
    for k, v in HBM_BYTES_PER_SEC.items():
        if k in device_kind.lower():
            return v
    return 819e9


def main():
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.models import gnn32_apply, init_gnn32
    from plagnn_tpu.ops import from_scipy_coo, pad_features
    from plagnn_tpu.ops.spmm import spmm_max
    from plagnn_tpu.train.losses import multi_loss, weight_cal

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    on_tpu = dev.platform != "cpu"
    n_nodes = 24041 if on_tpu else 2048
    n_edges = 700_000 if on_tpu else 16_384
    f_dim = 503

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"device: {dev} ({kind}); graph: {n_nodes} nodes, {n_edges} edges, F={f_dim}")

    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250)
    )
    graph = from_scipy_coo(ppi, add_self_loops=True)
    e_real = graph.n_edges  # directed edges incl. self loops
    x = jnp.asarray(pad_features(feats, graph.n_nodes))

    # --- SpMM fwd+bwd -----------------------------------------------------
    # graph passed as an argument: its index arrays are program parameters,
    # not baked constants (much faster XLA compiles).  Timing syncs through a
    # scalar device→host transfer: block_until_ready is unreliable through
    # the remote-TPU tunnel (returns before execution completes).
    spmm_fb = jax.jit(
        lambda graph, x: jnp.sum(
            jax.grad(lambda xx: jnp.sum(spmm_max(graph, xx) ** 2))(x)
        )
    )
    float(np.asarray(spmm_fb(graph, x)))  # compile + real sync
    float(np.asarray(spmm_fb(graph, x)))
    reps = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(reps):
        g = spmm_fb(graph, x)
    float(np.asarray(g))  # stream is serialized: syncs all reps
    dt = (time.perf_counter() - t0) / reps
    edges_per_sec = e_real / dt
    log(f"spmm_max fwd+bwd: {dt*1e3:.2f} ms → {edges_per_sec/1e6:.1f} M edges/s")

    # --- full training epoch (fwd + loss + bwd + adam) --------------------
    import optax

    params = init_gnn32(jax.random.PRNGKey(70), f_dim)
    tx = optax.adam(5e-5, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    labels = jnp.asarray(pad_features(loc, graph.n_nodes))
    w = jnp.asarray(weight_cal(loc), jnp.float32)
    mask = jnp.asarray(np.arange(graph.n_nodes) < n_nodes)

    @jax.jit
    def epoch(graph, params, opt_state):
        def loss_fn(p):
            probs = gnn32_apply(p, graph, x)
            return multi_loss(probs, labels, mask, w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = epoch(graph, params, opt_state)
    float(np.asarray(loss))
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, loss = epoch(graph, params, opt_state)
    float(np.asarray(loss))
    epoch_dt = (time.perf_counter() - t0) / reps
    log(f"GNN32 full-batch epoch: {epoch_dt*1e3:.2f} ms (loss {float(loss):.4f})")

    # --- speed-of-light comparison ---------------------------------------
    bytes_per_edge = 2 * (f_dim * 4)  # gather row fwd + grad row bwd
    sol_edges_per_sec = detect_bw(kind) / bytes_per_edge
    vs = edges_per_sec / sol_edges_per_sec
    log(f"SOL at {detect_bw(kind)/1e9:.0f} GB/s: {sol_edges_per_sec/1e6:.1f} M edges/s → {vs:.3f} of SOL")

    print(json.dumps({
        "metric": "spmm_max_fwd_bwd_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
