"""Microbench: VMEM hub-cache (arena) for the pallas SpMM forward, real TPU.

The fwd kernel is byte/DMA-bound (~530 GB/s effective for random row DMAs on
v5e).  On power-law PPI topology the top-k most-fetched source rows cover a
large edge fraction (k=128 → ~21%, k=256 → ~27% on the 24k-node bench graph):
serving those edges from a persistent VMEM arena removes their DMAs entirely,
at the price of a compute-only hub phase per block (~300 ns/group scalar-loop
cost that DMA service no longer hides — hence the hub_unroll sweep).

Sweeps hub_k (arena rows) and HUB_U (hub-phase unroll) at the headline
bf16 B=32 shape + the engine's B=10 training shape.  Timing syncs via
device→host scalar transfer (tunnel-safe).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=10):
    float(np.asarray(fn(*args)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    float(np.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / reps


def timed_retry(fn, *args, attempts=3):
    for a in range(attempts):
        try:
            return timed(fn, *args)
        except Exception as ex:  # transient remote-compile HTTP 500s
            if a == attempts - 1:
                raise
            log(f"  retry {a + 1} after: {str(ex)[:160]}")
            time.sleep(10.0 * (a + 1))


def main():
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo
    from plagnn_tpu.ops.pallas import spmm_kernels as K

    dev = jax.devices()[0]
    log(f"device: {dev} ({getattr(dev, 'device_kind', '?')})")
    n_nodes, n_edges = 24041, 700_000
    ppi, *_ = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250))
    graph = from_scipy_coo(ppi, add_self_loops=True, node_multiple=128)
    e_real = graph.n_edges
    src = np.asarray(graph.src)[:e_real]
    dst = np.asarray(graph.dst)[:e_real]
    n_pad = graph.n_nodes
    log(f"graph: {n_pad} padded nodes, {e_real} edges")
    rng = np.random.default_rng(0)

    # (label, folds_equiv, stride, dtype, hub_k_fwd, hub_k_bwd)
    cases = [
        ("bf16 B=32 base", 32, 16384, jnp.bfloat16, 0, 0),
        ("bf16 B=32 kf=0 kb=128", 32, 16384, jnp.bfloat16, 0, 128),
        ("bf16 B=32 kf=0 kb=192", 32, 16384, jnp.bfloat16, 0, 192),
        ("bf16 B=32 kf=128 kb=128", 32, 16384, jnp.bfloat16, 128, 128),
        ("bf16 B=32 kf=128 kb=0", 32, 16384, jnp.bfloat16, 128, 0),
        ("bf16 B=10 base", 10, 6144, jnp.bfloat16, 0, 0),
        ("bf16 B=10 kf=256 kb=0", 10, 6144, jnp.bfloat16, 256, 0),
        ("bf16 B=10 kf=256 kb=256", 10, 6144, jnp.bfloat16, 256, 256),
    ]
    results = []
    for label, folds, stride, dt, hub_k, hub_kb in cases:
        esize = 2 if dt == jnp.bfloat16 else 4
        # bwd arena rows are ~2x the gradient width (fused grad+arg lanes);
        # per-direction block sizes keep a bwd-only arena from shrinking
        # the forward's blocks.
        rpb = K.pick_rows_per_block(
            n_pad, stride,
            arena_bytes=(hub_k + 1) * stride * esize if hub_k else 0)
        rpb_b = K.pick_rows_per_block(
            n_pad, stride,
            arena_bytes=(hub_kb + 1) * stride * 2 * esize if hub_kb else 0)
        pg = K.build_pallas_graph(
            src, dst, n_pad, rows_per_block=rpb, hub_k=hub_k,
            hub_k_bwd=hub_kb, rows_per_block_bwd=rpb_b)
        cov = 0.0
        if pg.fwd.hub is not None:
            # non-dummy entries of the main stream = its real edges;
            # everything else moved to the hub stream.
            n_main = int(np.sum(np.asarray(pg.fwd.src) != n_pad - 1))
            cov = (e_real - n_main) / e_real
        x = jnp.asarray(
            rng.standard_normal((n_pad, 1, stride)).astype(np.float32)
        ).astype(dt)

        fwd = jax.jit(lambda pg_, x_: jnp.sum(
            K.pallas_spmm_max(pg_, x_).astype(jnp.float32)))
        fb = jax.jit(lambda pg_, x_: jnp.sum(jax.grad(
            lambda xx: jnp.sum(
                K.pallas_spmm_max(pg_, xx).astype(jnp.float32) ** 2)
        )(x_).astype(jnp.float32)))
        try:
            dtf = timed_retry(fwd, pg, x)
            dtb = timed_retry(fb, pg, x)
        except Exception as ex:
            log(f"{label}: FAILED: {str(ex)[:300]}")
            continue
        epsf = folds * e_real / dtf
        epsb = folds * e_real / dtb
        log(f"{label} rpb={rpb} cov={cov:.3f}: "
            f"fwd {dtf*1e3:.2f} ms ({epsf/1e6:.1f} M e-f/s), "
            f"fwd+bwd {dtb*1e3:.2f} ms ({epsb/1e6:.1f} M e-f/s)")
        results.append((label, dtf, dtb, epsb))

    if results:
        base = [r for r in results if "k=0" in r[0] and "B=32" in r[0]]
        best = max(results, key=lambda r: r[3])
        if base:
            log(f"BEST fwd+bwd: {best[0]} at {best[3]/1e6:.1f} M e-f/s "
                f"({best[3]/base[0][3]:.3f}x the k=0 base)")


if __name__ == "__main__":
    main()
