"""Microbench: bf16 message mode of the pallas SpMM kernels on real TPU.

Sweeps fold-batch sizes for bf16 (and an f32 reference point) at PPI scale.
bf16 halves bytes/edge, so the scalar-core DMA-issue floor (~38 ns/edge/pass
on v5e) becomes the binding constraint at small B; larger fold batches
amortize it — the expected sweet spot is B≈20 (stride 10240), where the
forward returns to byte-bound and fwd+bwd should approach the bf16 byte
ceiling (~170 M edge-folds/s at the measured ~520-600 GB/s random-row DMA
rate).

Timing syncs via device→host scalar transfer (tunnel-safe).
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


def timed_chained(raw, args, k_lo=1, k_hi=5, reps=3):
    """Marginal per-execution time by differencing k_lo vs k_hi executions
    chained in-graph (side-effecting pallas bodies are never hoisted): the
    fixed ~23 ms tunneled sync and dispatch overhead cancel exactly
    (round-4 methodology; the old 10-dispatch loop carried ~+2.3 ms/rep)."""
    import jax
    import jax.numpy as jnp

    def make(k):
        return jax.jit(lambda *a: jax.lax.fori_loop(
            0, k, lambda i, acc: acc + raw(*a), jnp.float32(0.0)))

    lo, hi = make(k_lo), make(k_hi)
    float(np.asarray(lo(*args)).ravel()[0])
    float(np.asarray(hi(*args)).ravel()[0])
    best_lo = best_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(lo(*args)).ravel()[0])
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(hi(*args)).ravel()[0])
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pallas_spmm_max, pick_rows_per_block,
    )

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

    # (label, folds_equivalent, stride, dtype, rows_per_block or None=auto)
    cases = [
        ("f32 B=10 s=5120", 10, 5120, jnp.float32, None),  # round-1 headline
        ("bf16 B=10 s=6144", 10, 6144, jnp.bfloat16, None),
        ("bf16 B=10 s=6144 r32", 10, 6144, jnp.bfloat16, 32),
        ("bf16 B=16 s=8192", 16, 8192, jnp.bfloat16, None),
        ("bf16 B=20 s=10240", 20, 10240, jnp.bfloat16, None),
        ("bf16 B=24 s=12288", 24, 12288, jnp.bfloat16, None),
        ("bf16 B=28 s=14336", 28, 14336, jnp.bfloat16, None),
        ("bf16 B=32 s=16384", 32, 16384, jnp.bfloat16, None),
        ("bf16 B=36 s=18432", 36, 18432, jnp.bfloat16, None),
        ("bf16 B=40 s=20480", 40, 20480, jnp.bfloat16, None),
    ]
    import sys as _s
    write_anchors = "--write-anchors" in _s.argv[1:]
    sel = [a for a in _s.argv[1:] if a != "--write-anchors"]
    if sel:               # optional: run only the given fold batches
        keep = {int(a) for a in sel}
        cases = [c for c in cases if c[1] in keep]
    results = []
    for label, folds, stride, dt, rpb_over in cases:
        rpb = rpb_over or pick_rows_per_block(n_pad, stride)
        pg = build_pallas_graph(src, dst, n_pad, rows_per_block=rpb)
        x = jnp.asarray(
            rng.standard_normal((n_pad, 1, stride)).astype(np.float32)
        ).astype(dt)

        fwd = lambda pg_, x_: jnp.sum(  # noqa: E731
            pallas_spmm_max(pg_, x_).astype(jnp.float32))
        fb = lambda pg_, x_: jnp.sum(jax.grad(  # noqa: E731
            lambda xx: jnp.sum(pallas_spmm_max(pg_, xx).astype(jnp.float32) ** 2)
        )(x_).astype(jnp.float32))
        try:
            dtf = timed_chained(fwd, (pg, x))
            dtb = timed_chained(fb, (pg, x))
        except Exception as ex:
            log(f"{label}: FAILED: {str(ex)[:300]}")
            continue
        epsf = folds * e_real / dtf
        epsb = folds * e_real / dtb
        log(f"{label} rpb={rpb}: fwd {dtf*1e3:.2f} ms ({epsf/1e6:.1f} M e-f/s), "
            f"fwd+bwd {dtb*1e3:.2f} ms ({epsb/1e6:.1f} M e-f/s)")
        results.append((label, folds, dt, rpb_over, dtf, dtb, epsb))

    if results:
        best = max(results, key=lambda r: r[6])
        log(f"BEST fwd+bwd: {best[0]} at {best[6]/1e6:.1f} M edge-folds/s "
            f"(round-1 f32 headline: 95.4)")
    if write_anchors:
        # feed the planner (parallel/planner.load_anchors): the plain bf16
        # fwd+bwd sweep points keyed by fold batch, no rpb overrides
        from anchors_io import update_anchors

        rates = {str(folds): epsb
                 for _, folds, dt, rpb_over, _, _, epsb in results
                 if dt == jnp.bfloat16 and rpb_over is None}
        if rates:
            p = update_anchors({"bf16_rates": rates}, "benchmarks/bf16_kernels.py")
            log(f"anchors updated: {p} ({sorted(map(int, rates))})")


if __name__ == "__main__":
    main()
