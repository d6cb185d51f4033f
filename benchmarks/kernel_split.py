"""Micro-profile of the pallas SpMM kernel stages on the real chip.

Splits fwd(no-arg) / fwd(with-argmax) / masked-bwd so optimization work
targets the real bottleneck. Details to stderr.
"""
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(raw, *args, k_lo=1, k_hi=5, reps=3):
    """Chained in-graph differencing (round-4 methodology): the fixed ~23 ms
    tunneled sync and dispatch overhead cancel; side-effecting pallas bodies
    are never hoisted.  ``raw`` must be an UNJITTED scalar-returning fn."""
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
    from plagnn_tpu.data import synthetic_dataset
    from plagnn_tpu.ops import from_scipy_coo
    from plagnn_tpu.ops.pallas import spmm_kernels as K

    n_nodes, n_edges, B = 24041, 700_000, 10
    ppi, feats, _, _ = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250))
    graph = from_scipy_coo(ppi, add_self_loops=True, node_multiple=128)
    e = graph.n_edges
    src = np.asarray(graph.src)[:e]
    dst = np.asarray(graph.dst)[:e]
    pg = K.build_pallas_graph(src, dst, graph.n_nodes)
    log(f"edges real={e} fwd_pad={pg.fwd.src.shape[0]} bwd_pad={pg.bwd.src.shape[0]}")

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((graph.n_nodes, B, 512)), jnp.float32)

    f_noarg = lambda x: jnp.sum(
        K._run_spmm(pg.fwd, x, reduce="max", with_argmax=False))
    f_arg = lambda x: jnp.sum(
        K._run_spmm(pg.fwd, x, reduce="max", with_argmax=True)[0])

    def arg_only(x):
        out, arg = K._run_spmm(pg.fwd, x, reduce="max", with_argmax=True)
        return out, arg

    arg_j = jax.jit(arg_only)
    out, arg = arg_j(xb)
    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    f_bwd = lambda gg, aa: jnp.sum(K._run_masked_bwd(pg.bwd, gg, aa))

    dt = timed(f_noarg, xb)
    log(f"fwd no-arg      : {dt*1e3:7.2f} ms  {B*e/dt/1e6:7.1f} M edge-folds/s")
    dt = timed(f_arg, xb)
    log(f"fwd with argmax : {dt*1e3:7.2f} ms  {B*e/dt/1e6:7.1f} M edge-folds/s")
    dt = timed(f_bwd, g, arg)
    log(f"masked bwd      : {dt*1e3:7.2f} ms  {B*e/dt/1e6:7.1f} M edge-folds/s")

    # sum kernel for reference (no argmax machinery at all)
    f_sum = lambda x: jnp.sum(
        K._run_spmm(pg.fwd, x, reduce="sum", with_argmax=False))
    dt = timed(f_sum, xb)
    log(f"fwd sum         : {dt*1e3:7.2f} ms  {B*e/dt/1e6:7.1f} M edge-folds/s")
    print("done")


if __name__ == "__main__":
    main()
