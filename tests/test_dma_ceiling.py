"""DMA-ceiling microbenchmark kernel smoke (benchmarks/dma_ceiling.py).

The microbench is compute-free by design; correctness = every indexed row
lands in the ring intact (interpret mode)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dma_ring_lands_indexed_rows():
    import jax

    from benchmarks.dma_ceiling import G, T_E, build_bench

    ng = 4
    _, n_fetch, (idx, x, sub, fn) = build_bench(
        n_rows=64, row_bytes=4096, n_fetch=T_E, ng=ng, pattern="random",
        interpret=True)
    out = np.asarray(jax.jit(fn)(idx, x))
    idx = np.asarray(idx)
    x = np.asarray(x)
    # out is ring slot 0 after the run: the last group assigned to slot 0
    n_groups = T_E // G
    gi = max(g for g in range(n_groups) if g % ng == 0)
    expect = np.concatenate([
        x[idx[gi * G + j] * sub:(idx[gi * G + j] + 1) * sub]
        for j in range(G)
    ])
    np.testing.assert_array_equal(out, expect)
