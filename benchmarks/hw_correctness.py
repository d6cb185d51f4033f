"""Hardware correctness check for the Pallas SpMM kernels (real TPU).

Interpret-mode tests can't catch Mosaic lowering bugs (round 2 found two:
16-bit compares silently unsupported, and bf16-typed carriers flushing
denormal id bit patterns to zero).  This script runs the compiled kernels on
the real chip and pins them against each other and an XLA oracle:

* f32 fwd/bwd vs XLA segment ops,
* bf16 fwd == f32 fwd on bf16-representable inputs (exact),
* bf16 bwd gradient routing == f32 bwd (exact).

Exit code 0 + "HW_CORRECTNESS_OK" on success.  Run it after any kernel
change, before trusting bench numbers:  `python benchmarks/hw_correctness.py`
(gated pytest wrapper: PLAGNN_TPU_TESTS=1 pytest tests/test_tpu_hardware.py).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.ops import build_graph, spmm_max
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pallas_spmm_max,
    )

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "run on the real TPU (not the CPU suite)"
    print(f"device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(3)
    n_pad, b, f = 512, 4, 512   # stride 2048 (bf16-legal)
    n_real = 500
    src = rng.integers(0, n_real, 6000)
    dst = rng.integers(0, n_real, 6000)
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64)

    vals = rng.permutation(n_pad * b * f).astype(np.float32)
    xr = np.asarray(jnp.asarray(vals.reshape(n_pad, b, f))
                    .astype(jnp.bfloat16).astype(jnp.float32))
    x32 = jnp.asarray(xr)
    w = jnp.asarray(rng.integers(1, 9, (n_pad, b, f)).astype(np.float32))

    # f32 pallas vs XLA oracle (per fold)
    g = build_graph(src, dst, n_real, node_multiple=n_pad, edge_multiple=256)
    assert g.n_nodes == n_pad
    out32 = np.asarray(jax.jit(pallas_spmm_max)(pg, x32))
    for bb in range(b):
        ref = np.asarray(jax.jit(spmm_max)(g, x32[:, bb]))
        np.testing.assert_allclose(out32[:, bb], ref, atol=0)
    print("f32 fwd vs XLA: exact", file=sys.stderr)

    out16 = jax.jit(pallas_spmm_max)(pg, x32.astype(jnp.bfloat16))
    d_out = np.abs(np.asarray(out16.astype(jnp.float32)) - out32).max()

    g16 = jax.jit(jax.grad(lambda x: jnp.sum(
        pallas_spmm_max(pg, x.astype(jnp.bfloat16)).astype(jnp.float32) * w
    )))(x32)
    g32 = jax.jit(jax.grad(
        lambda x: jnp.sum(pallas_spmm_max(pg, x) * w)))(x32)
    d_g = np.abs(np.asarray(g16) - np.asarray(g32)).max()
    print(f"bf16 vs f32: fwd err {d_out}, bwd err {d_g}", file=sys.stderr)
    assert d_out == 0.0 and d_g == 0.0, (d_out, d_g)
    print("HW_CORRECTNESS_OK")


if __name__ == "__main__":
    main()
