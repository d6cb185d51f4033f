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

    # Hub-cache (VMEM arena) stream split: exact vs the single-stream
    # kernels, f32 and bf16, fwd and argmax-routed bwd.  Inputs are relu'd
    # and coarsely quantized so per-lane value ties across rows are common —
    # the regime where the hub merge's (value, then smaller-id) rule must
    # reproduce first-in-sorted-order argmax exactly.
    pgh = build_pallas_graph(
        src, dst, n_pad, rows_per_block=64, hub_k=16, hub_k_bwd=16)
    xt = jnp.asarray(np.maximum(xr, 0.0) // 64.0)  # few distinct values
    for tag, xx in (("f32", xt), ("bf16", xt.astype(jnp.bfloat16))):
        y0 = np.asarray(jax.jit(pallas_spmm_max)(pg, xx).astype(jnp.float32))
        yh = np.asarray(jax.jit(pallas_spmm_max)(pgh, xx).astype(jnp.float32))
        np.testing.assert_array_equal(y0, yh)
        gh0 = jax.jit(jax.grad(lambda x: jnp.sum(
            pallas_spmm_max(pg, x.astype(xx.dtype)).astype(jnp.float32) * w
        )))(xt)
        ghh = jax.jit(jax.grad(lambda x: jnp.sum(
            pallas_spmm_max(pgh, x.astype(xx.dtype)).astype(jnp.float32) * w
        )))(xt)
        d = np.abs(np.asarray(gh0) - np.asarray(ghh)).max()
        assert d == 0.0, (tag, d)
        print(f"hub {tag}: fwd+bwd exact vs single-stream", file=sys.stderr)
    print("HW_CORRECTNESS_OK")


if __name__ == "__main__":
    main()
