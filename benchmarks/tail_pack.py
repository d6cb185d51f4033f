"""A/B microbench on real TPU for the round-5 kernel levers:

1. mixed-tail stream packing (mix_tails) vs the legacy per-row G-padding —
   the ~1.116x padded-row DMA waste (VERDICT r4 next-step 1a);
2. bf16 backward hit-test lowering: int32-extended compare ("cmp32") vs
   pure int16 arithmetic masking ("mask16") — the VPU-bound bf16 retirement
   gap (next-step 1b).

Chained k=1/5 differencing timing (round-4 methodology).  Also verifies
fwd/bwd outputs of every variant against the mix_tails=False cmp32 baseline
ON HARDWARE (argmax forward must be bit-exact; bwd sums to f32
reduction-order tolerance).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bf16_kernels import log, timed_chained


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
    rng = np.random.default_rng(0)

    sel = sys.argv[1:] if len(sys.argv) > 1 else ["f32_10", "bf16_32"]

    # (tag, folds, stride, dtype)
    shapes = {
        "f32_10": (10, 5120, jnp.float32),
        "bf16_10": (10, 6144, jnp.bfloat16),
        "bf16_32": (32, 16384, jnp.bfloat16),
    }

    for tag in sel:
        folds, stride, dt = shapes[tag]
        rpb = K.pick_rows_per_block(n_pad, stride)
        x = jnp.asarray(
            rng.standard_normal((n_pad, 1, stride)).astype(np.float32)
        ).astype(dt)
        state = {"ref_out": None, "ref_dx": None}

        def run_variant(pg, mix, hit, pad_ratio):
            fwd = lambda pg_, x_: jnp.sum(  # noqa: E731
                K.pallas_spmm_max(pg_, x_).astype(jnp.float32))
            fb = lambda pg_, x_: jnp.sum(jax.grad(  # noqa: E731
                lambda xx: jnp.sum(
                    K.pallas_spmm_max(pg_, xx).astype(jnp.float32) ** 2)
            )(x_).astype(jnp.float32))
            # correctness vs the baseline variant, on hardware
            out = np.asarray(jax.jit(
                lambda pg_, x_: K.pallas_spmm_max(pg_, x_))(pg, x)
                .astype(jnp.float32))
            dx = np.asarray(jax.jit(jax.grad(
                lambda xx: jnp.sum(
                    K.pallas_spmm_max(pg, xx).astype(jnp.float32) ** 2))
            )(x).astype(jnp.float32))
            if state["ref_out"] is None:
                state["ref_out"], state["ref_dx"] = out, dx
                ok = "baseline"
            else:
                exact_f = bool(np.array_equal(out, state["ref_out"]))
                d_b = float(np.max(np.abs(dx - state["ref_dx"])))
                ok = f"fwd_exact={exact_f} bwd_maxdiff={d_b:.3e}"
            dtf = timed_chained(fwd, (pg, x))
            dtb = timed_chained(fb, (pg, x))
            log(f"{tag} mix={int(mix)} hit={hit} pad={pad_ratio:.3f} "
                f"rpb={rpb}: fwd {dtf*1e3:.2f} ms "
                f"({folds*e_real/dtf/1e6:.1f} M), fwd+bwd "
                f"{dtb*1e3:.2f} ms ({folds*e_real/dtb/1e6:.1f} M e-f/s) "
                f"[{ok}]")

        for mix in (False, True):
            pg = K.build_pallas_graph(src, dst, n_pad, rows_per_block=rpb,
                                      mix_tails=mix)
            pad_ratio = float(np.asarray(pg.fwd.blk_ptr)[-1]) / e_real
            hits = ["cmp32", "mask16"] if dt == jnp.bfloat16 else ["cmp32"]
            for hit in hits:
                K._BWD16_HIT = hit
                try:
                    run_variant(pg, mix, hit, pad_ratio)
                except Exception as ex:
                    log(f"{tag} mix={int(mix)} hit={hit}: FAILED "
                        f"{str(ex)[:200]}")
    K._BWD16_HIT = os.environ.get("PLAGNN_BWD16_HIT", "cmp32")


if __name__ == "__main__":
    main()
