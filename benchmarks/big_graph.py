"""Big-graph hardware validation + single-chip rate (VERDICT r3 next-step 3).

Two claims about graphs beyond the 24,041-node PPI had only interpret-mode /
modeled evidence:

* the >2^15-padded-node **unpacked int32 backward** (the packed-int16
  fused-row trick caps node ids at 32768; spmm_kernels.py falls back to
  unpacked gradient+argmax rows past it) had never executed on the chip;
* the **10M-edge scaling config** (BASELINE.json configs[4]: synthetic
  330k-node PPI-like graph) had only a halo-bytes model.

``--mode boundary`` runs compiled fwd+bwd on both sides of the 32768-node
boundary against the XLA oracle (and bf16-vs-f32 routing past it).
``--mode rate`` builds the 10M-edge power-law graph and measures the
single-chip bf16 fwd+bwd rate at an HBM-feasible fold batch, with the same
in-graph chained-differencing timing as bench.py.  Results merge into
``benchmarks/results/big_graph_r04.json``.
"""
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

RESULTS = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "results", "big_graph_r05.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def merge_results(section, payload):
    data = {}
    if _os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data[section] = payload
    _os.makedirs(_os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    log(f"wrote {RESULTS} [{section}]")


def sync_scalar(x):
    return float(np.asarray(x).ravel()[0])


def warm_with_retry(label, fn, attempts=4, backoff=20.0):
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:
            log(f"{label}: attempt {k + 1}/{attempts} failed: {str(e)[:300]}")
            if k + 1 < attempts:
                time.sleep(backoff * (2 ** k))
    raise RuntimeError(f"{label}: failed after {attempts} attempts")


def run_boundary():
    """Packed-int16 vs unpacked-int32 backward on the REAL chip, both sides
    of the 2^15 padded-node boundary, against the XLA oracle."""
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.ops import build_graph, spmm_max
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pallas_spmm_max)

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "run on the real TPU"
    log(f"device: {dev}")
    rng = np.random.default_rng(23)
    out = {"device": str(dev.device_kind), "cases": []}
    for n_pad, dtype, pos in (((1 << 15), "float32", None),
                              ((1 << 15) + 256, "float32", None),
                              ((1 << 15) + 256, "float32", False),
                              ((1 << 15) + 256, "bfloat16", None),
                              ((1 << 15) + 256, "bfloat16", False)):
        n_real = n_pad - 256 if n_pad > (1 << 15) else n_pad - 128
        src = rng.integers(0, n_real, 40000)
        dst = rng.integers(0, n_real, 40000)
        # dedup: duplicate (src, dst) pairs are outside the graph contract
        # (the pipeline's edge sets are unique, data/biogrid.py).  On
        # duplicates the id-based backward routes the gradient to EVERY
        # copy of the argmax edge while the positional backward routes to
        # exactly one (DGL's edge-argmax semantics) — both self-consistent,
        # but not bit-comparable.
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
        pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                                positional=pos)
        b, f = 1, (2048 if dtype == "bfloat16" else 1024)  # bf16 tile: 2048
        x32 = np.asarray(
            jnp.asarray(rng.standard_normal((n_pad, b, f)).astype(np.float32))
            .astype(jnp.bfloat16).astype(jnp.float32))
        x = jnp.asarray(x32)
        if dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)

        g = build_graph(src, dst, n_real, node_multiple=n_pad,
                        edge_multiple=1024)
        assert g.n_nodes == n_pad
        y = warm_with_retry(
            f"fwd n{n_pad} {dtype}",
            lambda: np.asarray(jax.jit(pallas_spmm_max)(pg, x)
                               .astype(jnp.float32)))
        y_ref = np.asarray(jax.jit(spmm_max)(g, jnp.asarray(x32)[:, 0]))
        np.testing.assert_allclose(y[:, 0], y_ref, atol=0)

        gr = warm_with_retry(
            f"bwd n{n_pad} {dtype}",
            lambda: np.asarray(jax.jit(jax.grad(lambda xx: jnp.sum(
                pallas_spmm_max(pg, xx.astype(x.dtype))
                .astype(jnp.float32) ** 2)))(jnp.asarray(x32))))
        if dtype == "bfloat16":
            # dx is RETURNED in bf16 (the input dtype): multi-hit f32 sums
            # round once at the end, so the meaningful exactness claim is
            # vs the f32 pallas path rounded the same way (identical f32
            # accumulation order), not vs the unrounded XLA oracle.
            gr32 = np.asarray(jax.jit(jax.grad(lambda xx: jnp.sum(
                pallas_spmm_max(pg, xx).astype(jnp.float32) ** 2)))(
                    jnp.asarray(x32)))
            if pg.fwd.pos is not None:
                gr_ref = np.asarray(jnp.asarray(gr32).astype(jnp.bfloat16)
                                    .astype(jnp.float32))
            else:
                # >2^15 non-positional fallback computes dx in f32 and its
                # trailing f32→bf16→f32 cast pair is elided by XLA's
                # excess-precision rule (measured: gr == gr32 bitwise) —
                # the chain keeps FULL f32 precision
                gr_ref = gr32
            np.testing.assert_allclose(gr, gr_ref, atol=0)
        else:
            gr_ref = np.asarray(jax.jit(jax.grad(lambda xx: jnp.sum(
                spmm_max(g, xx) ** 2)))(jnp.asarray(x32)[:, 0]))
            np.testing.assert_allclose(gr[:, 0], gr_ref, atol=0)
        if pg.fwd.pos is not None:
            path = "positional_int16"
        elif n_pad > (1 << 15):
            path = "unpacked_int32"
        else:
            path = "packed_int16"
        log(f"n_pad={n_pad} {dtype} ({path}): fwd+bwd exact vs XLA oracle")
        out["cases"].append({"n_pad_nodes": n_pad, "dtype": dtype,
                             "bwd_path": path, "exact_vs_xla": True})
    merge_results("boundary_hw", out)
    print("BIG_GRAPH_BOUNDARY_OK")


def run_rate(n_nodes: int, n_edges: int, fold_batches):
    """Single-chip bf16 fwd+bwd rate on the 10M-edge scaling config."""
    import jax
    import jax.numpy as jnp

    from plagnn_tpu.data.synthetic import powerlaw_ppi
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        build_pallas_graph, pallas_spmm_max, pick_rows_per_block_budget)

    dev = jax.devices()[0]
    assert dev.platform != "cpu", "run on the real TPU"
    log(f"device: {dev}; building {n_edges}-edge graph...")
    t0 = time.time()
    ppi = powerlaw_ppi(n_nodes=n_nodes, n_edges=n_edges, seed=70)
    loops = np.arange(n_nodes, dtype=np.int64)
    src = np.concatenate([np.asarray(ppi.row, np.int64), loops])
    dst = np.concatenate([np.asarray(ppi.col, np.int64), loops])
    e_tot = len(src)
    log(f"graph built in {time.time()-t0:.1f}s: {e_tot} directed edges")

    out = {"device": str(dev.device_kind), "n_nodes": n_nodes,
           "directed_edges_incl_loops": int(e_tot), "per_b": {}}
    for b in fold_batches:
        f_pad = 512
        stride = b * f_pad
        if stride % 2048:
            log(f"B={b}: stride {stride} not bf16-legal, skipping")
            continue
        rpb = pick_rows_per_block_budget(stride)
        n_pad = ((n_nodes + 256) + rpb - 1) // rpb * rpb
        t0 = time.time()
        # > 2^15 nodes: positional argmax by default (fused int16 backward
        # rows + int16 VJP residual — the r4 unpacked-int32 fallback cost 2x
        # the bwd bytes and 2x the residual HBM, capping the config at B=4)
        pg = build_pallas_graph(src, dst, n_pad, rows_per_block=rpb)
        log(f"B={b}: pallas graph built in {time.time()-t0:.1f}s "
            f"(n_pad={n_pad}, rows_per_block={rpb}, "
            f"positional={pg.fwd.pos is not None})")
        rng = np.random.default_rng(70)
        # bf16 end to end: the engine's production dtype for this config
        # (an f32 master copy of x would add 2.7 GB at B=4)
        x = jnp.asarray(
            rng.standard_normal((n_pad, b, f_pad)).astype(np.float32)
        ).astype(jnp.bfloat16)

        raw = lambda pg_, xx: jnp.sum(jax.grad(  # noqa: E731
            lambda xv: jnp.sum(
                pallas_spmm_max(pg_, xv)
                .astype(jnp.float32) ** 2))(xx).astype(jnp.float32))

        def make(k):
            return jax.jit(lambda pg_, xx: jax.lax.fori_loop(
                0, k, lambda i, acc: acc + raw(pg_, xx), jnp.float32(0.0)))

        lo, hi = make(1), make(3)
        try:
            warm_with_retry(f"B={b} chains", lambda: (
                sync_scalar(lo(pg, x)), sync_scalar(hi(pg, x))), attempts=2)
        except Exception as ex:
            msg = str(ex)
            feasible = "RESOURCE_EXHAUSTED" not in msg and "hbm" not in msg
            log(f"B={b}: infeasible ({msg[:200]})")
            out["per_b"][str(b)] = {
                "infeasible": True,
                "reason": "hbm_oom" if not feasible else msg[:200],
            }
            continue
        best_lo = best_hi = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync_scalar(lo(pg, x))
            best_lo = min(best_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync_scalar(hi(pg, x))
            best_hi = min(best_hi, time.perf_counter() - t0)
        dt = (best_hi - best_lo) / 2
        eps = e_tot / dt
        epfs = eps * b
        log(f"B={b}: {dt*1e3:.1f} ms/exec → {eps/1e6:.1f} M edges/s "
            f"({epfs/1e6:.1f} M edge-folds/s)")
        out["per_b"][str(b)] = {
            "ms_per_exec": round(dt * 1e3, 1),
            "edges_per_s": round(eps, 1),
            "edge_folds_per_s": round(epfs, 1),
        }
    merge_results("rate_10m", out)
    print(json.dumps({"metric": "big_graph_edge_folds_per_s",
                      "value": max((v["edge_folds_per_s"]
                                    for v in out["per_b"].values()),
                                   default=None),
                      "unit": "edge-folds/s"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("boundary", "rate"), required=True)
    ap.add_argument("--nodes", type=int, default=330000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--fold-batches", nargs="+", type=int, default=[4, 8, 12])
    args = ap.parse_args()
    if args.mode == "boundary":
        run_boundary()
    else:
        run_rate(args.nodes, args.edges, args.fold_batches)


if __name__ == "__main__":
    main()
