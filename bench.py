"""Benchmark: aggregated SpMM (fwd+bwd) edges/s/chip on a PLA-GNN-scale graph.

Headline metric per BASELINE.json: segment-max SpMM forward+backward
throughput on the full-batch PPI graph (24,041 nodes, ~724k directed edges
incl. self-loops, 503-dim features — main.py:40, utils.py:46-49 scale),
aggregated over the 10-fold CV ensemble that constitutes the real workload
(train.py:162-195).  Three implementations are measured and the best wins:

* XLA bucketed-ELL path (per-fold),
* Pallas fold-batched grouped-CSR kernels (f32, one DMA per edge for all
  folds),
* Pallas bf16 message mode at the fold batch that amortizes the scalar-core
  DMA-issue floor (B=32; measured plateau 171.5/175.4/176.2 M at B=24/28/32)
  plus the backward VMEM hub cache (top-128 most-fetched fused rows served
  from a persistent arena, work-stolen between DMA-ring groups).

SOL accounting is per-path-honest: every path carries its own measured
bytes-of-read-traffic per edge-fold (fwd row gather + fused bwd grad/argmax
row), and ``vs_baseline`` is the winner's fraction of the nominal-HBM-
bandwidth ceiling at ITS OWN bytes/edge.  ``vs_f32_sol`` keeps the legacy
2·F·4-bytes ratio for cross-round comparability.

Resilience: the remote-TPU compile service intermittently fails (HTTP 500);
every compile+warm is wrapped in a retry loop with exponential backoff, and
all programs are compiled in a warming pass BEFORE the timed section.  The
benchmark exits nonzero only when the pallas fwd+bwd path is still down
after retries (the loud-degraded contract from round 1).

Prints exactly ONE JSON line to stdout; details go to stderr.
Timing note: ``block_until_ready`` is unreliable through the remote-TPU
tunnel — every measurement syncs via a scalar device→host transfer.
"""
import os as _os
# Persistent compiled-executable cache: remote-TPU compiles are slow and the
# service throughput varies; cached executables skip them entirely.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import json
import sys
import time

import numpy as np

HBM_BYTES_PER_SEC = {
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "cpu": 50e9,
}

FOLDS = 10
B16 = 32            # bf16 fold batch at the measured throughput plateau
                    # (B=24: 171.5, B=28: 175.4, B=32: 176.2 M e-f/s — r3 sweep)
F_DIM = 503


def detect_bw(device_kind: str) -> float:
    for k, v in HBM_BYTES_PER_SEC.items():
        if k in device_kind.lower():
            return v
    return 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync_scalar(x) -> float:
    """Force execution through the tunnel: device→host scalar transfer."""
    return float(np.asarray(x).ravel()[0])


def warm_with_retry(label, warm_fn, attempts=4, backoff=20.0,
                    sleep=time.sleep):
    """Compile + warm one program, retrying transient compile failures.

    The remote-compile service 500s intermittently (round 2's official
    capture lost a demonstrated 165-173 M number to a single transient
    failure); compiles are deterministic, so a retry with backoff recovers
    unless the service is down for good.  Returns True when the program is
    warm, False when every attempt failed."""
    for k in range(attempts):
        try:
            warm_fn()
            return True
        except Exception as e:
            log(f"{label}: compile/warm attempt {k + 1}/{attempts} failed: "
                f"{str(e)[:300]}")
            if k + 1 < attempts:
                delay = backoff * (2 ** k)
                log(f"{label}: retrying in {delay:.0f}s")
                sleep(delay)
    return False


def timed(fn, *args, reps):
    sync_scalar(fn(*args))  # already warm; one sync to drain the pipe
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync_scalar(r)
    return (time.perf_counter() - t0) / reps


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
    n_nodes = 24041 if on_tpu else 1024
    n_edges = 700_000 if on_tpu else 8_192
    f_dim = F_DIM

    log(f"device: {dev} ({kind}); graph: {n_nodes} nodes, {n_edges} edges, F={f_dim}")

    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=n_nodes, n_edges=n_edges, seed=70, feature_dims=(3, 250, 250)
    )
    graph = from_scipy_coo(ppi, add_self_loops=True, node_multiple=128)
    e_real = graph.n_edges
    x = jnp.asarray(pad_features(feats, graph.n_nodes))
    reps = 10 if on_tpu else 2
    bw = detect_bw(kind)

    # Headline candidates: (name, fn, args, folds, bytes/edge-fold, dtype).
    # bytes/edge-fold = per-edge DMA *read* traffic for fwd gather + fused
    # bwd grad/argmax row, divided by the fold batch (output writes are
    # amortized per node, ~E/N=30x smaller, and excluded — so the computed
    # ceiling is optimistic and the reported ratio conservative).
    candidates = []

    # --- XLA path: single-fold SpMM fwd+bwd -------------------------------
    spmm_fb = jax.jit(
        lambda graph, x: jnp.sum(
            jax.grad(lambda xx: jnp.sum(spmm_max(graph, xx) ** 2))(x)
        )
    )
    candidates.append({
        "name": "xla_per_fold",
        "fn": spmm_fb, "args": (graph, x), "folds": 1,
        "bytes_per_edge": 2 * f_dim * 4, "dtype": "float32",
    })

    pallas_built = False
    if on_tpu:
        try:
            from plagnn_tpu.ops.pallas.spmm_kernels import (
                build_pallas_graph, pallas_spmm_max, pick_rows_per_block,
            )

            src = np.asarray(graph.src)[:e_real]
            dst = np.asarray(graph.dst)[:e_real]

            # --- Pallas f32 fold-batched fwd+bwd (B=10) -------------------
            pg = build_pallas_graph(src, dst, graph.n_nodes)
            xb = jnp.broadcast_to(
                x[:, None, :f_dim], (graph.n_nodes, FOLDS, f_dim)
            )
            xb = jnp.pad(xb, ((0, 0), (0, 0), (0, 512 - f_dim)))
            stride = FOLDS * 512
            lane = stride // 8
            arg_lane = max(-(-(lane // 2) // 128) * 128, 128)
            p_fb = jax.jit(
                lambda pg_, xb_: jnp.sum(jax.grad(
                    lambda xx: jnp.sum(pallas_spmm_max(pg_, xx) ** 2)
                )(xb_))
            )
            candidates.append({
                "name": "pallas_fold_batched",
                "fn": p_fb, "args": (pg, xb), "folds": FOLDS,
                # fwd row: stride f32; bwd fused row: 8·(lane+arg_lane) f32
                "bytes_per_edge": (stride * 4 + 8 * (lane + arg_lane) * 4)
                // FOLDS,
                "dtype": "float32",
            })

            # --- Pallas f32 fwd-only (diagnostic, not a headline) ---------
            p_fwd = jax.jit(
                lambda pg_, xb_: jnp.sum(pallas_spmm_max(pg_, xb_)))
            candidates.append({
                "name": "pallas_fwd_only",
                "fn": p_fwd, "args": (pg, xb), "folds": FOLDS,
                "bytes_per_edge": stride * 4 // FOLDS, "dtype": "float32",
                "diagnostic": True,
            })

            # --- Pallas bf16 fwd+bwd at the plateau batch (B=32) ----------
            # bf16 halves the bytes of every edge DMA; max is exact over the
            # rounded inputs and the backward fuses bf16 grads + int16
            # argmax lanes at equal width.
            s16 = B16 * 512
            rpb16 = pick_rows_per_block(graph.n_nodes, s16)
            # Hub cache (measured policy pick_hub_sizes): at this byte-bound
            # stride the BACKWARD stream serves its top-k most-fetched fused
            # rows from a persistent VMEM arena (zero per-edge DMA, work-
            # stolen between ring groups); the forward hub stays off (the
            # argmax-variant hub body costs about what its DMA saves).
            from plagnn_tpu.ops.pallas.spmm_kernels import pick_hub_sizes
            kf16, kb16 = pick_hub_sizes("auto", s16, 2)
            rpb16b = pick_rows_per_block(
                graph.n_nodes, s16,
                arena_bytes=(kb16 + 1) * s16 * 4 if kb16 else 0)
            pg16 = build_pallas_graph(
                src, dst, graph.n_nodes, rpb16, hub_k=kf16, hub_k_bwd=kb16,
                rows_per_block_bwd=rpb16b)
            cov_b = 0.0
            if pg16.bwd.hub is not None:
                n_main = int(np.sum(
                    np.asarray(pg16.bwd.src) != graph.n_nodes - 1))
                cov_b = (e_real - n_main) / e_real
                log(f"bf16 bwd hub: k={kb16}, edge coverage {cov_b:.3f}")
            xb16 = jnp.tile(
                jnp.pad(x[:, None, :f_dim], ((0, 0), (0, 0), (0, 9))),
                (1, 1, B16),
            )  # layout-agnostic per-position max: any packing works
            p_fb16 = jax.jit(
                lambda pg_, xb_: jnp.sum(jax.grad(
                    lambda xx: jnp.sum(
                        pallas_spmm_max(
                            pg_, xx.astype(jnp.bfloat16)
                        ).astype(jnp.float32) ** 2)
                )(xb_))
            )
            lane16 = s16 // 16
            candidates.append({
                "name": "pallas_bf16_fold_batched",
                "fn": p_fb16, "args": (pg16, xb16), "folds": B16,
                # fwd row: stride bf16; bwd fused row: 16·(2·lane16) int16,
                # of which the hub-covered fraction moves zero HBM bytes
                "bytes_per_edge": int(
                    s16 * 2 + (1.0 - cov_b) * 16 * 2 * lane16 * 2) // B16,
                "dtype": "bfloat16",
            })
            pallas_built = True
        except Exception as e:
            log(f"pallas path construction failed: {str(e)[:300]}")

    # --- Cache-warming pass: compile EVERYTHING before the timed section --
    warm = {}
    for c in candidates:
        warm[c["name"]] = warm_with_retry(
            c["name"], lambda c=c: sync_scalar(c["fn"](*c["args"])))
    pallas_ok = any(
        warm.get(n) for n in ("pallas_fold_batched", "pallas_bf16_fold_batched")
    )

    # --- Timed section -----------------------------------------------------
    best = None
    for c in candidates:
        if not warm[c["name"]]:
            continue
        dt = timed(c["fn"], *c["args"], reps=reps)
        eps = c["folds"] * e_real / dt
        own_sol = bw / c["bytes_per_edge"]
        log(f"{c['name']} (B={c['folds']}): {dt*1e3:.2f} ms → "
            f"{eps/1e6:.1f} M edge-folds/s "
            f"({c['bytes_per_edge']} B/edge-fold, own SOL {own_sol/1e6:.1f} M "
            f"→ {eps/own_sol:.3f})")
        if c.get("diagnostic"):
            continue
        if best is None or eps > best["eps"]:
            best = dict(c, eps=eps)

    # --- full training epoch (fwd + loss + bwd + adam), single fold --------
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

    def epoch_scalar(graph, params, opt_state):
        _, _, loss = epoch(graph, params, opt_state)
        return loss

    if warm_with_retry(
        "gnn32_epoch", lambda: sync_scalar(epoch_scalar(graph, params, opt_state))
    ):
        dte = timed(epoch_scalar, graph, params, opt_state, reps=reps)
        log(f"GNN32 full-batch epoch (1 fold, XLA): {dte*1e3:.2f} ms")

    # --- fold-batched training epoch via pallas aggregation (the real
    # workload shape: all 10 CV folds advance together) -----------------
    if on_tpu and pallas_built:
        try:
            from plagnn_tpu.models.batched import gnn32_apply_batched
            from plagnn_tpu.ops.pallas.spmm_kernels import (
                build_pallas_graph as _bpg, pallas_spmm_max as _psm,
            )

            src = np.asarray(graph.src)[:e_real]
            dst = np.asarray(graph.dst)[:e_real]
            pgb = _bpg(src, dst, graph.n_nodes)
            keys = jax.random.split(jax.random.PRNGKey(70), FOLDS)
            pb = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[init_gnn32(k, f_dim) for k in keys])
            # one shared optax state (Adam is elementwise; a vmapped init
            # would give a per-fold count that breaks unbatched updates)
            ob = tx.init(pb)

            @jax.jit
            def epoch_b(pgb, pb, ob):
                def loss_fn(p):
                    probs_nbc = gnn32_apply_batched(
                        p, lambda xp: _psm(pgb, xp), x[:, :f_dim])
                    probs = jnp.moveaxis(probs_nbc, 1, 0)
                    return jnp.sum(jax.vmap(
                        lambda pr: multi_loss(pr, labels, mask, w))(probs))

                loss, grads = jax.value_and_grad(loss_fn)(pb)
                updates, ob2 = tx.update(grads, ob, pb)
                return optax.apply_updates(pb, updates), ob2, loss

            def epoch_b_scalar(pgb, pb, ob):
                return epoch_b(pgb, pb, ob)[2]

            if warm_with_retry(
                "gnn32_fold_batched_epoch",
                lambda: sync_scalar(epoch_b_scalar(pgb, pb, ob)),
            ):
                dtb10 = timed(epoch_b_scalar, pgb, pb, ob, reps=reps)
                log(f"GNN32 fold-batched epoch (B={FOLDS}, pallas): "
                    f"{dtb10*1e3:.2f} ms ({dtb10/FOLDS*1e3:.2f} ms/fold-epoch)")
        except Exception as ex:
            log(f"fold-batched epoch unavailable: {str(ex)[:300]}")

    # --- speed-of-light comparison -----------------------------------------
    # vs_baseline: winner's fraction of nominal HBM bandwidth at its OWN
    # bytes/edge-fold.  vs_f32_sol: legacy 2·F·4-bytes ratio (round-1/2
    # JSONs used this basis) for cross-round comparability.
    f32_sol = bw / (2 * f_dim * 4)
    own_sol = bw / best["bytes_per_edge"]
    vs_own = best["eps"] / own_sol
    vs_f32 = best["eps"] / f32_sol
    log(f"best: {best['name']} at {best['eps']/1e6:.1f} M edge(-fold)s/s; "
        f"own SOL {own_sol/1e6:.1f} M → {vs_own:.3f} "
        f"(legacy f32-bytes SOL {f32_sol/1e6:.1f} M → {vs_f32:.3f})")

    result = {
        "metric": "spmm_max_fwd_bwd_edges_per_sec_per_chip",
        "value": round(best["eps"], 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_own, 4),
        "vs_f32_sol": round(vs_f32, 4),
        "bytes_per_edge": int(best["bytes_per_edge"]),
        "dtype": best["dtype"],
        "winner": best["name"],
    }
    if on_tpu and not pallas_ok:
        # The production fast path regressed: refuse to let the XLA
        # fallback masquerade as a healthy result (exit nonzero so the
        # driver/CI flags it; the JSON still records what DID run).
        result["degraded"] = "pallas_path_failed"
        print(json.dumps(result))
        log("FAIL: pallas fold-batched path did not run on TPU after retries")
        sys.exit(1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
