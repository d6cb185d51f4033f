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


def timed_chained(chain_builder, k_lo=1, k_hi=5, reps=3):
    """Marginal per-execution device time via in-graph repetition.

    The tunneled device→host sync costs a fixed ~23 ms (measured round 4),
    so single-execution wall times are harness-dominated.  chain_builder(k)
    must return a zero-arg callable running k executions chained INSIDE one
    jitted program; timing k_lo and k_hi and differencing cancels the sync
    and dispatch overhead exactly.  This matches production shape: the
    engine scans hundreds of epochs per program, paying the sync once."""
    lo, hi = chain_builder(k_lo), chain_builder(k_hi)
    sync_scalar(lo())
    sync_scalar(hi())
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync_scalar(lo())
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync_scalar(hi())
        t_hi = time.perf_counter() - t0
        diffs.append((t_hi - t_lo) / (k_hi - k_lo))
    # median of back-to-back paired differences: robust to tunnel jitter
    # (separate best-of minima can pair a lucky lo with an unlucky hi)
    diffs.sort()
    return diffs[len(diffs) // 2]


def load_achievable_rate():
    """Measured random-row DMA rates from benchmarks/dma_ceiling.json →
    row_bytes → GB/s interpolator, or None when the sweep hasn't run.

    Returns rate(row_bytes, which="mid") with "lo"/"hi" giving the
    per-point spread bounds (falling back to the midpoint when a point
    carries no spread) — bench propagates them into vs_achievable_range."""
    bdir = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "benchmarks", "results")
    path = _os.path.join(bdir, "dma_ceiling.json")
    if not _os.path.exists(path):
        path = _os.path.join(bdir, "dma_ceiling_r04.json")  # legacy name
    if not _os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    pts = sorted(
        (r["row_kb"] * 1024, r["gbps"] * 1e9,
         r.get("gbps_lo", r["gbps"]) * 1e9,
         r.get("gbps_hi", r["gbps"]) * 1e9)
        for r in data.get("sweep", [])
        if r["pattern"] == "random" and r["ring_depth"] == 8
    )
    if len(pts) < 2:
        return None

    def rate(row_bytes: float, which: str = "mid") -> float:
        col = {"mid": 1, "lo": 2, "hi": 3}[which]
        xs = [p[0] for p in pts]
        ys = [p[col] for p in pts]
        if row_bytes <= xs[0]:
            return ys[0]
        if row_bytes >= xs[-1]:
            return ys[-1]
        import bisect

        i = bisect.bisect_left(xs, row_bytes)
        t = (row_bytes - xs[i - 1]) / (xs[i] - xs[i - 1])
        return ys[i - 1] * (1 - t) + ys[i] * t

    return rate


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
            p_fb_raw = lambda pg_, xb_: jnp.sum(jax.grad(  # noqa: E731
                lambda xx: jnp.sum(pallas_spmm_max(pg_, xx) ** 2)
            )(xb_))
            candidates.append({
                "name": "pallas_fold_batched",
                "raw": p_fb_raw, "args": (pg, xb), "folds": FOLDS,
                # fwd row: stride f32; bwd fused row: 8·(lane+arg_lane) f32
                "bytes_per_edge": (stride * 4 + 8 * (lane + arg_lane) * 4)
                // FOLDS,
                # (row_bytes, bytes-per-edge contribution) for the
                # achievable-rate ceiling (measured DMA sweep)
                "rows": [(stride * 4, stride * 4),
                         (8 * (lane + arg_lane) * 4,
                          8 * (lane + arg_lane) * 4)],
                "dtype": "float32",
            })

            # --- Pallas f32 fwd-only (diagnostic, not a headline) ---------
            p_fwd_raw = lambda pg_, xb_: jnp.sum(  # noqa: E731
                pallas_spmm_max(pg_, xb_))
            candidates.append({
                "name": "pallas_fwd_only",
                "raw": p_fwd_raw, "args": (pg, xb), "folds": FOLDS,
                "bytes_per_edge": stride * 4 // FOLDS, "dtype": "float32",
                "rows": [(stride * 4, stride * 4)],
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
            p_fb16_raw = lambda pg_, xb_: jnp.sum(jax.grad(  # noqa: E731
                lambda xx: jnp.sum(
                    pallas_spmm_max(
                        pg_, xx.astype(jnp.bfloat16)
                    ).astype(jnp.float32) ** 2)
            )(xb_))
            lane16 = s16 // 16
            candidates.append({
                "name": "pallas_bf16_fold_batched",
                "raw": p_fb16_raw, "args": (pg16, xb16), "folds": B16,
                # fwd row: stride bf16; bwd fused row: 16·(2·lane16) int16,
                # of which the hub-covered fraction moves zero HBM bytes
                "bytes_per_edge": int(
                    s16 * 2 + (1.0 - cov_b) * 16 * 2 * lane16 * 2) // B16,
                "rows": [(s16 * 2, s16 * 2),
                         (16 * 2 * lane16 * 2,
                          (1.0 - cov_b) * 16 * 2 * lane16 * 2)],
                "dtype": "bfloat16",
            })

            # --- Pallas bf16 fwd-only (diagnostic: splits the headline's
            # achievable gap into measured per-pass terms) -----------------
            p_fwd16_raw = lambda pg_, xb_: jnp.sum(  # noqa: E731
                pallas_spmm_max(
                    pg_, xb_.astype(jnp.bfloat16)).astype(jnp.float32))
            candidates.append({
                "name": "pallas_bf16_fwd_only",
                "raw": p_fwd16_raw, "args": (pg16, xb16), "folds": B16,
                "bytes_per_edge": s16 * 2 // B16, "dtype": "bfloat16",
                "rows": [(s16 * 2, s16 * 2)],
                "diagnostic": True,
            })
            pallas_built = True
        except Exception as e:
            log(f"pallas path construction failed: {str(e)[:300]}")

    # Chained-execution timing for the Pallas candidates (side-effecting
    # pallas_call bodies are never CSE'd/hoisted, so k in-graph repetitions
    # are k real executions): the fixed ~23 ms tunneled sync otherwise
    # dominates single-execution wall times (measured round 4).
    K_LO, K_HI = 1, 5
    for c in candidates:
        if "raw" not in c:
            continue
        raw = c["raw"]

        def make(k, raw=raw):
            jitted = jax.jit(lambda *a: jax.lax.fori_loop(
                0, k, lambda i, acc: acc + raw(*a), jnp.float32(0.0)))
            return jitted

        c["chains"] = {K_LO: make(K_LO), K_HI: make(K_HI)}

    # --- Cache-warming pass: compile EVERYTHING before the timed section --
    warm = {}
    for c in candidates:
        if "chains" in c:
            warm[c["name"]] = warm_with_retry(
                c["name"], lambda c=c: [
                    sync_scalar(ch(*c["args"]))
                    for ch in c["chains"].values()])
        else:
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
        if "chains" in c:
            dt = timed_chained(
                lambda k, c=c: (lambda: c["chains"][k](*c["args"])),
                K_LO, K_HI)
            how = f"chained k={K_LO}/{K_HI}"
        else:
            dt = timed(c["fn"], *c["args"], reps=reps)
            how = f"{reps} reps"
        eps = c["folds"] * e_real / dt
        own_sol = bw / c["bytes_per_edge"]
        log(f"{c['name']} (B={c['folds']}, {how}): {dt*1e3:.2f} ms → "
            f"{eps/1e6:.1f} M edge-folds/s "
            f"({c['bytes_per_edge']} B/edge-fold, own SOL {own_sol/1e6:.1f} M "
            f"→ {eps/own_sol:.3f})")
        c["dt"] = dt
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

    def epoch_raw(graph, params, opt_state):
        def loss_fn(p):
            probs = gnn32_apply(p, graph, x)
            return multi_loss(probs, labels, mask, w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # chain k epochs through the optimizer state inside one program — the
    # engine's production shape (one jitted scan over all epochs), and the
    # real data dependency makes in-graph repetition un-hoistable
    def epoch_chain(k):
        def body(i, carry):
            p, o, _ = carry
            return epoch_raw(graph, p, o)

        return jax.jit(lambda p, o: jax.lax.fori_loop(
            0, k, body, (p, o, jnp.float32(0.0)))[2])

    ep_lo, ep_hi = epoch_chain(1), epoch_chain(5)
    if warm_with_retry(
        "gnn32_epoch", lambda: (sync_scalar(ep_lo(params, opt_state)),
                                sync_scalar(ep_hi(params, opt_state)))
    ):
        dte = timed_chained(
            lambda k: (lambda: (ep_lo if k == 1 else ep_hi)(
                params, opt_state)), 1, 5)
        log(f"GNN32 full-batch epoch (1 fold, XLA, chained k=1/5): "
            f"{dte*1e3:.2f} ms")

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

            def epoch_b_raw(pgb, pb, ob):
                def loss_fn(p):
                    probs_nbc = gnn32_apply_batched(
                        p, lambda xp: _psm(pgb, xp), x[:, :f_dim])
                    probs = jnp.moveaxis(probs_nbc, 1, 0)
                    return jnp.sum(jax.vmap(
                        lambda pr: multi_loss(pr, labels, mask, w))(probs))

                loss, grads = jax.value_and_grad(loss_fn)(pb)
                updates, ob2 = tx.update(grads, ob, pb)
                return optax.apply_updates(pb, updates), ob2, loss

            def epoch_b_chain(k):
                def body(i, carry):
                    p, o, _ = carry
                    return epoch_b_raw(pgb, p, o)

                return jax.jit(lambda p, o: jax.lax.fori_loop(
                    0, k, body, (p, o, jnp.float32(0.0)))[2])

            eb_lo, eb_hi = epoch_b_chain(1), epoch_b_chain(5)
            if warm_with_retry(
                "gnn32_fold_batched_epoch",
                lambda: (sync_scalar(eb_lo(pb, ob)),
                         sync_scalar(eb_hi(pb, ob))),
            ):
                dtb10 = timed_chained(
                    lambda k: (lambda: (eb_lo if k == 1 else eb_hi)(pb, ob)),
                    1, 5)
                log(f"GNN32 fold-batched epoch (B={FOLDS}, pallas, chained "
                    f"k=1/5): {dtb10*1e3:.2f} ms "
                    f"({dtb10/FOLDS*1e3:.2f} ms/fold-epoch)")
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
    # vs_achievable: winner rate vs the ceiling computed from the MEASURED
    # random-row DMA rate at its own row sizes (benchmarks/dma_ceiling.py,
    # VERDICT r3 next-step 2) instead of nominal HBM bandwidth.
    vs_ach = None
    vs_ach_range = None
    ach_rate = load_achievable_rate()
    if ach_rate is not None and best.get("rows"):
        def ceiling(which):
            t_per_edge = sum(
                bytes_i / ach_rate(row_i, which)
                for row_i, bytes_i in best["rows"])
            return best["folds"] / t_per_edge  # edge-folds/s

        ach_ceiling = ceiling("mid")
        vs_ach = best["eps"] / ach_ceiling
        # spread bounds: the FASTER the measured ring (hi), the LOWER the
        # ratio — range = [vs hi-rate ceiling, vs lo-rate ceiling]
        vs_ach_range = [best["eps"] / ceiling("hi"),
                        best["eps"] / ceiling("lo")]
        log(f"achievable ceiling at measured DMA rates: "
            f"{ach_ceiling/1e6:.1f} M edge-folds/s → vs_achievable "
            f"{vs_ach:.3f} [{vs_ach_range[0]:.3f}, {vs_ach_range[1]:.3f}]")

    # --- per-pass measured gap decomposition (VERDICT r4 step 1, branch b):
    # every residual term in the achievable gap as a MEASURED ratio.  The
    # fwd-only diagnostic runs the winner's exact graph/batch, so
    # T_bwd = T_total − T_fwd; each pass's achievable time is its measured
    # DMA bytes over the measured random-row ring rate at its own row size.
    decomp = None
    by_name = {c["name"]: c for c in candidates}
    fwd_diag = by_name.get(
        "pallas_bf16_fwd_only"
        if best is not None and best["dtype"] == "bfloat16"
        else "pallas_fwd_only")
    if (ach_rate is not None and best is not None and fwd_diag is not None
            and fwd_diag.get("dt") and len(best.get("rows", ())) == 2):
        t_tot = best["folds"] * e_real / best["eps"]
        t_fwd = fwd_diag["dt"]
        t_bwd = t_tot - t_fwd
        ta = [e_real * bytes_i / ach_rate(row_i, "mid")
              for row_i, bytes_i in best["rows"]]
        decomp = {
            "fwd_ms": round(t_fwd * 1e3, 2),
            "bwd_ms": round(t_bwd * 1e3, 2),
            "fwd_vs_achievable": round(ta[0] / t_fwd, 3),
            "bwd_vs_achievable": round(ta[1] / t_bwd, 3),
            "fwd_achievable_ms": round(ta[0] * 1e3, 2),
            "bwd_achievable_ms": round(ta[1] * 1e3, 2),
        }
        log(f"gap decomposition (all terms measured): "
            f"fwd {t_fwd*1e3:.2f} ms vs achievable {ta[0]*1e3:.2f} ms "
            f"→ {ta[0]/t_fwd:.3f}; "
            f"bwd {t_bwd*1e3:.2f} ms vs achievable {ta[1]*1e3:.2f} ms "
            f"→ {ta[1]/t_bwd:.3f}")
    log(f"best: {best['name']} at {best['eps']/1e6:.1f} M edge(-fold)s/s; "
        f"own SOL {own_sol/1e6:.1f} M → {vs_own:.3f} "
        f"(legacy f32-bytes SOL {f32_sol/1e6:.1f} M → {vs_f32:.3f})")

    result = {
        "metric": "spmm_max_fwd_bwd_edges_per_sec_per_chip",
        "value": round(best["eps"], 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_own, 4),
        "vs_f32_sol": round(vs_f32, 4),
        "vs_achievable": round(vs_ach, 4) if vs_ach is not None else None,
        "vs_achievable_range": (
            [round(v, 4) for v in vs_ach_range]
            if vs_ach_range is not None else None),
        "bytes_per_edge": int(best["bytes_per_edge"]),
        "dtype": best["dtype"],
        "winner": best["name"],
        "timing": "in-graph chained k=1/5 differencing (kernel paths)",
    }
    if decomp is not None:
        result["decomposition"] = decomp
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
