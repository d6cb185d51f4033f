"""Guard the driver contract: ``python bench.py`` must print exactly one
JSON line to stdout with the agreed schema (details go to stderr).

Runs in a subprocess on CPU (small synthetic config, XLA path only) so a
regression in bench.py can't silently cost the round's recorded metric.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be exactly one line, got: {lines}"
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline", "vs_f32_sol",
            "bytes_per_edge", "dtype", "winner"} <= set(rec)
    assert rec["metric"] == "spmm_max_fwd_bwd_edges_per_sec_per_chip"
    assert rec["value"] > 0
    assert 0 < rec["vs_baseline"]
    assert rec["bytes_per_edge"] > 0
    assert rec["dtype"] in ("float32", "bfloat16")


# ---------------------------------------------------------------------------
# Compile-retry resilience (VERDICT r2 next-round #1): a transient remote-
# compile failure must not kill the benchmark.
# ---------------------------------------------------------------------------


def test_warm_with_retry_recovers_from_transient_failure():
    sys.path.insert(0, REPO)
    from bench import warm_with_retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("HTTP 500: tpu_compile_helper subprocess exit")

    sleeps = []
    ok = warm_with_retry("flaky", flaky, attempts=4, backoff=0.01,
                         sleep=sleeps.append)
    assert ok and len(calls) == 3
    # exponential backoff between attempts
    assert sleeps == [0.01, 0.02]


def test_warm_with_retry_gives_up_after_attempts():
    sys.path.insert(0, REPO)
    from bench import warm_with_retry

    calls = []

    def down():
        calls.append(1)
        raise RuntimeError("HTTP 500")

    ok = warm_with_retry("down", down, attempts=3, backoff=0.0,
                         sleep=lambda _: None)
    assert not ok and len(calls) == 3
