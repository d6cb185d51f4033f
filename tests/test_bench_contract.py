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
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "spmm_max_fwd_bwd_edges_per_sec_per_chip"
    assert rec["value"] > 0
    assert 0 < rec["vs_baseline"]
