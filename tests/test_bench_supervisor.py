"""The bench supervisor must land ONE parseable JSON line even when the
measurement child dies from a native abort (the observed axon-client
panic mode, 2026-08-21) — the driver's round artifact depends on it."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=420):
    env = dict(os.environ)
    # force the CPU backend inside the children regardless of the
    # ambient platform, keep the run tiny, and exercise the abort hook
    env.update(extra_env)
    env.setdefault("BENCH_E2E_POINTS", "0")
    env.setdefault("BENCH_CPU_FALLBACK_N", "512")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        env=env, timeout=timeout, cwd=REPO,
    )
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    assert lines, proc.stderr.decode()[-2000:]
    return proc, json.loads(lines[-1])


def test_supervisor_survives_child_abort():
    """Child os.abort()s (as the native client panic does); the
    supervisor's CPU-only retry child must still land an annotated
    nonzero value."""
    proc, result = _run_bench({
        "BENCH_SIMULATE_ABORT": "1",
        "BENCH_TIME_BUDGET": "240",
    })
    assert proc.returncode == 0
    assert result["metric"] == "inference_points_per_sec"
    assert result["value"] > 0, result
    assert result.get("supervisor_retry") == "cpu_only_child", result
    assert result.get("knn_method") == "cpu_fallback", result


def test_force_cpu_child_runs_without_remote_client():
    """BENCH_FORCE_CPU (the retry rung) must produce a valid measurement
    on its own, without ever touching the remote backend."""
    proc, result = _run_bench({
        "BENCH_CHILD": "1",  # single process, no supervisor
        "BENCH_FORCE_CPU": "1",
        "BENCH_TIME_BUDGET": "180",
    })
    assert proc.returncode == 0
    assert result["value"] > 0, result
    assert result.get("tpu_skipped") == "BENCH_FORCE_CPU", result
