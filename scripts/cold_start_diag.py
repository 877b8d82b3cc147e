#!/usr/bin/env python3
"""Diagnose the 60 s cold start: does the persistent XLA compilation
cache actually serve the canonical forward executable on this
relay-compiled backend, and if so where does the remaining cold time go?

Runs bench's canonical forward (fast kNN, batch 8, n 16384) TWICE in
fresh subprocesses with jax_explain_cache_misses + persistent-cache
debug logging:
  pass 1: current cache state (may hit or miss)
  pass 2: must HIT if the cache works (same code, same shapes)

Usage: python scripts/cold_start_diag.py   (real TPU; ~2-5 min)
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))

CHILD = r"""
import logging, time
logging.basicConfig(level=logging.WARNING)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
from pointstowood_tpu.utils.compile_cache import enable_compile_cache

try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception as e:
    print(f"[child] no jax_explain_cache_misses flag: {e}", flush=True)
cache_dir = enable_compile_cache()
print(f"[child] cache dir: {cache_dir}", flush=True)

import bench

t0 = time.perf_counter()
pps, _, extras = bench._forward_once("fast", warmup=1, iters=1)
print(f"[child] _forward_once total {time.perf_counter() - t0:.1f}s "
      f"({pps:,.0f} pts/s raw)", flush=True)
"""


def run_pass(tag):
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, "-c", CHILD], cwd=REPO, capture_output=True,
        text=True, timeout=600,
    )
    dt = time.perf_counter() - t0
    print(f"--- pass {tag}: {dt:.1f}s wall, rc={p.returncode}")
    for line in (p.stdout + p.stderr).splitlines():
        low = line.lower()
        if ("[child]" in line or "[bench" in line or "cache" in low
                or "miss" in low or "persistent" in low):
            print("   ", line[:220])
    return dt


def main():
    cache = os.path.expanduser("~/.cache/pointstowood_tpu/xla")
    before = set(os.listdir(cache)) if os.path.isdir(cache) else set()
    d1 = run_pass(1)
    after1 = set(os.listdir(cache)) if os.path.isdir(cache) else set()
    print(f"pass 1 wrote {len(after1 - before)} new cache entries")
    d2 = run_pass(2)
    after2 = set(os.listdir(cache)) if os.path.isdir(cache) else set()
    print(f"pass 2 wrote {len(after2 - after1)} new cache entries")
    print(f"\nSUMMARY: pass1 {d1:.1f}s, pass2 {d2:.1f}s "
          f"({'cache EFFECTIVE' if d2 < 0.6 * d1 else 'cache INEFFECTIVE'})")


if __name__ == "__main__":
    main()
