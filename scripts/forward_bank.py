#!/usr/bin/env python3
"""Retry-until-banked forward timing for flapping-relay windows.

Repeatedly attempts the canonical forward measurement (B=8, N=16384,
bf16, fast kNN) with a per-attempt SIGALRM deadline; on success writes
one JSON line to the path in argv[1] (default /tmp/forward_bank.json)
and exits 0. Designed to run unattended while the TPU relay flaps
(round-5 observed mode: serves a compile, wedges seconds later, clears
minutes later): each failed attempt resets the backend and sleeps.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/forward_bank.json"
ATTEMPT_DEADLINE = int(os.environ.get("BANK_ATTEMPT_DEADLINE", 300))
SLEEP_BETWEEN = int(os.environ.get("BANK_SLEEP", 60))
MAX_WALL = int(os.environ.get("BANK_MAX_WALL", 3300))


def attempt():
    import bench as bench_mod

    pps, variables, extras = bench_mod._forward_once("fast")
    return {
        "points_per_sec": round(pps, 1),
        **extras,
    }


def main():
    import bench as bench_mod
    from pointstowood_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # bench's own timeout class: _forward_once's per-readback retry
    # deliberately re-raises it (a foreign exception would be swallowed
    # as a transient device error and retried into the next deadline)
    signal.signal(signal.SIGALRM, bench_mod._alarm_handler)
    t0 = time.monotonic()
    i = 0
    while time.monotonic() - t0 < MAX_WALL:
        i += 1
        print(f"[bank] attempt {i} (+{time.monotonic() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        try:
            signal.alarm(ATTEMPT_DEADLINE)
            res = attempt()
            signal.alarm(0)
            res["attempt"] = i
            with open(OUT, "w") as f:
                f.write(json.dumps(res) + "\n")
            print(f"[bank] SUCCESS: {res}", file=sys.stderr, flush=True)
            return 0
        except bench_mod.BenchTimeout:
            print(f"[bank] attempt {i} hit {ATTEMPT_DEADLINE}s deadline",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"[bank] attempt {i} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        bench_mod._reset_backend()
        time.sleep(SLEEP_BETWEEN)
    print("[bank] gave up (wall budget)", file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
