#!/usr/bin/env python3
"""Benchmark: steady-state forward throughput + end-to-end plot inference.

Prints ONE JSON line on stdout, ALWAYS — every failure path is caught and
still emits the line (rc 0) with whatever was measured plus a diagnostic
field. Progress streams to stderr so a watching driver sees liveness.

  {"metric": "inference_points_per_sec", "value": N, "unit": "points/s",
   "vs_baseline": R, ... }

value: the inference hot path — the padded-tile forward pass at the
reference's canonical config (max_pts=16384 tiles, batch_size=8,
reference README.md:73) — with honest device sync (block_until_ready is a
no-op on this environment's tunneled backend; sync = host readback of a
reduced scalar).

Robustness (round-5 redesign after BENCH_r04 recorded 0.0: the relay was
wedged outright — a trivial matmul hung >120 s — and the old descending
270+150+150 ladder spent the whole budget on doomed TPU rungs, leaving
the guaranteed CPU rung unreachable):
  * a WEDGE PROBE opens the run: one trivial device matmul under SIGALRM.
    If it hangs, every TPU rung is skipped, the CPU fallback runs
    immediately, and the JSON carries "tpu_wedged": true;
  * on a live backend the canonical compile gets ONE deadline sized to
    the measured relay load p100 (~270-330 s; BASELINE.md cold-start
    table shows 50-270 s regardless of cache state) instead of several
    short rungs whose resets discard executable-load progress;
  * CPU_RESERVE (default 90 s) of the budget is untouchable by TPU
    attempts, so the CPU fallback ALWAYS has room and a nonzero value
    always lands;
  * per-readback retry for transient device errors (the BENCH_r02 mode);
  * a hard wall-clock budget (BENCH_TIME_BUDGET, default 540 s) enforced
    with SIGALRM — on expiry the JSON line is emitted with everything
    measured so far instead of the driver's timeout recording nothing;
  * a SUPERVISOR parent (round 5): the measurement runs in a re-exec'd
    child because the tunneled backend's native client can panic and
    abort() the whole process (observed during a backend reset — no
    Python finally survives that). A child that dies JSON-less gets one
    BENCH_FORCE_CPU retry that switches to the CPU backend before any
    device touch, so the remote client is never loaded. BENCH_NO_SUPERVISE=1
    runs single-process (tests / debugging).

vs_baseline: ratio against MEASURED_TORCH_CPU_PPS — the reference network
forward *measured* in plain torch on this host's CPU via
scripts/measure_torch_reference.py (the CUDA/PyG reference itself cannot
run here; this is a documented lower-bound proxy). The old invented RTX
6000 estimate is kept as the separate vs_estimate_rtx6000 field.

Extra fields: an END-TO-END plot-scale run (synthetic multi-tree plot,
PLY -> preprocess -> dual-grid tiled inference -> kNN fusion -> labeled
PLY) reported as e2e_points_per_sec / e2e_seconds — the metric the
pipeline actually delivers to users, compile time and host phases
included. Set BENCH_E2E_POINTS to resize (default 1_000_000; 0 skips);
the run is skipped or downsized automatically when the time budget is
nearly spent, without losing the forward number.
"""

import json
import os
import signal
import sys
import tempfile
import time

import numpy as np

# Measured on this host (2026-08-16): python scripts/measure_torch_reference.py
# -> reference-network forward, plain torch CPU (1 core), chunked exact
# neighbor search, canonical 16384-pt tile: 12.51 s/tile.
MEASURED_TORCH_CPU_PPS = 1310.0
# Order-of-magnitude estimate of the CUDA reference on its RTX 6000 dev GPU
# (no published numbers exist to cite; see BASELINE.md).
ESTIMATED_RTX6000_PPS = 1.0e6
# TPU v5e peak bf16 matmul throughput per chip (public spec: 197 TFLOP/s).
# Override with BENCH_PEAK_BF16_FLOPS when benching other hardware.
PEAK_BF16_FLOPS = float(os.environ.get("BENCH_PEAK_BF16_FLOPS", 197e12))

BATCH = 8
N = 16384
WARMUP = 2
ITERS = 8

T0 = time.monotonic()
TIME_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", 540))
# Budget slice no TPU attempt may touch: the CPU fallback's guaranteed room.
CPU_RESERVE = float(os.environ.get("BENCH_CPU_RESERVE", 90))
# CPU-fallback tile size: small enough that compile+run fits CPU_RESERVE on
# a 1-core host (the value is annotated as degraded either way).
CPU_FALLBACK_N = int(os.environ.get("BENCH_CPU_FALLBACK_N", 4096))


def elapsed():
    return time.monotonic() - T0


def remaining():
    return TIME_BUDGET - elapsed()


def log(msg):
    print(f"[bench +{elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


class BenchTimeout(Exception):
    """Raised by the SIGALRM handler when the wall-clock budget expires."""


def _alarm_handler(signum, frame):
    raise BenchTimeout(f"time budget {TIME_BUDGET:.0f}s expired")


def _reset_backend():
    """Tear down the (possibly wedged) PJRT client; next use reconnects."""
    import jax

    log("resetting JAX backend (clear_caches + clear_backends)")
    try:
        jax.clear_caches()
    except Exception as e:  # noqa: BLE001 - diagnostics only
        log(f"  clear_caches failed: {e!r}")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception as e:  # noqa: BLE001
        log(f"  clear_backends failed: {e!r}")
    time.sleep(3.0)


def tree_points(rng, n, trunk_frac=0.25, height=2.0):
    n_wood = int(n * trunk_frac)
    n_leaf = n - n_wood
    theta = rng.uniform(0, 2 * np.pi, n_wood)
    r = rng.uniform(0, 0.15, n_wood)
    trunk = np.stack(
        [r * np.cos(theta), r * np.sin(theta), rng.uniform(0, height, n_wood)], 1
    )
    crown = rng.normal(0, 0.7, size=(n_leaf, 3)) + [0, 0, 0.75 * height]
    refl = np.concatenate(
        [rng.normal(2.0, 0.3, n_wood), rng.normal(-1.0, 0.5, n_leaf)]
    )
    return np.concatenate([trunk, crown]).astype(np.float32), refl.astype(np.float32)


def _forward_once(knn_method, batch=BATCH, n=N, warmup=WARMUP, iters=ITERS):
    import functools

    import jax
    import jax.numpy as jnp

    from pointstowood_tpu.model import Net

    rng = np.random.default_rng(141190)
    pts = []
    for _ in range(batch):
        xyz, _ = tree_points(rng, n)
        pts.append(xyz)
    pos = np.stack(pts)
    pos -= pos.mean(axis=1, keepdims=True)
    refl = rng.normal(size=(batch, n)).astype(np.float32)
    mask = np.ones((batch, n), bool)
    sf = np.linalg.norm(pos, axis=2).max(axis=1).astype(np.float32)

    net = Net(dtype=jnp.bfloat16, knn_method=knn_method)
    pos_j, refl_j = jnp.asarray(pos), jnp.asarray(refl)
    mask_j, sf_j = jnp.asarray(mask), jnp.asarray(sf)
    log(f"  init+compile (knn_method={knn_method}, batch={batch}, n={n}) ...")
    variables = jax.jit(functools.partial(net.init, training=False))(
        {"params": jax.random.key(0)}, pos_j, refl_j, mask_j, sf_j
    )

    @jax.jit
    def forward(variables, pos, refl, mask, sf):
        logits = net.apply(variables, pos, refl, mask, sf, training=False)
        return jax.nn.sigmoid(jnp.nan_to_num(logits))

    # NOTE: block_until_ready is a no-op on this environment's tunneled TPU
    # backend; a host readback of a reduced scalar is the only true sync.
    reduce = jax.jit(lambda p: p.sum())

    for w in range(warmup):
        # Per-readback retry: a transient device error poisons only this
        # dispatch's result; re-dispatching often succeeds without a full
        # backend reset (the BENCH_r02 failure mode).
        for attempt in range(3):
            try:
                np.asarray(reduce(forward(variables, pos_j, refl_j, mask_j, sf_j)))
                break
            except BenchTimeout:
                raise
            except Exception as e:  # noqa: BLE001
                log(f"  warmup {w} readback failed "
                    f"(attempt {attempt + 1}/3): {type(e).__name__}: {e}")
                if attempt == 2:
                    raise
                time.sleep(2.0)
        log(f"  warmup {w + 1}/{warmup} done")

    t0 = time.perf_counter()
    for _ in range(iters):
        probs = forward(variables, pos_j, refl_j, mask_j, sf_j)
    np.asarray(reduce(probs))  # true device sync
    dt = time.perf_counter() - t0
    pps = batch * n * iters / dt
    log(f"  timed {iters} iters in {dt:.3f}s -> {pps:,.0f} points/s")

    # FLOP accounting + MFU (VERDICT r3 item 6): XLA's own cost model for
    # the compiled forward executable. The lowering is served from the jit
    # cache, so this costs no extra compile.
    extras = {"forward_seconds": round(dt / iters, 5)}
    try:
        ca = forward.lower(
            variables, pos_j, refl_j, mask_j, sf_j
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            extras["forward_flops"] = flops
            extras["mfu_bf16"] = round(flops / (dt / iters) / PEAK_BF16_FLOPS, 4)
            log(f"  cost_analysis: {flops / 1e12:.3f} TFLOP/forward -> "
                f"MFU(bf16 peak {PEAK_BF16_FLOPS / 1e12:.0f}T) "
                f"{extras['mfu_bf16'] * 100:.2f}%")
    except Exception as e:  # noqa: BLE001 - cost model optional per backend
        log(f"  cost_analysis unavailable: {type(e).__name__}: {e}")
    return pps, variables, extras


def _arm(seconds):
    """(Re)arm SIGALRM for a phase, never beyond the global budget."""
    if hasattr(signal, "SIGALRM"):
        # idempotent: callers outside main() (e.g. profiling scripts that
        # import forward_benchmark) need the handler too, or a stale alarm
        # would kill their process
        signal.signal(signal.SIGALRM, _alarm_handler)
        signal.alarm(max(int(min(seconds, remaining())), 1))


def _wedge_probe(deadline):
    """One trivial jitted matmul + host readback under SIGALRM.

    The tunneled relay's documented failure mode is an outright wedge
    where even a 256x256 matmul hangs for hours (BENCH_r04 post-mortem:
    reproduced >120 s on a trivial op). Detect that in bounded time so
    the budget is never spent on doomed TPU rungs. Returns
    (live, seconds_spent)."""
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    try:
        if os.environ.get("BENCH_SIMULATE_WEDGE"):
            # test hook: exercise the wedged path end-to-end without a
            # wedged relay — sleep through the deadline like a hung op
            log(f"wedge probe: BENCH_SIMULATE_WEDGE set, hanging {deadline:.0f}s")
            _arm(deadline)
            time.sleep(deadline + 30)
        _arm(deadline)
        x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), jnp.float32))
        float(np.asarray(x))
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
        dt = time.monotonic() - t0
        log(f"wedge probe: backend live ({dt:.1f}s, "
            f"{jax.devices()[0].platform})")
        return True, dt
    except BenchTimeout:
        log(f"wedge probe: trivial matmul hung >{deadline:.0f}s "
            "-> relay wedged, skipping ALL TPU rungs")
        return False, time.monotonic() - t0
    except Exception as e:  # noqa: BLE001
        log(f"wedge probe failed: {type(e).__name__}: {e} "
            "-> treating backend as down")
        return False, time.monotonic() - t0


def _cpu_fallback():
    """Guaranteed rung: measure on the host CPU backend so the driver
    always records a real (annotated, degraded) number."""
    log("forward: CPU-backend fallback (degraded measurement, annotated)")
    import jax

    jax.config.update("jax_platforms", "cpu")
    _reset_backend()
    _arm(max(remaining() - 5, 30))
    pps, variables, extras = _forward_once(
        "approx", batch=1, n=CPU_FALLBACK_N, warmup=1, iters=1
    )
    extras["cpu_fallback_config"] = {"batch": 1, "n": CPU_FALLBACK_N}
    return pps, variables, "cpu_fallback", extras


def forward_benchmark():
    """Wedge probe -> at most two TPU attempts (one generously-sized
    deadline, one warm retry) -> guaranteed CPU fallback.

    Invariant: no TPU attempt may eat into the last CPU_RESERVE seconds
    of the budget, so a nonzero value ALWAYS lands (VERDICT r4 item 1)."""
    info = {}
    # 150 s: a healthy relay's first trivial compile usually lands in
    # 20-60 s but was MEASURED at 73.6 s minutes after a wedge cleared
    # and at ~128 s during a slow-but-alive window (r5); the wedge mode
    # hangs indefinitely, so the deadline only bounds wasted budget on a
    # dead backend — generous beats a false "wedged" that discards a
    # live TPU. The relay also flaps on MINUTE scales (r5: wedged at
    # 11:34 two minutes after serving a probe run), so one failed probe
    # gets one shorter retry after a backend reset when the budget still
    # fits probe + attempt + reserve.
    live = False
    probe_budgets = (150.0, 80.0)
    for p_i, p_max in enumerate(probe_budgets):
        probe_deadline = min(p_max, remaining() - CPU_RESERVE - 10)
        if probe_deadline < 15:
            if p_i == 0:
                log("forward: no budget for a TPU probe; "
                    "going straight to CPU")
            break
        live, probe_dt = _wedge_probe(probe_deadline)
        info["tpu_probe_seconds"] = round(
            info.get("tpu_probe_seconds", 0.0) + probe_dt, 1)
        if live:
            break
        _reset_backend()
        # a retry is only worth its cost if a real attempt still fits
        if remaining() - CPU_RESERVE < 60 + 60:
            break
    if not live:
        info["tpu_wedged"] = True
        pps, variables, method, extras = _cpu_fallback()
        extras.update(info)
        return pps, variables, method, extras

    last_err = None
    for attempt in range(2):
        budget_left = remaining() - CPU_RESERVE
        if budget_left < 60:
            log("forward: TPU budget exhausted (CPU reserve untouched)")
            break
        # One deadline sized to the measured relay executable-load p100
        # (~270 s even on persistent-cache HITs; BASELINE.md cold-start
        # table) — short rungs with resets discard load progress.
        deadline = min(budget_left - 10, 330)
        method = "fast" if attempt == 0 or isinstance(
            last_err, BenchTimeout) else "approx"
        try:
            log(f"forward attempt {attempt + 1}: knn_method={method} "
                f"(deadline {deadline:.0f}s, cpu reserve {CPU_RESERVE:.0f}s)")
            _arm(deadline)
            pps, variables, extras = _forward_once(method)
            if hasattr(signal, "SIGALRM"):
                signal.alarm(0)
            extras.update(info)
            return pps, variables, method, extras
        except BenchTimeout as e:
            last_err = e
            log(f"forward attempt {attempt + 1} hit its deadline; resetting "
                "(a warm retry can be served by the persistent cache)")
            _reset_backend()
        except Exception as e:  # noqa: BLE001
            last_err = e
            log(f"forward attempt {attempt + 1} failed: "
                f"{type(e).__name__}: {e}")
            _reset_backend()

    info["tpu_error"] = repr(last_err)
    pps, variables, method, extras = _cpu_fallback()
    extras.update(info)
    return pps, variables, method, extras


def e2e_benchmark(variables, n_points):
    """PLY -> labeled PLY through the real engine path at the canonical
    flags (batch 8, grid 2.0/4.0, min 128 / max 16384)."""
    import pandas as pd

    from pointstowood_tpu.config import ModelConfig, PredictConfig, TilingConfig
    from pointstowood_tpu.data.tiling import preprocess_cloud
    from pointstowood_tpu.io import load_file, save_file
    from pointstowood_tpu.io.loader import canonicalize_columns
    from pointstowood_tpu.parallel.mesh import data_mesh
    from pointstowood_tpu.predict.predicter import semantic_segmentation

    rng = np.random.default_rng(7)
    pts_per_tree = 25_000
    n_trees = max(n_points // pts_per_tree, 1)
    side = max(np.sqrt(n_trees / 0.1), 4.0)  # ~0.1 trees / m^2
    xs, rs = [], []
    for _ in range(n_trees):
        xyz, refl = tree_points(rng, pts_per_tree, height=8.0)
        off = np.array(
            [rng.uniform(0, side), rng.uniform(0, side), 0.0], np.float32
        )
        xs.append(xyz + off)
        rs.append(refl)
    xyz = np.concatenate(xs)
    refl = np.concatenate(rs)
    df = pd.DataFrame(
        {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2], "scalar_Refl": refl}
    )
    log(f"e2e: synthesized {len(df):,}-pt plot ({n_trees} trees)")

    with tempfile.TemporaryDirectory() as td:
        in_ply = os.path.join(td, "plot.ply")
        out_ply = os.path.join(td, "plot_ours.ply")
        save_file(in_ply, df, additional_fields=["scalar_Refl"])

        t0 = time.perf_counter()
        pc, headers = load_file(in_ply, additional_headers=True)
        pc, headers, _ = canonicalize_columns(pc, mode="predict")
        tiling_cfg = TilingConfig()
        tiles = preprocess_cloud(pc, tiling_cfg)
        t1 = time.perf_counter()
        log(f"e2e: preprocess -> {len(tiles)} tiles in {t1 - t0:.1f}s")
        mesh = data_mesh()
        pc = semantic_segmentation(
            pc, tiles, variables, ModelConfig(), PredictConfig(),
            tiling_cfg, mesh=mesh,
        )
        t2 = time.perf_counter()
        log(f"e2e: cold model+fusion in {t2 - t1:.1f}s")
        out_headers = list(dict.fromkeys(headers + ["n_z", "label", "pwood"]))
        save_file(out_ply, pc, additional_fields=out_headers)
        t3 = time.perf_counter()
        # warm passes: identical engine call with every shape already
        # compiled — the steady-state e2e rate a long-running service (or
        # any host with the persistent compile cache) delivers per plot.
        # Best-of-4 with a median (VERDICT r3 item 9): this host's
        # wall-times swing 2-5x run to run (shared-VM noise); best shows
        # the capability, median shows what a user should expect here.
        import contextlib
        import sys as _sys

        warm_times = []
        for w in range(4):
            tw = time.perf_counter()
            # phase timers go to stderr — stdout carries ONLY the JSON line
            with contextlib.redirect_stdout(_sys.stderr):
                pc = semantic_segmentation(
                    pc, tiles, variables, ModelConfig(), PredictConfig(),
                    tiling_cfg, mesh=mesh, verbose=True,
                )
            dt = time.perf_counter() - tw
            warm_times.append(dt)
            log(f"e2e: warm pass {w + 1} in {dt:.1f}s")
            if remaining() < dt + 30:
                break
        warm = min(warm_times)
        warm_median = float(np.median(warm_times))
        t4 = t3 + warm
    return {
        "e2e_warm_passes": len(warm_times),
        "e2e_warm_seconds_median": round(warm_median, 2),
        "e2e_warm_points_per_sec_median": round(len(df) / warm_median, 1),
        "e2e_points": int(len(df)),
        "e2e_tiles": len(tiles),
        "e2e_seconds": round(t3 - t0, 2),
        "e2e_points_per_sec": round(len(df) / (t3 - t0), 1),
        "e2e_warm_seconds": round(t4 - t3, 2),
        "e2e_warm_points_per_sec": round(len(df) / (t4 - t3), 1),
        "e2e_phase_seconds": {
            "preprocess": round(t1 - t0, 2),
            "model_and_fusion": round(t2 - t1, 2),
            "write": round(t3 - t2, 2),
        },
    }


def supervise():
    """Parent-process armor: run the real bench as a CHILD so a native
    abort (observed 2026-08-21: the tunneled backend's client thread
    panicked and abort()ed the process during a CPU-fallback attempt —
    no Python except/finally can survive that) still ends with ONE JSON
    line on stdout. Attempt 1 = normal child; if it dies without a JSON
    line, attempt 2 = BENCH_FORCE_CPU child that switches jax to the
    CPU backend before any device touch, so the remote client is never
    even loaded."""
    import subprocess

    attempts = (
        ({}, max(TIME_BUDGET - CPU_RESERVE - 30, 60)),
        ({"BENCH_FORCE_CPU": "1"}, max(CPU_RESERVE + 20, 90)),
    )
    last = None
    for i, (extra, budget) in enumerate(attempts, 1):
        left = TIME_BUDGET - elapsed() + 30  # small grace beyond budget
        if left < 45 and i > 1:
            break
        env = dict(os.environ)
        env.update(extra)
        env["BENCH_CHILD"] = "1"
        env["BENCH_TIME_BUDGET"] = str(min(budget, max(left - 15, 45)))
        log(f"supervisor: child attempt {i} "
            f"(budget {env['BENCH_TIME_BUDGET']}s{' CPU-only' if extra else ''})")
        rc = "timeout"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, env=env,
                timeout=float(env["BENCH_TIME_BUDGET"]) + 60,
            )
            out = proc.stdout.decode(errors="replace")
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode(errors="replace")
            log(f"supervisor: child attempt {i} timed out")
        for line in reversed(out.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    continue
                if parsed.get("metric"):
                    last = parsed
                    break
        if last is not None:
            if i > 1:
                last["supervisor_retry"] = "cpu_only_child"
            print(json.dumps(last), flush=True)
            return
        log(f"supervisor: child attempt {i} died without a JSON line "
            f"(rc={rc})")
    # both children died JSON-less: emit the never-empty last resort
    print(json.dumps({
        "metric": "inference_points_per_sec",
        "value": 0.0,
        "unit": "points/s",
        "vs_baseline": 0.0,
        "error": "bench children died without emitting JSON "
                 "(native abort in backend client?)",
        "bench_seconds": round(elapsed(), 1),
    }), flush=True)


def main():
    result = {
        "metric": "inference_points_per_sec",
        "value": 0.0,
        "unit": "points/s",
        "vs_baseline": 0.0,
        "baseline": "measured torch-CPU reference forward "
                    "(scripts/measure_torch_reference.py)",
    }
    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _alarm_handler)
        signal.alarm(max(int(TIME_BUDGET), 1))
    if (os.environ.get("BENCH_SIMULATE_ABORT")
            and not os.environ.get("BENCH_FORCE_CPU")):
        # test hook: reproduce the native client abort() (no Python
        # finally runs) so the supervisor's retry path can be exercised
        log("BENCH_SIMULATE_ABORT: aborting like the native client panic")
        os.abort()
    try:
        if os.environ.get("BENCH_FORCE_CPU"):
            # supervisor retry rung: switch backends BEFORE any device
            # touch so the (possibly crashing) remote client is never
            # loaded in this process
            import jax

            jax.config.update("jax_platforms", "cpu")
        from pointstowood_tpu.utils.compile_cache import enable_compile_cache

        cache_dir = enable_compile_cache()  # no-op where disabled
        log(f"compile cache: {cache_dir or 'disabled'}; "
            f"time budget {TIME_BUDGET:.0f}s")

        if os.environ.get("BENCH_FORCE_CPU"):
            pts_per_sec, variables, method, fwd_extras = _cpu_fallback()
            fwd_extras["tpu_skipped"] = "BENCH_FORCE_CPU"
        else:
            pts_per_sec, variables, method, fwd_extras = forward_benchmark()
        _arm(remaining())  # rest of the budget covers the e2e phase
        result.update(
            value=round(pts_per_sec, 1),
            vs_baseline=round(pts_per_sec / MEASURED_TORCH_CPU_PPS, 3),
            vs_estimate_rtx6000=round(pts_per_sec / ESTIMATED_RTX6000_PPS, 3),
            knn_method=method,
            **fwd_extras,
        )

        e2e_points = int(os.environ.get("BENCH_E2E_POINTS", 1_000_000))
        if e2e_points and method == "cpu_fallback":
            result["e2e_skipped"] = "cpu_fallback (no TPU available)"
        if e2e_points and method != "cpu_fallback":
            if remaining() < 120:
                log("e2e: skipped (time budget nearly spent)")
                result["e2e_skipped"] = "time budget"
            else:
                if remaining() < 300 and e2e_points > 250_000:
                    log(f"e2e: downsizing {e2e_points:,} -> 250,000 points "
                        f"({remaining():.0f}s left)")
                    e2e_points = 250_000
                    result["e2e_downsized"] = True
                try:
                    result.update(e2e_benchmark(variables, e2e_points))
                except BenchTimeout:
                    log("e2e: aborted by time budget; forward number kept")
                    result["e2e_skipped"] = "timeout mid-run"
                except Exception as e:  # noqa: BLE001
                    log(f"e2e failed: {type(e).__name__}: {e}")
                    result["e2e_error"] = f"{type(e).__name__}: {e}"
    except BenchTimeout as e:
        log(f"TIMEOUT: {e}")
        result["timeout"] = str(e)
    except Exception as e:  # noqa: BLE001
        log(f"FATAL: {type(e).__name__}: {e}")
        result["error"] = f"{type(e).__name__}: {e}"
    finally:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
        result["bench_seconds"] = round(elapsed(), 1)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_NO_SUPERVISE"):
        main()
    else:
        supervise()
