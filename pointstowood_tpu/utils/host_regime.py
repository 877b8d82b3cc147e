"""Host-capability autodetect: relay vs local-PJRT device attachment.

The padding/bucket trade-off flips with the per-executable-switch
dispatch cost (BASELINE.md round-4 measurements): through a tunneled
remote relay a switch costs ~30 ms, which cancels the ~325 ms of device
time that finer eval buckets + a third fusion cap recover on a 1M-pt
plot; on a standard local-PJRT host the switch is ~free and the fine
bucket config wins outright. Rather than a config flag nobody sets,
measure the link: a tiny ``device_put`` + host readback round-trip (NO
compile — raw transfers never lower an executable) separates the two
regimes by ~2 orders of magnitude (scalar readback RTT ~29 ms measured
through this environment's relay vs <1 ms local).

Consumers (both honor their own explicit env overrides first):
  * ``data.dataset.eval_half_caps_default`` — half-step eval capacity
    buckets on 'local' (padding 30.4% -> ~24%), pow2 on 'relay';
  * ``predict.tpu_fusion.fusion_caps`` — a third pair-kernel cap (8192)
    on 'local', the measured-best two-cap set on 'relay'.
"""

from __future__ import annotations

import os
import time

_REGIME: str | None = None


def host_regime() -> str:
    """'relay' (coarse shape sets: pow2 eval caps, two fusion caps) or
    'local' (fine: half-step eval caps, three fusion caps). Memoized per
    process; ``TSP_HOST_REGIME=relay|local`` overrides the measurement
    (anything else raises — a typo silently selecting a regime would
    change every predict shape)."""
    global _REGIME
    if _REGIME is None:
        _REGIME = _detect()
    return _REGIME


def _detect() -> str:
    raw = os.environ.get("TSP_HOST_REGIME", "").strip().lower()
    if raw in ("relay", "local"):
        return raw
    if raw:
        raise ValueError(
            f"TSP_HOST_REGIME must be 'relay' or 'local', got {raw!r}")
    try:
        import jax
        import numpy as np

        dev = jax.devices()[0]
        if dev.platform == "cpu":
            # simulated / test backend: keep the deterministic coarse
            # defaults (the CPU suite and the driver dryrun pin shapes —
            # and compile count — on them)
            return "relay"
        x = np.zeros(8, np.float32)
        np.asarray(jax.device_put(x, dev))  # client/connection warm-up
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_put(x, dev))
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[1]
        return "relay" if rtt > 5e-3 else "local"
    except Exception:  # noqa: BLE001 - no devices yet / backend down
        return "relay"  # conservative: coarse shapes always work
