"""Persistent XLA compilation cache for the CLIs.

Cold-start plot inference is compile-dominated (each padded tile shape
compiles once: ~2-3 shapes after sparse-bucket merging, 20-60 s each on a
relay-compiled host, a few seconds locally). The reference pays the
equivalent cost in CUDA kernel JIT + torch extension loads on every
process start; on TPU the XLA compilation cache makes every shape a
one-time cost per machine instead of per run.

Enabled by both CLIs. Opt out with POINTSTOWOOD_NO_COMPILE_CACHE=1 or
redirect with JAX_COMPILATION_CACHE_DIR (the standard JAX variable, which
always wins if set).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the directory in use, or None when disabled. Safe to call
    before or after importing jax, as long as nothing compiled yet.
    """
    if os.environ.get("POINTSTOWOOD_NO_COMPILE_CACHE"):
        return None
    import jax

    target = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or cache_dir
        or os.path.join(
            os.path.expanduser("~"), ".cache", "pointstowood_tpu", "xla"
        )
    )
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # cache everything that took meaningful compile time; the default
        # threshold (1 s) already skips trivial reductions
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        # never let cache plumbing break an inference run (read-only home,
        # old jax flag names, ...)
        return None
    return target
