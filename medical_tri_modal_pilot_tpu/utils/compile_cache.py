"""Persistent XLA compile-cache activation (default ON).

Through the time-shared TPU tunnel, XLA compiles are queue-bound: a
trivial 512x512 matmul jit measured 147-276 s cold while the same
program loads from the persistent cache in 0.4 s (measured 2026-08-21 on
the axon backend). The flagship train step measured ~190-1000 s cold
depending on tunnel load — compile time, not compute, is what starved
the end-to-end bench stage in rounds 2-4.

Crucially, this jax build does NOT honor the ``JAX_COMPILATION_CACHE_DIR``
environment variable (``jax.config.jax_compilation_cache_dir`` stays None
after importing jax with it set); only the ``jax.config.update`` API
takes effect. Hence this helper, called by the CLI drivers (2_train.py,
3_test.py), bench.py, the kernel verifier, and __graft_entry__ — i.e.
after ``import jax`` but before the first compile.

The reference has no analog (torch eager recompiles nothing); this is
TPU-native plumbing. Set ``GRAFT_COMPILE_CACHE=0`` to disable, or
``JAX_COMPILATION_CACHE_DIR=<dir>`` to relocate the cache.
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compile cache via the config API.

    Returns the cache dir in use, or None when disabled. Idempotent and
    safe to call from multiple entry points; caches everything (min
    compile time / entry size thresholds zeroed) because through the
    tunnel even sub-second compiles cost hundreds of ms of queue wait.
    """
    if os.environ.get("GRAFT_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    # CPU runs are excluded: XLA:CPU serializes AOT results pinned to exact
    # machine features and warns "could lead to execution errors such as
    # SIGILL" on reload, and CPU compiles are fast anyway — the queue-bound
    # tunnel is the target. The gate reads jax.config.jax_platforms (the
    # only setting this build honors; the JAX_PLATFORMS env var is ignored,
    # so callers that force CPU do so via jax.config.update BEFORE calling
    # this). Default on this box is 'axon,cpu' — first entry wins.
    plat = getattr(jax.config, "jax_platforms", None) or ""
    if plat.split(",")[0] == "cpu":
        return None

    d = (cache_dir
         or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or "/tmp/graft_jax_cache")
    if not d:
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:   # unknown config name on a future jax: fail open
        return None
    return d
