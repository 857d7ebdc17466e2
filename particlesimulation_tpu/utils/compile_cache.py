"""Persistent XLA compilation cache.

The reference pays zero compile cost (ahead-of-time C++); this framework
pays it per process — and through the remote axon tunnel a flagship
first compile is minutes (PERF.md first-run columns: 95-651 s).
Enabling JAX's persistent compilation cache amortizes that across
processes: identical (program, compile options, backend) re-runs load
the serialized executable from disk instead of recompiling.

Wired into ``Engine`` at construction (any entry point that builds a
step program passes through there). Opt out with ``PSIM_COMPILE_CACHE=0``
or redirect with ``PSIM_COMPILE_CACHE_DIR``.

Facts that shape the defaults (measured on this image, 2026-08-18):

* both backends on this image serialize: CPU (suite programs hit
  across pytest processes) and the remote axon TPU (measured
  2026-08-18: a 1.48 s first-process compile loads in 0.09 s from the
  second process). JAX degrades gracefully on backends that don't —
  they just skip the cache — so enabling is safe everywhere;
* entries are keyed by the full HLO + compile env, so golden-vector
  configs (same shapes step to step) hit, while every (N, ncside,
  kcap, impl) variation compiles once each;
* ``min_compile_time_secs=1`` skips caching trivial programs (the
  hundreds of tiny host-side jits in the test suite would otherwise
  churn the directory).
"""

from __future__ import annotations

import os

_done = False


def enable() -> bool:
    """Idempotently enable the persistent compilation cache.

    Returns True when the cache is (already) enabled, False when opted
    out. Must run before the first compilation it should capture —
    Engine.__init__ is early enough for every framework entry point.
    """
    global _done
    if os.environ.get("PSIM_COMPILE_CACHE", "1") == "0":
        return False
    if _done:
        return True
    import jax

    path = os.environ.get("PSIM_COMPILE_CACHE_DIR")
    if not path:
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"), ".cache"))
        path = os.path.join(base, "particlesimulation_tpu", "xla_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Cache everything that took >= the threshold, including backends
        # that need non-default serialization support probing.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # An older jax without one of the knobs: cache stays off, the
        # framework works exactly as before.
        return False
    _done = True
    return True
