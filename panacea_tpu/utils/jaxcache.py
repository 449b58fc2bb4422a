"""Persistent XLA compilation cache for the CLI drivers.

Every driver (train.py, inference.py, train_perception.py,
eval_perception.py) jits a handful of large programs; on CPU smoke runs the
compiles dominate wall-clock (minutes each), and through the axon TPU tunnel
a remote compile costs 3-9 min (CLAUDE.md). The test suite already reuses
``.jax_cache/`` (tests/conftest.py:29-32) — this routes the drivers through
the same cache so repeated invocations (e.g. the protocol-rehearsal
pipeline's eight subprocesses, or bench re-runs) skip identical compiles.

Opt out with PANACEA_NO_JAX_CACHE=1 (e.g. when benchmarking compile time
itself).
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> None:
    """Point jax at the repo-level ``.jax_cache/`` (shared with the test
    suite and bench.py). Safe to call before or after backend init — the
    cache config is read per-compile."""
    if os.environ.get("PANACEA_NO_JAX_CACHE"):
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PANACEA_JAX_CACHE", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
