"""Persistent XLA compilation cache (repo-local, warmed by every run).

Why this exists: the remote "axon" TPU tunnel has degraded windows that
serve already-compiled dispatches but hang *fresh* Mosaic compiles for
minutes-to-hours (RESULTS.md "degraded-tunnel bench semantics").  The
Pallas leg of ``bench.py`` costs a ~100 s remote Mosaic compile from
scratch; with this cache enabled the compiled executable is serialized to
``<repo>/.jax_cache`` on the first healthy run and every later process —
including a driver-invoked ``bench.py`` landing in a degraded window —
reloads it instead of recompiling (measured 2026-08-20: 109 s cold
compile -> ~0 s on hit; the cache key is deterministic across processes
for an identical call pattern, verified by three fresh-process HITs on
``ns_joint_cp_scores_fused``).

Call :func:`enable_persistent_cache` BEFORE the first compilation (it is
safe after ``import jax`` — these are config updates, not env vars, which
this environment's ``sitecustomize`` makes too late anyway, CLAUDE.md).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache", "default_cache_dir"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_cache_dir() -> str:
    """Repo-local cache dir so warmed entries survive across rounds and are
    visible to driver-spawned processes running from the same checkout."""
    return os.environ.get("CPPRE_JAX_CACHE_DIR",
                          os.path.join(_REPO_ROOT, ".jax_cache"))


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at the persistent compilation cache and make every entry
    eligible (default thresholds skip small/fast compiles — but in degraded
    tunnel windows even trivial remote compiles can hang, so cache all).

    Idempotent; returns the cache dir in use.
    """
    import jax

    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
