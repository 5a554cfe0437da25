"""Persistent-compilation-cache contract (round-4, VERDICT ask #1).

The driver-run bench must be able to reload compiled executables written by
an earlier healthy run instead of recompiling (degraded tunnel windows hang
fresh Mosaic compiles — RESULTS.md). These tests pin, on CPU:

1. ``enable_persistent_cache`` populates the cache dir on first compile;
2. a SECOND fresh process gets a persistent-cache HIT for the same call
   pattern (key determinism across processes);
3. every bench.py child prelude/leg enables the cache.

On TPU the same mechanism was measured 2026-08-20: 109 s cold Mosaic
compile of ``ns_joint_cp_scores_fused`` -> ~0 s on hit (three fresh-process
HITs on key ``jit_wrapped-9c38b1a0...``).
"""

import subprocess
import sys


_CHILD = """
import logging, sys
logging.basicConfig(level=logging.WARNING)
logging.getLogger('jax._src.compiler').setLevel(logging.DEBUG)
import jax
jax.config.update('jax_platforms', 'cpu')
from cppre.utils.jax_cache import enable_persistent_cache
enable_persistent_cache({cache_dir!r})
import jax.numpy as jnp
from cppre.ops.pallas import ns_joint_cp_scores_fused
f = jnp.zeros((4, 3, 9, 24, 24), jnp.float32)
s = ns_joint_cp_scores_fused(f, f, 0.01, 0.01, 0.01, 0.001)
print('OK', float(jnp.sum(s)))
"""


def _run(cache_dir):
    code = _CHILD.format(cache_dir=str(cache_dir))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-800:]
    assert "OK" in out.stdout
    return out.stderr


def test_cache_populates_then_hits_across_processes(tmp_path):
    cache_dir = tmp_path / "jc"
    err1 = _run(cache_dir)
    entries = {p.name: p.stat().st_mtime for p in cache_dir.iterdir()}
    assert entries, "first process wrote no cache entries"
    # fresh process, identical call pattern -> persistent cache HIT.
    # Primary assert is OBSERVABLE BEHAVIOUR (ADVICE r04): the second
    # process reuses the dir without adding or rewriting entries — a miss
    # would write a new key (key determinism) or rewrite the existing one.
    err2 = _run(cache_dir)
    entries2 = {p.name: p.stat().st_mtime for p in cache_dir.iterdir()}
    assert entries2 == entries, (
        f"second process changed the cache dir (miss?): "
        f"{set(entries2) ^ set(entries) or 'mtime changed'}")
    # Secondary HEURISTIC only: jax._src.compiler's debug log wording is
    # not a stable API — surface a notice instead of failing on a JAX
    # upgrade that renames the phrase while caching still works.
    if "compilation cache hit" not in err2.lower():
        print("note: 'compilation cache hit' log phrase absent — JAX log "
              "wording changed? behavioural check above still passed")


def test_bench_children_enable_cache():
    """All three bench.py process kinds (probe prelude, pallas leg, jax leg)
    must enable the persistent cache, or a driver run in a degraded window
    recompiles from scratch and times out (BENCH_r03 value:null)."""
    import bench

    assert "enable_persistent_cache" in bench._CHILD_PLATFORM_PRELUDE
    import inspect

    for fn in (bench._pallas_leg, bench._jax_leg_child, bench.bench_jax):
        assert "enable_persistent_cache" in inspect.getsource(fn), fn.__name__
