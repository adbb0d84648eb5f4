"""Runtime helpers: persistent compilation cache, timing, profiling.

First TPU compilation of the vmapped clustering loops runs through a remote
compile service in this environment and can take minutes; the persistent
compilation cache amortizes that across processes (the reference has no
equivalent concern — eager CUDA — but its ``.pt`` stage caches play the same
role for data).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


def apply_platform_override() -> None:
    """Honor ``SCD_PLATFORM`` (e.g. ``cpu``) even when a PJRT plugin pinned
    the platform at interpreter start — ``jax.config.update`` wins as long
    as the backend has not initialized yet.  CLIs call this first so smoke
    runs can stay off the TPU tunnel."""
    p = os.environ.get("SCD_PLATFORM")
    if p:
        try:
            jax.config.update("jax_platforms", p)
        except Exception:
            pass


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "SCD_COMPILE_CACHE", os.path.expanduser("~/.cache/scd_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless


@contextlib.contextmanager
def block_timed(label: str, results: Optional[dict] = None) -> Iterator[None]:
    """Wall-time a pipeline stage with a device completion barrier.

    ``jax.effects_barrier`` only waits on effect tokens, not pure jitted
    work; instead enqueue a trivial computation (ordered after everything
    already dispatched to the device stream) and block on its result."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    yield
    # a HOST FETCH, not block_until_ready: the tunneled backend resolves
    # buffer futures optimistically, so block_until_ready on an un-fetched
    # output can return early (CLAUDE.md rule 4 / bench.py protocol)
    float(jnp.zeros(()) + 0.0)
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    print(f"[timing] {label}: {dt:.3f}s")


@contextlib.contextmanager
def profile_trace(out_dir: str) -> Iterator[None]:
    """jax.profiler trace around a stage (SURVEY §5 tracing gap).

    No-op on tunneled backends (the remote 'axon' transport hangs in
    ``stop_trace`` waiting for device trace data); real TPU/CPU backends
    trace normally.  Force with SCD_FORCE_PROFILE=1.

    Detection note: on the tunnel ``jax.default_backend()`` reports
    ``"tpu"`` (the plugin canonicalizes), so the backend NAME cannot
    identify it — the registry key ('axon' in ``xla_bridge.backends()``)
    can.
    """
    def _tunneled() -> bool:
        try:
            from jax._src import xla_bridge

            return "axon" in xla_bridge.backends()
        except Exception:
            return False

    if _tunneled() and not os.environ.get("SCD_FORCE_PROFILE"):
        print("[profile] tracing skipped on the tunneled 'axon' backend "
              "(set SCD_FORCE_PROFILE=1 to force)")
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
