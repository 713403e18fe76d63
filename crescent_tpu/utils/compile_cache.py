"""Scoped opt-out from JAX's persistent compilation cache.

Serializing the 8-virtual-device sharded-prove executable into the
persistent cache reproducibly SEGFAULTS jaxlib (round 4, twice, identical
faulthandler trace ending in ``compilation_cache.put_executable_and_time``
— the zstd/protobuf serialization path; disk, RAM and entry permissions
all healthy).  The multi-chip path only ever runs on the virtual CPU mesh
in this environment (tests + driver dryrun), so skipping persistence for
exactly those first-compiles avoids the crash while keeping the cache for
everything else.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def no_compile_cache():
    """Temporarily disable persistent compile-cache writes/reads."""
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


@contextmanager
def no_cache_writes():
    """Keep cache READS (warm entries still load) but skip WRITES: every
    compile is treated as below the persistence threshold.  This dodges
    the put_executable segfault without paying cold compiles on re-runs."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e18)
        yield
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old)
