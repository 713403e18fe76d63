"""Persistent-compile-cache policy: multi-device executables never touch it.

Serializing the 8-virtual-device sharded executables into the persistent
cache reproducibly SEGFAULTS jaxlib (round 4, twice, identical faulthandler
trace ending in ``compilation_cache.put_executable_and_time`` — the
zstd/protobuf serialization path), and round 4's full-suite run crashed the
same way in the *read* path (``get_executable_and_time``) while
deserializing such an entry in a long-lived high-RSS process.

Round 4 tried a config-flip context manager (set
``jax_compilation_cache_dir=None`` around the sharded compiles).  That is
**ineffective mid-process on jax 0.9.0**: ``compilation_cache.is_cache_used``
latches ``_cache_used`` at its first call and ``_get_cache`` returns the
already-initialized singleton, so once any earlier compile used the cache
(guaranteed — ``crescent_tpu/__init__.py`` enables it at import) the config
change stops neither reads nor writes (ADVICE r4, high).

The real fix, installed at package import by
:func:`install_multidevice_cache_bypass`, is a process-wide wrapper around
``jax._src.compiler.compile_or_get_cached`` that routes any computation
placed on more than one device straight to ``backend_compile_and_load`` —
no cache key, no read, no write.  Single-device programs (the expensive
limb kernels the cache exists for) are unaffected.  This covers every
multi-device compile site (groth16 sharded prove, tests/test_parallel,
the driver dryrun) without per-call-site guards that can latch stale.

:func:`no_compile_cache` remains for belt-and-braces scoping and is now
actually effective: it resets the cache singleton (``reset_cache``) after
flipping the config, and again on exit, so the latch cannot survive.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

# Set by install_multidevice_cache_bypass(); tests assert on it.
MULTIDEVICE_BYPASS_INSTALLED = False


def install_multidevice_cache_bypass() -> bool:
    """Patch jax so multi-device compiles bypass the persistent cache.

    Idempotent; returns True if the bypass is (already) live.  Wraps
    ``jax._src.compiler.compile_or_get_cached`` (called via module
    attribute from pxla, so patching the attribute is sufficient on
    jax 0.9.0).  Falls back to leaving jax untouched if internals moved.
    """
    global MULTIDEVICE_BYPASS_INSTALLED
    if MULTIDEVICE_BYPASS_INSTALLED:
        return True
    try:
        from jax._src import compiler as _compiler

        _orig = _compiler.compile_or_get_cached
        _direct = _compiler.backend_compile_and_load

        def compile_or_get_cached(
            backend,
            computation,
            devices,
            compile_options,
            host_callbacks,
            executable_devices,
            pgle_profiler=None,
        ):
            try:
                multi = getattr(devices, "size", 1) > 1
            except Exception:
                multi = False
            if multi:
                return _direct(
                    backend,
                    computation,
                    executable_devices,
                    compile_options,
                    host_callbacks,
                )
            return _orig(
                backend,
                computation,
                devices,
                compile_options,
                host_callbacks,
                executable_devices,
                pgle_profiler,
            )

        compile_or_get_cached._crescent_multidevice_bypass = True  # type: ignore[attr-defined]
        _compiler.compile_or_get_cached = compile_or_get_cached
        MULTIDEVICE_BYPASS_INSTALLED = True
    except Exception:
        MULTIDEVICE_BYPASS_INSTALLED = False
    return MULTIDEVICE_BYPASS_INSTALLED


def _reset_singleton() -> None:
    """Drop jax's latched cache singleton so config changes take effect."""
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass


@contextmanager
def no_compile_cache():
    """Fully disable the persistent compile cache (reads AND writes) in scope.

    Unlike the round-4 version, this resets jax's cache singleton after each
    config flip — ``is_cache_used`` latches its answer and ``_get_cache``
    keeps returning the initialized cache otherwise, making a bare config
    update a no-op mid-process."""
    old_dir = jax.config.jax_compilation_cache_dir
    old_en = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_enable_compilation_cache", False)
        _reset_singleton()
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_enable_compilation_cache", old_en)
        _reset_singleton()


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
