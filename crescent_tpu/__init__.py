"""crescent-tpu: TPU-native zero-knowledge credential framework.

Capabilities of microsoft/crescent-credentials (JWT/mDL proofs of possession
with selective disclosure, range proofs, device binding, unlinkable
re-showing), rebuilt idiomatically for TPUs: JAX/XLA/Pallas limb-kernels for
all prover-side field/curve/NTT/MSM work, host-exact Python for pairings and
protocol glue.  See SURVEY.md for the reference layer map this tracks.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: our integer limb graphs are expensive for XLA
# to compile (hundreds of fused loops), and shapes repeat across runs.
#
# For CPU-backend runs (tests, the multi-chip dryrun) the directory is
# suffixed with a fingerprint of the host CPU: XLA:CPU stores ahead-of-time
# compiled machine code in the cache, and loading an entry compiled on a CPU
# with different ISA features aborts or SIGILLs (observed as a wedged
# multi-chip dryrun when the cache moved between machines, MULTICHIP_r02).
# TPU executables are host-portable, so TPU runs share one directory and
# stay warm across machines.


def _machine_tag() -> str:
    import hashlib
    import platform

    h = hashlib.sha1(platform.machine().encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            seen = set()
            for line in f:
                key = line.split(b":", 1)[0].strip()
                if key in (b"model name", b"flags") and key not in seen:
                    seen.add(key)
                    h.update(line)
                if len(seen) == 2:
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


# CPU-backend callers (tests/conftest.py, __graft_entry__.dryrun_multichip,
# the multihost smoke) set jax_platforms="cpu" in code BEFORE importing this
# package (the axon TPU platform pin ignores the env var, so they have to).
_platforms = str(
    getattr(_jax.config, "jax_platforms", None)
    or _os.environ.get("JAX_PLATFORMS", "")
)
# first entry = preferred backend ("axon,cpu" is the TPU tunnel default)
_suffix = (
    "-" + _machine_tag()
    if _platforms.split(",", 1)[0].strip() == "cpu"
    else ""
)
_cache_dir = _os.environ.get(
    "CRESCENT_TPU_JAX_CACHE",
    _os.path.expanduser("~/.cache/crescent_tpu_jax" + _suffix),
)
# CRESCENT_TPU_JAX_CACHE=0|off|none disables the persistent cache entirely.
# The CI suite runs with it off: jaxlib's zstd (de)serialization path has
# segfaulted three separate long-lived runs (round 4 write+read paths on
# multi-device entries — bypassed since — and a round-5 crash inside a
# single-device NTT compile in the same 8-virtual-device process), and on
# XLA:CPU the big executables never persist anyway, so the suite pays the
# in-process compile either way.  TPU bench/CLI processes keep it on.
if _cache_dir.lower() in ("0", "off", "none", ""):
    _cache_dir = None
try:
    if _cache_dir is not None:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # cache is best-effort; never block math on it
    pass

# Multi-device executables must NEVER touch the persistent cache: jaxlib
# reproducibly segfaults both serializing and deserializing them (see
# utils/compile_cache.py for the full history).  Installed process-wide
# here, before any compile can happen.
from .utils.compile_cache import install_multidevice_cache_bypass as _imcb

_imcb()


def use_cpu_cache_dir() -> None:
    """Switch the persistent compile cache to the machine-tagged CPU dir.

    For callers that flip jax_platforms to "cpu" AFTER importing this
    package (e.g. parallel.multihost.init_distributed): the shared TPU dir
    must not accumulate XLA:CPU AOT code, which is host-ISA-specific."""
    if "CRESCENT_TPU_JAX_CACHE" in _os.environ:
        return
    d = _os.path.expanduser("~/.cache/crescent_tpu_jax-" + _machine_tag())
    try:
        _os.makedirs(d, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", d)
    except Exception:
        pass

__version__ = "0.1.0"
