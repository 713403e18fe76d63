"""Test configuration: run all JAX work on a virtual 8-device CPU mesh.

Real-TPU runs happen via bench.py / __graft_entry__.py; tests must be
deterministic and exercise the multi-chip sharding paths without hardware
(SURVEY.md §4: "multi-chip tests ... fake an 8-device mesh").

Note: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) at the
process level, so the env var alone is not enough — jax.config.update is
authoritative and must run before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# No persistent compile cache in the suite: jaxlib's zstd executable
# (de)serialization has segfaulted three long-lived suite runs (round 4
# multi-device write+read — bypassed since — and a round-5 single-device
# NTT compile in the same 8-virtual-device process).  XLA:CPU's big
# executables never persisted anyway, so this costs in-process compiles
# only across *runs*, not within one (crescent_tpu/__init__.py gate).
os.environ.setdefault("CRESCENT_TPU_JAX_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
