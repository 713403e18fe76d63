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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
