"""Multi-host (DCN) scale-out: jax.distributed process bootstrap.

BASELINE.md's scaling axis is "1 chip / 1 host / N>=2 hosts".  On real pods
each host drives its local chips and XLA routes collectives over ICI within
a slice and DCN across hosts; in JAX the SAME `shard_map` + mesh code runs
unchanged — only the bootstrap differs (`jax.distributed.initialize`).  The
sharded MSM/NTT in this package therefore scale out by building the mesh
over `jax.devices()` (global across processes) instead of local devices.

`scripts/multihost_smoke.py` exercises this with N processes on one machine
(CPU backend, gRPC-backed collectives standing in for DCN): every process
runs the point-sharded MSM over the global mesh and process 0 checks the
result against the host oracle.
"""

from __future__ import annotations

import os

import jax


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Initialize this process's slot in a multi-host run.

    Args default from the CRESCENT_COORD / CRESCENT_NPROCS / CRESCENT_PROC
    environment (set by scripts/multihost_smoke.py or a pod launcher).  On
    TPU pods with the standard runtime env, call with no args —
    jax.distributed.initialize autodetects.
    """
    coordinator = coordinator or os.environ.get("CRESCENT_COORD")
    num_processes = num_processes or int(os.environ.get("CRESCENT_NPROCS", "0")) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["CRESCENT_PROC"]) if "CRESCENT_PROC" in os.environ else None)
    )
    if local_device_count:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}"
        )
        jax.config.update("jax_platforms", "cpu")
        import crescent_tpu

        crescent_tpu.use_cpu_cache_dir()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "points"):
    """1-D mesh over ALL devices of ALL processes (DCN-spanning)."""
    import numpy as np

    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
