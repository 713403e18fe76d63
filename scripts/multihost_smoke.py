#!/usr/bin/env python
"""Multi-host DCN smoke: N processes x D local CPU devices, one global mesh.

Launch (driver mode, default): spawns N worker copies of itself, waits,
checks all exit green.  Each worker initializes jax.distributed against the
shared coordinator, builds the global 1-D mesh, and runs the point-sharded
MSM with cross-process collectives (gRPC standing in for DCN).  Process 0
verifies against the host oracle.

    python scripts/multihost_smoke.py [nprocs] [local_devices]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker():
    from crescent_tpu.parallel.multihost import init_distributed, global_mesh

    nd = int(os.environ["CRESCENT_LOCAL_DEVS"])
    init_distributed(local_device_count=nd)
    import jax

    proc = jax.process_index()
    print(f"[proc {proc}] devices: local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    import random

    from crescent_tpu.core.curves import BN254_G1
    from crescent_tpu.parallel.sharded_msm import ShardedMSM

    rng = random.Random(11)
    mesh = global_mesh()
    n = 4 * jax.device_count()
    pts = [BN254_G1.mul(rng.randrange(1, BN254_G1.n), BN254_G1.generator)
           for _ in range(n)]
    ks = [rng.randrange(BN254_G1.n) for _ in range(n)]
    # c=4: the XLA:CPU backend executes the limb graphs near-serially, so
    # the small bucket plane keeps the smoke fast (same collectives either way)
    msm = ShardedMSM(BN254_G1, mesh, c=4, lanes=2)
    t0 = time.time()
    got = msm.run_host(ks, pts)
    dt = time.time() - t0
    if proc == 0:
        want = BN254_G1.msm(ks, pts)
        assert got == want, "multi-host sharded MSM mismatch"
        print(f"[proc 0] multihost MSM OK over {jax.device_count()} devices "
              f"/ {jax.process_count()} processes in {dt:.1f}s", flush=True)


def main():
    if os.environ.get("CRESCENT_MH_WORKER") == "1":
        worker()
        return
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    local = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    env = dict(os.environ)
    env.update(
        CRESCENT_MH_WORKER="1",
        CRESCENT_COORD="127.0.0.1:12355",
        CRESCENT_NPROCS=str(nprocs),
        CRESCENT_LOCAL_DEVS=str(local),
    )
    procs = []
    for p in range(nprocs):
        e = dict(env, CRESCENT_PROC=str(p))
        procs.append(subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=e))
    rc = [p.wait() for p in procs]
    assert all(r == 0 for r in rc), f"worker exit codes: {rc}"
    print(f"multihost smoke green: {nprocs} processes x {local} devices")


if __name__ == "__main__":
    main()
