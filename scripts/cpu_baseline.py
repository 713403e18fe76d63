"""Pin the single-core / multicore CPU reference baseline on THIS machine.

BASELINE.md's "first action" — running the Rust reference with
`--features print-trace` — is impossible in this image (no cargo, zero
egress).  This script records the closest honest substitute: the native
C++ backend (native/bigcurve.cpp) is an arkworks-equivalent CPU
implementation (4x64-bit Montgomery field ops, signed-digit Pippenger —
the same algorithm as forks/halo2curves/src/msm.rs:336-464 and ark-ec's
VariableBaseMSM), so its measured single-thread rate on this host IS the
"single-core CPU reference" rate the north star is defined against, and
its all-core rate is the multicore bar (msm.rs:432 parallel Pippenger).

Usage:  python scripts/cpu_baseline.py [--quick]

Prints one JSON object with:
  g1_msm_single_core_pts_per_s, g1_msm_multicore_pts_per_s (and thread count),
  g2_msm_single_core_pts_per_s,
  implied_single_core_prove_s:  the rs256@2048 Groth16 prove G1/G2 MSM
      work (7.30M G1 + 1.51M G2 points, PERF.md trace) at those rates —
      a LOWER bound on reference CPU prove wall-clock (ignores witness
      gen, QAP NTTs, and allocator overheads the real prover also pays).
Paste the values into BASELINE.md's measured table.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def measure(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="2^13 instead of 2^16")
    args = ap.parse_args()

    from crescent_tpu.core.curves import BN254_G1 as G1
    from crescent_tpu.core.curves import BN254G2
    from crescent_tpu.core.fields import BN254_FR as R
    from crescent_tpu.native import backend

    assert backend.available(), "native backend required"
    n = 1 << (13 if args.quick else 16)
    rng = random.Random(2024)

    # random affine points via a cheap double/add chain from the generator
    base = G1.generator
    pts, p = [], base
    for _ in range(n):
        pts.append(p)
        p = G1.double(p) if rng.random() < 0.5 else G1.add(p, base)
    scalars = [rng.randrange(1, R) for _ in range(n)]

    out = {}
    nthreads = backend._nthreads()

    os.environ["CRESCENT_NATIVE_THREADS"] = "1"
    t1 = measure(lambda: backend.msm("bn254_g1", scalars, pts))
    out["g1_msm_single_core_pts_per_s"] = round(n / t1)

    os.environ["CRESCENT_NATIVE_THREADS"] = str(nthreads)
    tm = measure(lambda: backend.msm("bn254_g1", scalars, pts))
    out["g1_msm_multicore_pts_per_s"] = round(n / tm)
    out["multicore_threads"] = nthreads

    # G2: same scalar count at 2^12 (G2 ops ~3x G1 cost)
    n2 = min(n, 1 << 12)
    g2base = BN254G2.generator()
    g2pts, q = [], g2base
    for _ in range(n2):
        g2pts.append(q)
        q = BN254G2.add(q, g2base)
    os.environ["CRESCENT_NATIVE_THREADS"] = "1"
    t2 = measure(lambda: backend.msm_g2(scalars[:n2], g2pts), reps=1)
    out["g2_msm_single_core_pts_per_s"] = round(n2 / t2)
    os.environ["CRESCENT_NATIVE_THREADS"] = str(nthreads)

    # rs256@2048 prove MSM work from the PERF.md trace: A/B1/C + h(x)
    # G1 MSMs total 7.30M points, one G2 MSM of 1.51M points.
    g1_pts, g2_pts = 7.30e6, 1.51e6
    out["implied_single_core_prove_s"] = round(
        g1_pts / out["g1_msm_single_core_pts_per_s"]
        + g2_pts / out["g2_msm_single_core_pts_per_s"], 1)
    out["implied_multicore_msm_s"] = round(
        g1_pts / out["g1_msm_multicore_pts_per_s"]
        + g2_pts / (out["g2_msm_single_core_pts_per_s"] * nthreads * 0.8), 1)
    out["n"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
