"""Measure the MSM chunk/fold rates on TPU (PERF queue #3, round 5).

Questions:
  1. per-chunk affine rate at ck = 2^16 vs 2^17 (is max_chunk=2^17 costing
     us the 297k pts/s the 2^16 standalone bench shows?)
  2. fold-program rate (scan over chunks) vs the sum of standalone chunks
     — dispatch/accumulate overhead of the fold itself.

Run: python profile_fold_r5.py [log_total=19]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from crescent_tpu.core.curves import BN254_G1
from crescent_tpu.ops import limb
from crescent_tpu.ops.limb import U32
from crescent_tpu.ops.msm import MSM
from crescent_tpu.utils.bench_points import cached_points

import random


def t_min(f, reps=3):
    jax.block_until_ready(f(0))
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(1 + i))
        best = min(best, time.time() - t0)
    return best


def main():
    log_total = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    n_total = 1 << log_total
    rng = random.Random(42)
    px, py = cached_points(1 << 16)
    # tile the 2^16 cached table up to n_total (rates don't depend on
    # point values; scalars vary per rep)
    reps_tile = n_total >> 16
    PX = np.tile(np.asarray(px), (reps_tile, 1))
    PY = np.tile(np.asarray(py), (reps_tile, 1))
    dn = jnp.asarray(PX), jnp.asarray(PY)
    valid = jnp.ones(n_total, dtype=U32)
    sc_sets = [
        jnp.asarray(limb.ints_to_limbs(
            [rng.randrange(BN254_G1.n) for _ in range(n_total)]))
        for _ in range(4)
    ]

    for log_ck in (16, 17):
        ck = 1 << log_ck
        os.environ["CRESCENT_MSM_CHUNK"] = str(ck)
        m = MSM(BN254_G1, small_cutoff=0)
        am = m._affine_msm()
        # standalone chunk rate
        dt = t_min(lambda i: am.run(dn[0][:ck], dn[1][:ck], valid[:ck],
                                    sc_sets[i % 4][:ck]))
        print(f"ck=2^{log_ck} standalone: {dt*1e3:.1f} ms = "
              f"{ck/dt/1e3:.1f}k pts/s", flush=True)
        # fold over n_total as ONE program (4 problems sharing the table,
        # mirroring prove's a/b1/h/l fold)
        def fold(i):
            probs = [(dn[0], dn[1], valid, sc_sets[(i + j) % 4])
                     for j in range(4)]
            return m.run_device_fold(probs)[0].x
        dt = t_min(fold)
        tot = 4 * n_total
        print(f"ck=2^{log_ck} fold x4 problems (2^{log_total} each): "
              f"{dt:.2f} s = {tot/dt/1e3:.1f}k pts/s effective", flush=True)


if __name__ == "__main__":
    main()
