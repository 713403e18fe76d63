"""Round-4 MSM profiling on TPU: block-gather effect + inv_floor sweep.

python profile_msm_r4.py [gather] [msm] [invfloor]
"""
import sys, time, random
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from crescent_tpu.core.curves import BN254_G1
from crescent_tpu.ops import limb
from crescent_tpu.ops.ec import get_curve_ctx
from crescent_tpu.ops.msm_affine import AffineMSM
from crescent_tpu.ops.pallas_ec import PallasEC
from crescent_tpu.utils.bench_points import cached_points

def log(*a): print(*a, flush=True)

def run_msm(inv_floor, c, px, py, valid, sc, reps=3):
    ctx = get_curve_ctx(BN254_G1)
    pec = PallasEC(BN254_G1.p, BN254_G1.a)
    am = AffineMSM(ctx, pec, c=c, inv_floor=inv_floor)
    t0 = time.time()
    r = am.run(px, py, valid, sc)
    jax.block_until_ready((r.x, r.y, r.z))
    log(f"  [c={c} inv_floor={inv_floor}] compile+run {time.time()-t0:.1f}s")
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = am.run(px, py, valid, sc)
        jax.block_until_ready((r.x, r.y, r.z))
        best = min(best, time.perf_counter() - t0)
    n = px.shape[0]
    log(f"  [c={c} inv_floor={inv_floor}] best {best*1e3:.1f} ms = {n/best/1e3:.0f}k pts/s")
    return r

def main():
    which = sys.argv[1:] or ["msm"]
    n = 1 << 16
    px, py = cached_points(n)
    px, py = jnp.asarray(px), jnp.asarray(py)
    rng = random.Random(7)
    valid = jnp.ones(n, dtype=jnp.uint32)
    sc = jnp.asarray(limb.ints_to_limbs([rng.randrange(BN254_G1.n) for _ in range(n)]))
    log("points ready")
    if "gather" in which:
        import profile_gather
        profile_gather.main()
    if "msm" in which:
        r1 = run_msm(512, 11, px, py, valid, sc)
    if "invfloor" in which:
        for fl in (4096, 1024):
            run_msm(fl, 11, px, py, valid, sc)
    if "c" in which:
        for c in (12, 13):
            run_msm(512, c, px, py, valid, sc)
    if "g2" in which:
        import numpy as _np
        from crescent_tpu.core.curves import BN254G2
        from crescent_tpu.ops.ec import get_g2_ctx
        from crescent_tpu.ops.msm import get_g2_msm

        n2 = 1 << 12
        rng2 = random.Random(9)
        m2 = get_g2_msm()
        base = BN254G2.generator()
        pts = [BN254G2.mul(rng2.randrange(1, 1 << 20), base) for _ in range(n2)]
        P = m2.ctx.points_to_device(pts)
        valid2 = jnp.ones(n2, dtype=jnp.uint32)
        ks = [rng2.randrange(BN254G2.n) for _ in range(n2)]
        sc2 = jnp.asarray(limb.ints_to_limbs(ks))
        t0 = time.time()
        r = m2.run_device(P.x, P.y, valid2, sc2)
        jax.block_until_ready((r.x, r.y, r.z))
        log(f"  [g2 2^12] compile+run {time.time()-t0:.1f}s")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = m2.run_device(P.x, P.y, valid2, sc2)
            jax.block_until_ready((r.x, r.y, r.z))
            best = min(best, time.perf_counter() - t0)
        log(f"  [g2 2^12] best {best*1e3:.1f} ms = {n2/best/1e3:.1f}k pts/s")
        got = m2.ctx.points_to_host(
            type(r)(r.x[None], r.y[None], r.z[None])
        )[0]
        ng = 256
        want = BN254G2.msm(ks[:ng], pts[:ng])
        got_sub = m2.run_device(P.x[:ng], P.y[:ng], valid2[:ng], sc2[:ng])
        gs = m2.ctx.points_to_host(
            type(r)(got_sub.x[None], got_sub.y[None], got_sub.z[None])
        )[0]
        log("  [g2] oracle(256) ok:", gs == want)

if __name__ == "__main__":
    main()
