"""Benchmark suite — TPU-side mirrors of the reference's criterion benches.

Reference: creds/benches/ecc_bench.rs (G1/G2 scalar-mul + MSM),
creds/benches/range_bench.rs (32-bit range prove/verify),
creds/benches/proof_benchmark.rs (show/verify on a 2^10 dummy circuit),
plus the BASELINE.md north-star metrics (MSM points/s/chip, NTT
butterflies/s/chip, Groth16 prove wall-clock).

Each bench returns a dict {metric, value, unit, ...}; `run_suite` collects
the requested subset and writes BENCH_SUITE.json.  bench.py keeps the
single-line headline contract for the driver; this module is the wide net.
"""

from __future__ import annotations

import json
import random
import time


def _t(f, reps: int = 3):
    """min wall-clock of reps calls (first call untimed warmup/compile).

    `f` takes a rep index in 0..reps (inclusive: index 0 is the warmup) and
    must vary its device inputs with it: the device tunnel memoizes
    executions of identical (executable, argument buffers), so timing
    repeated calls on the same arrays measures nothing (~1 ms returns).
    Callers that stage input sets must therefore provide reps+1 of them."""
    import jax

    jax.block_until_ready(f(0))
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(1 + i))
        best = min(best, time.time() - t0)
    return best


def _t_host(f, reps: int = 3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


def bench_msm_g1(log_n: int = 16) -> dict:
    """Headline: BN254 G1 Pippenger MSM points/s (vs ~2.0e5 single-core CPU
    arkworks estimate — BASELINE.md)."""
    import jax.numpy as jnp

    from .core.curves import BN254_G1
    from .ops import limb
    from .ops.msm import MSM
    from .ops.limb import U32
    from .utils.bench_points import cached_points

    n = 1 << log_n
    rng = random.Random(42)
    px, py = cached_points(n)
    m = MSM(BN254_G1, small_cutoff=0)
    px, py = jnp.asarray(px), jnp.asarray(py)
    valid = jnp.ones(n, dtype=U32)
    scs = [
        jnp.asarray(limb.ints_to_limbs([rng.randrange(BN254_G1.n) for _ in range(n)]))
        for _ in range(4)
    ]
    dt = _t(lambda i: m.run_device(px, py, valid, scs[i]))
    return {
        "metric": "bn254_g1_msm_points_per_sec",
        "value": round(n / dt, 1),
        "unit": "points/s",
        "n": n,
        "baseline": 2.0e5,
    }


def bench_msm_g2(log_n: int = 12) -> dict:
    """BN254 G2 MSM (ecc_bench.rs msm benches run G2 too)."""
    import jax.numpy as jnp
    import numpy as np

    from .core.curves import BN254G2
    from .ops import limb
    from .ops.ec import get_g2_ctx
    from .ops.msm import MSM
    from .ops.limb import U32

    n = 1 << log_n
    rng = random.Random(43)
    # small_cutoff=0 so the oracle-gate subset below exercises the SAME
    # path being timed (the QuadPallasEC AffineMSM route), not the
    # double-and-add small path (ADVICE r4: ng=128 < default cutoff 1024).
    m = MSM(get_g2_ctx(), lanes=64, small_cutoff=0)
    base = BN254G2.generator()
    pts = [BN254G2.mul(rng.randrange(1, 1 << 20), base) for _ in range(n)]
    P = m.ctx.points_to_device(pts)
    valid = jnp.ones(n, dtype=U32)
    scs = [
        jnp.asarray(limb.ints_to_limbs([rng.randrange(BN254G2.n) for _ in range(n)]))
        for _ in range(4)
    ]
    dt = _t(lambda i: m.run_device(P.x, P.y, valid, scs[i]))
    # oracle gate: the device G2 path (QuadPallasEC AffineMSM on TPU, scan
    # elsewhere) must match the host Pippenger on a subset
    ng = 128
    sub = m.run_device(P.x[:ng], P.y[:ng], valid[:ng], scs[0][:ng])
    got = m.ctx.points_to_host(
        type(sub)(sub.x[None], sub.y[None], sub.z[None])
    )[0]
    ks = limb.limbs_to_ints(np.asarray(scs[0][:ng]))
    want = BN254G2.msm(ks, pts[:ng])
    ok = got == want
    if not ok:
        raise AssertionError(
            f"G2 MSM oracle mismatch on the device affine path: {got} != {want}"
        )
    return {
        "metric": "bn254_g2_msm_points_per_sec",
        "value": round(n / dt, 1),
        "unit": "points/s",
        "n": n,
        "oracle_ok": bool(ok),
    }


def bench_ntt(log_n: int = 20) -> dict:
    """BN254 Fr radix-2 NTT butterflies/s (BASELINE.md north star)."""
    import jax.numpy as jnp

    from .core.fields import BN254_FR
    from .ops import ntt
    from .ops.limb import get_ctx

    n = 1 << log_n
    dom = ntt.get_domain(BN254_FR, n)
    fctx = get_ctx(BN254_FR)
    rng = random.Random(44)
    xs = [
        jnp.asarray(fctx.to_mont_host([rng.randrange(BN254_FR) for _ in range(n)]))
        for _ in range(4)
    ]
    dt = _t(lambda i: dom.ntt(xs[i]))
    butterflies = (n // 2) * log_n
    return {
        "metric": "bn254_fr_ntt_butterflies_per_sec",
        "value": round(butterflies / dt, 1),
        "unit": "butterflies/s",
        "n": n,
        "ntt_seconds": round(dt, 4),
    }


def bench_scalar_mul() -> dict:
    """Single G1/G2 scalar-mul latency (ecc_bench.rs scalar_mul)."""
    from .core.curves import BN254G2, BN254_G1

    rng = random.Random(45)
    g = BN254_G1.generator
    g2 = BN254G2.generator()
    k = rng.randrange(BN254_G1.n)
    dt1 = _t_host(lambda: BN254_G1.mul(k, g), reps=5)
    dt2 = _t_host(lambda: BN254G2.mul(k, g2), reps=5)
    return {
        "metric": "scalar_mul_host_ms",
        "value": {"g1": round(dt1 * 1e3, 2), "g2": round(dt2 * 1e3, 2)},
        "unit": "ms",
    }


def bench_range(n_bits: int = 32) -> dict:
    """32-bit KZG range proof prove/verify (range_bench.rs)."""
    from .credentials import dlog, rangeproof as rp
    from .credentials.dlog import pedersen_commit
    from .utils.hash_to_curve import derive_pedersen_bases

    rng = random.Random(46)
    pk, vk = rp.setup(n_bits, rng)
    bases = derive_pedersen_bases()
    ped = pedersen_commit(rng.randrange(1 << n_bits), bases, rng=rng)
    dt_p = _t_host(lambda: rp.prove_n_bits(ped, n_bits, pk.powers, rng=rng), reps=3)
    proof = rp.prove_n_bits(ped, n_bits, pk.powers, rng=rng)
    dt_v = _t_host(
        lambda: rp.verify_n_bits(proof, ped.c, bases, n_bits, vk, rng=rng), reps=3
    )
    return {
        "metric": "range_prove_verify_seconds",
        "value": {"prove": round(dt_p, 4), "verify": round(dt_v, 4)},
        "unit": "s",
        "n_bits": n_bits,
    }


def bench_show_verify(log_size: int = 10) -> dict:
    """Groth16 show/verify on a 2^10 dummy circuit (proof_benchmark.rs)."""
    from .credentials.groth16rand import ClientState
    from .credentials.structs import PublicIOType
    from .models import groth16

    rng = random.Random(47)
    r1cs, z = groth16.dummy_circuit(log_size, rng, num_public=2)
    pk = groth16.setup(r1cs, rng)
    proof = groth16.prove(pk, r1cs, z, rng)
    pub = z[1 : r1cs.num_instance]
    pvk = pk.vk.prepare()
    io_types = [PublicIOType.REVEALED, PublicIOType.HIDDEN]
    cs = ClientState(
        inputs=pub, aux=None, proof=proof, vk=pk.vk, pvk=pvk, config_str="{}"
    )
    dt_show = _t_host(lambda: cs.show_groth16(b"bench", io_types, rng=rng), reps=3)
    show = cs.show_groth16(b"bench", io_types, rng=rng)
    dt_ver = _t_host(
        lambda: show.verify(pk.vk, pvk, b"bench", io_types, [pub[0]]), reps=3
    )
    assert show.verify(pk.vk, pvk, b"bench", io_types, [pub[0]])
    return {
        "metric": "groth16_show_verify_seconds",
        "value": {"show": round(dt_show, 4), "verify": round(dt_ver, 4)},
        "unit": "s",
        "circuit": f"dummy-2^{log_size}",
    }


def bench_groth16_prove(log_size: int = 15) -> dict:
    """Groth16 prove wall-clock on a dummy circuit of 2^log_size constraints
    (device NTT + MSM path; the BASELINE.json headline shape)."""
    from .models import groth16

    rng = random.Random(48)
    r1cs, z = groth16.dummy_circuit(log_size, rng)
    pk = groth16.setup(r1cs, rng)
    dt = _t_host(lambda: groth16.prove(pk, r1cs, z, rng), reps=2)
    return {
        "metric": "groth16_prove_seconds",
        "value": round(dt, 3),
        "unit": "s",
        "circuit": f"dummy-2^{log_size}",
    }


ALL = {
    "msm_g1": bench_msm_g1,
    "msm_g2": bench_msm_g2,
    "ntt": bench_ntt,
    "scalar_mul": bench_scalar_mul,
    "range": bench_range,
    "show_verify": bench_show_verify,
    "groth16_prove": bench_groth16_prove,
}


def run_suite(names=None, out_path: str = "BENCH_SUITE.json") -> dict:
    import sys

    names = names or list(ALL)
    results = {}
    for name in names:
        t0 = time.time()
        try:
            r = ALL[name]()
        except Exception as e:  # keep the suite running; record the failure
            r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        r["bench_wall_s"] = round(time.time() - t0, 1)
        results[name] = r
        print(json.dumps(r), file=sys.stderr, flush=True)
    if out_path:
        # merge into any existing file so single-bench reruns don't clobber
        # the rest of the suite's numbers
        merged = {}
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            pass
        merged.update(results)
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)
    return results


if __name__ == "__main__":
    import sys

    run_suite(sys.argv[1:] or None)
