"""Bit-exactness of the fused limb-major Pallas EC kernels (ops/pallas_ec.py)
against the XLA batch-major oracle (ops/ec.py), which is itself validated
against the host oracle.  Runs in interpret mode on CPU (conftest forces the
CPU backend); the same kernel code lowers via Mosaic on TPU and is gated at
bench time by bench.py's on-device-vs-host-oracle check.

Covers the Pippenger hot-path cases: generic mixed add, P==Q (doubling
fallback), P==-Q (identity result), P==inf, valid==0 passthrough, sign==1
(subtract), and full Jacobian+Jacobian add with the same case zoo.

Interpret-mode kernel compiles are ~1 min each, so only BN254 G1 runs by
default; set CRESCENT_SLOW_TESTS=1 for P-256/T-256 and the multi-block grid
(the kernel body is modulus-generic — only the (16,4) consts operand
differs between curves).
"""

import os
import random

import numpy as np
import jax.numpy as jnp
import pytest

from crescent_tpu.core.curves import BN254_G1, P256, T256
from crescent_tpu.ops import limb
from crescent_tpu.ops.ec import JPoints, get_curve_ctx
from crescent_tpu.ops.limb import U32
from crescent_tpu.ops.pallas_ec import get_pallas_ec

SLOW = os.environ.get("CRESCENT_SLOW_TESTS") == "1"
CURVES = [BN254_G1] + ([P256, T256] if SLOW else [])


def _gen(curve):
    return (curve.gx, curve.gy)


def _rand_points(curve, ctx, rng, n):
    """n random affine points (host ints) via device scalar-mul of the gen."""
    ks = [rng.randrange(1, ctx.n) for _ in range(n)]
    P = ctx.points_to_device([_gen(curve)] * n)
    sc = jnp.asarray(limb.ints_to_limbs(ks))
    return ctx.points_to_host(JPoints(*ctx.scalar_mul(sc, P)))


def _pec(ctx, block=8):
    return get_pallas_ec(ctx.fctx.modulus, ctx.a_host % ctx.fctx.modulus, block=block)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_madd_matches_xla(curve):
    rng = random.Random(1234)
    ctx = get_curve_ctx(curve)
    pec = _pec(ctx)

    n = 8
    P_host = _rand_points(curve, ctx, rng, n)
    Q_host = _rand_points(curve, ctx, rng, n)
    # case zoo: lane 0 generic; 1: P==Q; 2: P==-Q; 3: P==inf; 4: valid=0;
    # 5: sign=1 (subtract); 6,7: generic
    Q_host[1] = P_host[1]
    Q_host[2] = (P_host[2][0], (-P_host[2][1]) % ctx.fctx.modulus)
    P_host[3] = None
    valid = np.ones(n, np.uint32)
    valid[4] = 0
    sign = np.zeros(n, np.uint32)
    sign[5] = 1

    P = ctx.points_to_device(P_host)
    Q = ctx.points_to_device(Q_host)

    # oracle: XLA path (negate qy where sign)
    qy_eff = ctx.fctx.select(jnp.asarray(sign), ctx.fctx.neg_mod(Q.y), Q.y)
    ref = ctx.add_mixed(P, Q.x, qy_eff, jnp.asarray(valid))

    out = pec.madd(
        P.x.T, P.y.T, P.z.T, Q.x.T, Q.y.T, jnp.asarray(valid), jnp.asarray(sign)
    )
    got = JPoints(out[0].T, out[1].T, out[2].T)
    assert ctx.points_to_host(got) == ctx.points_to_host(ref)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_jadd_matches_xla(curve):
    rng = random.Random(99)
    ctx = get_curve_ctx(curve)
    pec = _pec(ctx)

    n = 8
    P_host = _rand_points(curve, ctx, rng, n)
    Q_host = _rand_points(curve, ctx, rng, n)
    Q_host[1] = P_host[1]
    Q_host[2] = (P_host[2][0], (-P_host[2][1]) % ctx.fctx.modulus)
    P_host[3] = None
    Q_host[4] = None
    P_host[5] = None
    Q_host[5] = None

    P = ctx.points_to_device(P_host)
    Q = ctx.points_to_device(Q_host)
    ref = ctx.add(P, Q)

    out = pec.jadd(P.x.T, P.y.T, P.z.T, Q.x.T, Q.y.T, Q.z.T)
    got = JPoints(out[0].T, out[1].T, out[2].T)
    assert ctx.points_to_host(got) == ctx.points_to_host(ref)


@pytest.mark.skipif(not SLOW, reason="CRESCENT_SLOW_TESTS != 1")
def test_multi_block_grid():
    """Grid with >1 block: 30 lanes, block 8, exercising internal pad+slice."""
    rng = random.Random(7)
    ctx = get_curve_ctx(BN254_G1)
    pec = _pec(ctx)
    n = 30  # not a block multiple
    P_host = _rand_points(BN254_G1, ctx, rng, n)
    Q_host = _rand_points(BN254_G1, ctx, rng, n)
    P = ctx.points_to_device(P_host)
    Q = ctx.points_to_device(Q_host)
    valid = jnp.ones(n, U32)
    sign = jnp.zeros(n, U32)
    ref = ctx.add_mixed(P, Q.x, Q.y, valid)
    out = pec.madd(P.x.T, P.y.T, P.z.T, Q.x.T, Q.y.T, valid, sign)
    got = JPoints(out[0].T, out[1].T, out[2].T)
    assert ctx.points_to_host(got) == ctx.points_to_host(ref)


@pytest.mark.skipif(not SLOW, reason="CRESCENT_SLOW_TESTS != 1")
def test_msm_pallas_path_matches_host():
    """End-to-end Pippenger with USE_PALLAS forced on (interpret mode):
    the full accumulate/fold rewrite (buckets limb-major, digit gather,
    scatter-back, lane fold) against the host oracle.  Small N to keep
    interpret-mode cost bounded."""
    from crescent_tpu.ops import msm as msm_mod

    rng = random.Random(5)
    ctx = get_curve_ctx(BN254_G1)
    n = 64
    pts = _rand_points(BN254_G1, ctx, rng, n)
    ks = [rng.randrange(BN254_G1.n) for _ in range(n)]

    old = msm_mod.USE_PALLAS
    msm_mod.USE_PALLAS = True
    try:
        m = msm_mod.MSM(BN254_G1, c=8, lanes=4, small_cutoff=0)
        got = m.run_host(ks, pts)
    finally:
        msm_mod.USE_PALLAS = old
    want = BN254_G1.msm(ks, pts)
    assert got == want


@pytest.mark.parametrize("curve", CURVES[:1], ids=lambda c: c.name)
def test_affine_pair_ops_match_host(curve):
    """affine_denom + batch inversion + affine_add (the msm_affine round
    primitives) against the host curve law, with the case zoo: generic,
    L==R (double), L==-R (infinity), left-only, right-only, neither."""
    rng = random.Random(41)
    ctx = get_curve_ctx(curve)
    pec = _pec(ctx)
    host = curve

    n = 8
    L_host = _rand_points(curve, ctx, rng, n)
    R_host = _rand_points(curve, ctx, rng, n)
    R_host[1] = L_host[1]                                     # double
    R_host[2] = (L_host[2][0], (-L_host[2][1]) % ctx.fctx.modulus)  # inf
    lv = np.ones(n, np.uint32)
    rv = np.ones(n, np.uint32)
    rv[3] = 0          # left-only passthrough
    lv[4] = 0          # right-only passthrough
    lv[5] = rv[5] = 0  # neither

    Lp = ctx.points_to_device(L_host)
    Rp = ctx.points_to_device(R_host)
    lx, ly = Lp.x.T, Lp.y.T
    rx, ry = Rp.x.T, Rp.y.T

    d = pec.affine_denom(lx, ly, jnp.asarray(lv), rx, ry, jnp.asarray(rv))
    # host-invert the denominators: inv_mont = to_mont(inv(from_mont(d)))
    d_std = ctx.fctx.from_mont_host(np.asarray(d).T)
    inv_std = [pow(v, -1, ctx.fctx.modulus) for v in d_std]
    inv_pl = jnp.asarray(ctx.fctx.to_mont_host(inv_std).T).astype(U32)

    ox, oy, ov = pec.affine_add(
        lx, ly, jnp.asarray(lv), rx, ry, jnp.asarray(rv), inv_pl
    )
    got_x = ctx.fctx.from_mont_host(np.asarray(ox).T)
    got_y = ctx.fctx.from_mont_host(np.asarray(oy).T)
    ov = np.asarray(ov)

    for i in range(n):
        a = L_host[i] if lv[i] else None
        b = R_host[i] if rv[i] else None
        if a is None and b is None:
            want = None
        elif a is None:
            want = b
        elif b is None:
            want = a
        else:
            want = host.add(a, b)
        if want is None:
            assert ov[i] == 0, i
        else:
            assert ov[i] != 0, i
            assert (got_x[i], got_y[i]) == want, i


@pytest.mark.skipif(not SLOW, reason="CRESCENT_SLOW_TESTS != 1")
def test_inv_and_affine_msm_match_host():
    """pec.inv (Fermat kernel) KAT + full AffineMSM (ops/msm_affine.py) vs
    the host Pippenger oracle — the production TPU MSM path in interpret
    mode at toy size."""
    from crescent_tpu.ops import msm as msm_mod
    from crescent_tpu.ops.msm_affine import AffineMSM

    rng = random.Random(17)
    ctx = get_curve_ctx(BN254_G1)
    pec = _pec(ctx, block=512)

    # inv KAT
    vals = [rng.randrange(1, ctx.fctx.modulus) for _ in range(8)]
    x = jnp.asarray(ctx.fctx.to_mont_host(vals).T).astype(U32)
    got = ctx.fctx.from_mont_host(np.asarray(pec.inv(x)).T)
    assert got == [pow(v, -1, ctx.fctx.modulus) for v in vals]

    # full affine MSM
    n = 64
    pts = _rand_points(BN254_G1, ctx, rng, n)
    ks = [rng.randrange(BN254_G1.n) for _ in range(n)]
    am = AffineMSM(ctx, pec, c=5)
    px, py = ctx.points_to_device(pts).x, ctx.points_to_device(pts).y
    sc = jnp.asarray(limb.ints_to_limbs(ks))
    out = am.run(px, py, jnp.ones(n, U32), sc)
    got = ctx.points_to_host(
        JPoints(out.x[None], out.y[None], out.z[None])
    )[0]
    want = BN254_G1.msm(ks, pts)
    assert got == want


def _g2_planes(ctx, pts):
    """Host G2 affine points -> ((32, n) x-planes, (32, n) y-planes)."""
    dev = ctx.points_to_device(pts)
    n = dev.x.shape[0]
    return dev.x.reshape(n, 32).T, dev.y.reshape(n, 32).T


def test_quad_kernels_match_host():
    """QuadPallasEC (_F2 fused Fq2 kernels): mul / inv / jadd / affine
    pair ops vs the host Fq2 + G2 oracles.  Kernel-level (single launches)
    so interpret mode stays fast; the full G2 AffineMSM correctness gate
    runs on real TPU in bench_suite.bench_msm_g2."""
    from crescent_tpu.core import curves
    from crescent_tpu.core.fields import Fq2
    from crescent_tpu.ops.ec import get_g2_ctx
    from crescent_tpu.ops.pallas_ec import QuadPallasEC

    rng = random.Random(23)
    G2 = curves.BN254G2
    ctx = get_g2_ctx()
    f = ctx.fctx
    pec = QuadPallasEC(f.modulus, 0, block=512)

    # mul KAT (Karatsuba inside one kernel)
    a = [Fq2(rng.randrange(f.modulus), rng.randrange(f.modulus)) for _ in range(8)]
    b = [Fq2(rng.randrange(f.modulus), rng.randrange(f.modulus)) for _ in range(8)]
    am = jnp.asarray(f.to_mont_host(a).reshape(8, 32).T).astype(U32)
    bm = jnp.asarray(f.to_mont_host(b).reshape(8, 32).T).astype(U32)
    got = f.from_mont_host(np.asarray(pec.mul(am, bm)).T.reshape(8, 2, 16))
    assert got == [x * y for x, y in zip(a, b)]

    # inv KAT (norm-map kernel: base Fermat on a^2+b^2)
    vals = [Fq2(rng.randrange(1, f.modulus), rng.randrange(f.modulus))
            for _ in range(8)]
    x = jnp.asarray(f.to_mont_host(vals).reshape(8, 32).T).astype(U32)
    got = f.from_mont_host(np.asarray(pec.inv(x)).T.reshape(8, 2, 16))
    assert got == [v.inv() for v in vals]

    # jadd (complete Jacobian add) incl. identity/double/negation cases
    g = G2.generator()
    P = [G2.mul(k, g) for k in (1, 5, 9, 7, 1)] + [None]
    Q = [G2.mul(k, g) for k in (2, 5, 3)] + [G2.neg(G2.mul(7, g)), None, None]
    Px, Py = _g2_planes(ctx, P)
    Qx, Qy = _g2_planes(ctx, Q)
    one = jnp.asarray(f.to_mont_host([f.host_one])[0]).reshape(32, 1)
    pz = jnp.where(jnp.asarray([p is not None for p in P])[None, :],
                   jnp.broadcast_to(one, Px.shape), jnp.uint32(0))
    qz = jnp.where(jnp.asarray([q is not None for q in Q])[None, :],
                   jnp.broadcast_to(one, Qx.shape), jnp.uint32(0))
    ox, oy, oz = pec.jadd(Px, Py, pz, Qx, Qy, qz)
    got = ctx.points_to_host(JPoints(ox.T.reshape(-1, 2, 16),
                                     oy.T.reshape(-1, 2, 16),
                                     oz.T.reshape(-1, 2, 16)))
    want = [G2.add(p, q) for p, q in zip(P, Q)]
    assert got == want

    # affine pair ops + batch inversion through the Fq2 product tree
    from crescent_tpu.ops.msm_affine import AffineMSM

    n = 8
    Lh = [G2.mul(rng.randrange(1, 1 << 20), g) for _ in range(n)]
    Rh = [G2.mul(rng.randrange(1, 1 << 20), g) for _ in range(n)]
    Rh[1] = Lh[1]                    # double case
    Rh[2] = G2.neg(Lh[2])            # infinity case
    lv = np.ones(n, np.uint32)
    rv = np.ones(n, np.uint32)
    rv[3] = 0
    lv[4] = 0
    lv[5] = rv[5] = 0
    lx, ly = _g2_planes(ctx, Lh)
    rx, ry = _g2_planes(ctx, Rh)
    lvj, rvj = jnp.asarray(lv), jnp.asarray(rv)
    amsm = AffineMSM(ctx, pec, c=5, inv_floor=4096)
    d = pec.affine_denom(lx, ly, lvj, rx, ry, rvj)
    sx, sy, sv = pec.affine_add(lx, ly, lvj, rx, ry, rvj, amsm._batch_inv(d))
    sv = np.asarray(sv)
    got = ctx.points_to_host(JPoints(sx.T.reshape(-1, 2, 16),
                                     sy.T.reshape(-1, 2, 16),
                                     jnp.where(jnp.asarray(sv)[None, :] != 0,
                                               jnp.broadcast_to(one, sx.shape),
                                               jnp.uint32(0)).T.reshape(-1, 2, 16)))
    for i in range(n):
        l = Lh[i] if lv[i] else None
        r = Rh[i] if rv[i] else None
        want = G2.add(l, r)
        if want is None:
            assert sv[i] == 0, i
        else:
            assert sv[i] != 0, i
            assert got[i] == want, i


def test_bucket_reduce_matches_host():
    """Fused per-window bucket reduction (suffix sums + weight tree in ONE
    pallas launch) vs host weighted bucket sums, padded-lane layout."""
    rng = random.Random(3)
    ctx = get_curve_ctx(BN254_G1)
    pec = _pec(ctx)
    W, B = 2, 5
    Bp = pec.bucket_stride(B)
    g = BN254_G1.generator
    pts = {}
    cols = []
    for w in range(W):
        for b in range(B):
            pts[(w, b)] = (
                BN254_G1.mul(rng.randrange(1, BN254_G1.n), g)
                if b and rng.random() < 0.7 else None
            )
            cols.append(pts[(w, b)])
    dev = ctx.points_to_device(cols)
    dx = np.zeros((16, W * Bp), np.uint32)
    dy = np.zeros((16, W * Bp), np.uint32)
    dz = np.zeros((16, W * Bp), np.uint32)
    xT = np.asarray(dev.x).T
    yT = np.asarray(dev.y).T
    zT = np.asarray(dev.z).T
    for w in range(W):
        for b in range(B):
            j = w * B + b
            dx[:, w * Bp + b] = xT[:, j]
            dy[:, w * Bp + b] = yT[:, j]
            dz[:, w * Bp + b] = zT[:, j]
    ax, ay, az = pec.bucket_reduce(
        jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dz), W, B
    )
    got = ctx.points_to_host(JPoints(ax.T, ay.T, az.T))
    for w in range(W):
        want = None
        for b in range(1, B):
            if pts[(w, b)] is not None:
                want = BN254_G1.add(want, BN254_G1.mul(b, pts[(w, b)]))
        assert got[w] == want, w
