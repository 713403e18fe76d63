"""EC batch ops, Pippenger MSM, and NTT vs host oracles."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from crescent_tpu.core import curves
from crescent_tpu.core.fields import BN254_FR, Fr
from crescent_tpu.ops import limb, msm, ntt
from crescent_tpu.ops.ec import get_curve_ctx

rng = random.Random(99)


@pytest.fixture(scope="module", params=[curves.BN254_G1, curves.P256])
def cc(request):
    return get_curve_ctx(request.param)


def _host_pts(curve, n):
    return [curve.mul(rng.randrange(1, curve.n), curve.generator) for _ in range(n)]


def test_point_add_matches_host(cc):
    curve = cc.curve
    pts1 = _host_pts(curve, 8) + [None, curve.generator, None]
    pts2 = _host_pts(curve, 8) + [curve.generator, None, None]
    # include doubling and inverse cases
    pts1 += [pts1[0], pts1[1]]
    pts2 += [pts1[0], curve.neg(pts1[1])]
    P = cc.points_to_device(pts1)
    Q = cc.points_to_device(pts2)
    R = cc.add(P, Q)
    got = cc.points_to_host(R)
    want = [curve.add(a, b) for a, b in zip(pts1, pts2)]
    assert got == want


def test_point_double_matches_host(cc):
    curve = cc.curve
    pts = _host_pts(curve, 6) + [None]
    P = cc.points_to_device(pts)
    got = cc.points_to_host(cc.double(P))
    assert got == [curve.double(p) for p in pts]


def test_add_mixed_matches_host(cc):
    curve = cc.curve
    base = _host_pts(curve, 6) + [None, None]
    addend = _host_pts(curve, 6) + [curve.generator, curve.generator]
    # force same/neg cases
    base[0] = addend[0]
    base[1] = curve.neg(addend[1])
    P = cc.points_to_device(base)
    Q = cc.points_to_device(addend)
    valid = jnp.ones(len(addend), dtype=jnp.uint32).at[-1].set(0)
    R = cc.add_mixed(P, Q.x, Q.y, valid)
    got = cc.points_to_host(R)
    want = [curve.add(a, b) for a, b in zip(base, addend)]
    want[-1] = base[-1]  # masked-out lane passes through
    assert got == want


def test_scalar_mul_matches_host(cc):
    curve = cc.curve
    pts = _host_pts(curve, 4)
    ks = [rng.randrange(curve.n) for _ in range(4)]
    P = cc.points_to_device(pts)
    kl = jnp.asarray(limb.ints_to_limbs(ks))
    got = cc.points_to_host(cc.scalar_mul(kl, P))
    assert got == [curve.mul(k, p) for k, p in zip(ks, pts)]


def test_msm_matches_host():
    curve = curves.BN254_G1
    n = 200
    pts = _host_pts(curve, n)
    ks = [rng.randrange(curve.n) for _ in range(n)]
    # throw in edge scalars and identity points
    ks[0], ks[1], ks[2] = 0, 1, curve.n - 1
    pts[3] = None
    # force the Pippenger bucket path (small_cutoff=0) with a tiny lane cap
    m = msm.MSM(curve, c=8, lanes=16, small_cutoff=0)
    got = m.run_host(ks, pts)
    want = curve.msm(ks, pts)
    assert got == want


def test_msm_t256():
    curve = curves.T256
    n = 50
    pts = _host_pts(curve, n)
    ks = [rng.randrange(curve.n) for _ in range(n)]
    m = msm.MSM(curve, c=8, lanes=8)
    assert m.run_host(ks, pts) == curve.msm(ks, pts)


def test_g2_msm_matches_host():
    from crescent_tpu.ops.msm import get_g2_msm

    G2 = curves.BN254G2
    n = 20
    pts = [G2.mul(rng.randrange(1, G2.n), G2.generator()) for _ in range(n)]
    ks = [rng.randrange(G2.n) for _ in range(n)]
    ks[0] = 0
    m = get_g2_msm(c=8, lanes=4)
    got = m.run_host(ks, pts)
    want = G2.msm(ks, pts)
    assert got == want


def test_ntt_roundtrip_and_host():
    n = 64
    dom = ntt.get_domain(BN254_FR, n)
    coeffs = [rng.randrange(BN254_FR) for _ in range(n)]
    cm = jnp.asarray(dom.ctx.to_mont_host(coeffs))
    evals = dom.ntt(cm)
    got = dom.ctx.from_mont_host(np.asarray(evals))
    want = dom.ntt_host(coeffs)
    assert got == want
    back = dom.ctx.from_mont_host(np.asarray(dom.intt(evals)))
    assert back == coeffs


def test_ntt_is_polynomial_evaluation():
    n = 16
    dom = ntt.get_domain(BN254_FR, n)
    coeffs = [rng.randrange(BN254_FR) for _ in range(n)]
    cm = jnp.asarray(dom.ctx.to_mont_host(coeffs))
    evals = dom.ctx.from_mont_host(np.asarray(dom.ntt(cm)))
    for k in [0, 1, 5, n - 1]:
        x = pow(dom.w, k, BN254_FR)
        want = sum(c * pow(x, j, BN254_FR) for j, c in enumerate(coeffs)) % BN254_FR
        assert evals[k] == want


def test_coset_ntt():
    n = 16
    dom = ntt.get_domain(BN254_FR, n)
    g = Fr.multiplicative_generator
    coeffs = [rng.randrange(BN254_FR) for _ in range(n)]
    cm = jnp.asarray(dom.ctx.to_mont_host(coeffs))
    evals = dom.ctx.from_mont_host(np.asarray(dom.coset_ntt(cm, g)))
    for k in [0, 3]:
        x = g * pow(dom.w, k, BN254_FR) % BN254_FR
        want = sum(c * pow(x, j, BN254_FR) for j, c in enumerate(coeffs)) % BN254_FR
        assert evals[k] == want
    back = dom.ctx.from_mont_host(np.asarray(dom.coset_intt(dom.coset_ntt(cm, g), g)))
    assert back == coeffs
