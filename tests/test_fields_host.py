"""Host field/curve/pairing oracle tests."""

import random

import pytest

from crescent_tpu.core import curves, fields, pairing
from crescent_tpu.core.fields import Fq2, Fq6, Fq12, Fr, Fq, P256Fp, T256Fp

rng = random.Random(0xC0FFEE)


def test_field_basics():
    for f in [Fr, Fq, P256Fp, T256Fp]:
        a = rng.randrange(f.p)
        b = rng.randrange(1, f.p)
        assert f.mul(a, f.inv(a)) == 1 if a else True
        assert f.add(a, f.neg(a)) == 0
        assert f.mul(f.div(a, b), b) == a % f.p
        assert f.exp(a, f.p - 1) in (0, 1)


def test_fr_two_adicity_and_roots():
    assert Fr.two_adicity == 28
    w = Fr.root_of_unity(1 << 10)
    assert pow(w, 1 << 10, Fr.p) == 1
    assert pow(w, 1 << 9, Fr.p) != 1


def test_fr_generator_is_5():
    # arkworks ark-bn254 Fr::GENERATOR == 5; our derivation must agree.
    assert Fr.multiplicative_generator == 5


def test_sqrt():
    for f in [Fr, Fq, P256Fp, T256Fp]:
        a = rng.randrange(f.p)
        sq = f.mul(a, a)
        r = f.sqrt(sq)
        assert r is not None and f.mul(r, r) == sq


def test_fq2_tower():
    a = Fq2(rng.randrange(fields.P), rng.randrange(fields.P))
    assert a * a.inv() == Fq2.one()
    assert (a * a) == a.square()
    # Frobenius is the p-power map
    assert a.frobenius(1) == a.pow(fields.P)


def test_fq6_fq12_inverse():
    def rand2():
        return Fq2(rng.randrange(fields.P), rng.randrange(fields.P))

    a6 = Fq6(rand2(), rand2(), rand2())
    assert (a6 * a6.inv()) == Fq6.one()
    a12 = Fq12(a6, Fq6(rand2(), rand2(), rand2()))
    assert (a12 * a12.inv()) == Fq12.one()
    # Frobenius consistency on Fq12
    assert a12.frobenius(1) * a12.frobenius(1).inv() == Fq12.one()
    assert a12.frobenius(2) == a12.frobenius(1).frobenius(1)


@pytest.mark.parametrize("curve", [curves.BN254_G1, curves.P256, curves.T256])
def test_curve_group_law(curve):
    g = curve.generator
    assert curve.is_on_curve(g)
    p2 = curve.double(g)
    assert curve.is_on_curve(p2)
    p3 = curve.add(p2, g)
    assert p3 == curve.mul(3, g)
    # order
    assert curve.mul(curve.n, g) is None
    # commutativity / association spot check
    a, b = rng.randrange(curve.n), rng.randrange(curve.n)
    assert curve.add(curve.mul(a, g), curve.mul(b, g)) == curve.mul(a + b, g)


def test_g2_group_law():
    G2 = curves.BN254G2
    g = G2.generator()
    assert G2.is_on_curve(g)
    assert G2.is_on_curve(G2.mul(7, g))
    assert G2.mul(curves.BN254_G1.n, g) is None


def test_pairing_bilinear():
    g1 = curves.BN254_G1.generator
    g2 = curves.BN254G2.generator()
    e = pairing.pairing(g1, g2)
    assert e != Fq12.one()
    # non-degenerate and of order r
    assert e.pow(curves.BN254_G1.n) == Fq12.one()
    # bilinearity: e(aP, bQ) == e(P, Q)^(ab)
    a, b = 123456789, 987654321
    lhs = pairing.pairing(curves.BN254_G1.mul(a, g1), curves.BN254G2.mul(b, g2))
    assert lhs == e.pow(a * b % curves.BN254_G1.n)


def test_multi_pairing_product():
    g1 = curves.BN254_G1.generator
    g2 = curves.BN254G2.generator()
    # e(2G1, G2) * e(-G1, 2G2) == 1
    pairs = [
        (curves.BN254_G1.mul(2, g1), g2),
        (curves.BN254_G1.neg(curves.BN254_G1.mul(2, g1)), g2),
    ]
    assert pairing.pairing_product_is_one(pairs)
