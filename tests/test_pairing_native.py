"""Native C++ pairing (bigcurve.cpp tower) vs the Python oracle.

The host oracle (core/pairing.py tower) is the exactness reference; the
native path must be bit-identical on every Fq12 coefficient.  Reference
semantics: ark-bn254 pairing as used by forks/groth16/src/verifier.rs:44
and forks/ark-poly-commit/src/kzg10/mod.rs:357.
"""

import random

import pytest

from crescent_tpu.core.curves import BN254_G1 as G1
from crescent_tpu.core.curves import BN254G2
from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.core.fields import Fq12
from crescent_tpu.core import pairing as pr
from crescent_tpu.native import backend

pytestmark = pytest.mark.skipif(
    not backend.available(), reason="no C++ toolchain"
)


def _oracle_pairing(p, q):
    return pr.final_exponentiation(pr.miller_loop(p, q))


def test_native_matches_oracle_random():
    rng = random.Random(11)
    for _ in range(3):
        a, b = rng.randrange(1, R), rng.randrange(1, R)
        p = G1.mul(a, G1.generator)
        q = BN254G2.mul(b, BN254G2.generator())
        native = pr._native_multi_pairing([(p, q)])
        assert native is not None
        assert native == _oracle_pairing(p, q)


def test_native_multi_matches_oracle():
    rng = random.Random(12)
    pairs = []
    for _ in range(3):
        a, b = rng.randrange(1, R), rng.randrange(1, R)
        pairs.append(
            (G1.mul(a, G1.generator), BN254G2.mul(b, BN254G2.generator()))
        )
    native = pr._native_multi_pairing(pairs)
    f = Fq12.one()
    for p, q in pairs:
        f = f * pr.miller_loop(p, q)
    assert native == pr.final_exponentiation(f)


def test_bilinearity_product_is_one():
    rng = random.Random(13)
    a = rng.randrange(1, R)
    p = G1.mul(a, G1.generator)
    q = BN254G2.mul(7, BN254G2.generator())
    # e(P, Q) * e(-P, Q) == 1 through the native path
    assert pr.pairing_product_is_one([(p, q), (G1.neg(p), q)])
    # and a broken product is not 1
    assert not pr.pairing_product_is_one([(p, q), (p, q)])


def test_identity_pairs():
    q = BN254G2.mul(3, BN254G2.generator())
    p = G1.mul(5, G1.generator)
    assert pr._native_multi_pairing([(None, q)]) == Fq12.one()
    assert pr._native_multi_pairing([(p, None)]) == Fq12.one()
    assert pr._native_multi_pairing([]) == Fq12.one()


def test_generator_pairing_exact():
    """Pin e(G1, G2) against the oracle coefficient-by-coefficient."""
    p = G1.generator
    q = BN254G2.generator()
    native = pr._native_multi_pairing([(p, q)])
    oracle = _oracle_pairing(p, q)
    for attr6 in ("c0", "c1"):
        n6, o6 = getattr(native, attr6), getattr(oracle, attr6)
        for attr2 in ("c0", "c1", "c2"):
            n2, o2 = getattr(n6, attr2), getattr(o6, attr2)
            assert n2.c0 == o2.c0 and n2.c1 == o2.c1
