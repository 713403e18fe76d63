"""Non-native P-256 gadgets (r1cs/p256.py) against host crypto.

Unit-level: nn_enforce / nn_mul / add_unequal / fixed_base_mul vs the host
curve oracle (core/curves.py); statement-level: ecdsa_verify_gadget accepts
a real ES256 signature (cryptography lib) and rejects a tampered one.
"""

import hashlib
import random


from crescent_tpu.core.curves import P256
from crescent_tpu.r1cs import p256 as nn
from crescent_tpu.r1cs.builder import ConstraintSystem

rng = random.Random(20240817)


def _alloc(cs, v):
    limbs, bits = nn.nn_alloc(cs, v)
    return limbs, bits


def test_nn_mul_and_enforce():
    cs = ConstraintSystem()
    a_v = rng.randrange(nn.P)
    b_v = rng.randrange(nn.P)
    a, _ = _alloc(cs, a_v)
    b, _ = _alloc(cs, b_v)
    r, _ = nn.nn_mul(cs, a, b, nn.P)
    assert nn.limbs_value(cs, r) == a_v * b_v % nn.P
    # multi-term: a*b - r - 0 == 0 already checked inside; add a linear-only
    c_v = rng.randrange(nn.P)
    c, _ = _alloc(cs, c_v)
    d, _ = _alloc(cs, (a_v * b_v + c_v) % nn.P)
    nn.nn_enforce(cs, [(1, a, b)], [(1, c), (-1, d)], nn.P)
    assert cs.is_satisfied()


def test_nn_mul_bad_witness_rejected():
    cs = ConstraintSystem()
    a, _ = _alloc(cs, 5)
    b, _ = _alloc(cs, 7)
    bad, _ = _alloc(cs, 36)  # != 35
    nn.nn_enforce(cs, [(1, a, b)], [(-1, bad)], nn.P)
    assert not cs.is_satisfied()


def test_add_unequal_matches_host():
    cs = ConstraintSystem()
    g = (P256.gx, P256.gy)
    p1 = P256.msm([rng.randrange(2, P256.n)], [g])
    p2 = P256.msm([rng.randrange(2, P256.n)], [g])
    x1, _ = _alloc(cs, p1[0])
    y1, _ = _alloc(cs, p1[1])
    x2, _ = _alloc(cs, p2[0])
    y2, _ = _alloc(cs, p2[1])
    x3, y3 = nn.add_unequal(cs, (x1, y1), (x2, y2))
    want = P256.add(p1, p2)
    assert nn.limbs_value(cs, x3) == want[0]
    assert nn.limbs_value(cs, y3) == want[1]
    assert cs.is_satisfied()


def test_fixed_base_mul_matches_host():
    cs = ConstraintSystem()
    g = (P256.gx, P256.gy)
    k = rng.randrange(1, P256.n)
    _, bits = _alloc(cs, k)
    x, y = nn.fixed_base_mul(cs, bits, g)
    want = P256.msm([k], [g])
    assert nn.limbs_value(cs, x) == want[0]
    assert nn.limbs_value(cs, y) == want[1]
    assert cs.is_satisfied()


def _es256_fixture():
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        decode_dss_signature,
    )
    from cryptography.hazmat.primitives import hashes

    priv = ec.generate_private_key(ec.SECP256R1())
    msg = b"crescent-tpu es256 gadget test"
    sig = priv.sign(msg, ec.ECDSA(hashes.SHA256()))
    r, s = decode_dss_signature(sig)
    nums = priv.public_key().public_numbers()
    h = int.from_bytes(hashlib.sha256(msg).digest(), "big")
    return r, s, h, (nums.x, nums.y)


def test_ecdsa_verify_gadget():
    r_v, s_v, h_v, pub = _es256_fixture()
    cs = ConstraintSystem()
    r, _ = _alloc(cs, r_v)
    s, _ = _alloc(cs, s_v)
    h, _ = _alloc(cs, h_v)
    nn.ecdsa_verify_gadget(cs, r, s, h, pub)
    assert cs.is_satisfied()

    # tampered signature: same shape, unsatisfied
    cs2 = ConstraintSystem()
    r2, _ = _alloc(cs2, (r_v + 1) % nn.Q)
    s2, _ = _alloc(cs2, s_v)
    h2, _ = _alloc(cs2, h_v)
    nn.ecdsa_verify_gadget(cs2, r2, s2, h2, pub)
    assert not cs2.is_satisfied()

    # shape is input-independent (setup-time zero placeholders build the
    # same circuit)
    cs3 = ConstraintSystem()
    z1, _ = _alloc(cs3, 0)
    z2, _ = _alloc(cs3, 0)
    z3, _ = _alloc(cs3, 0)
    nn.ecdsa_verify_gadget(cs3, z1, z2, z3, pub)
    assert len(cs3.constraints) == len(cs.constraints)
    assert not cs3.is_satisfied()
