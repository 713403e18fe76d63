"""Big-integer modmul and RSA-65537 verification gadgets."""

import hashlib
import random


from crescent_tpu.r1cs import bigint as bg
from crescent_tpu.r1cs.builder import ConstraintSystem

rng = random.Random(3141)


def _rand_prime(bits: int) -> int:
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=max(512, bits))
    return key.private_numbers().p


def test_mul_mod_gadget():
    k = 5
    n_int = rng.randrange(1 << 599, 1 << 600) | 1
    a = rng.randrange(n_int)
    b = rng.randrange(n_int)
    cs = ConstraintSystem()
    av = bg.alloc_bigint(cs, a, k)
    bv = bg.alloc_bigint(cs, b, k)
    nv = bg.alloc_bigint(cs, n_int, k)
    r = bg.mul_mod_gadget(cs, av, bv, nv, n_int)
    assert bg.limbs_to_int_vals(cs, r) == a * b % n_int
    assert cs.is_satisfied()
    # soundness: corrupt the result
    cs.values[r[0].idx] = (cs.values[r[0].idx] + 1) % (1 << bg.LIMB)
    assert not cs.is_satisfied()


def test_rsa65537_roundtrip():
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=1024)
    n_int = key.public_key().public_numbers().n
    msg = b"crescent test message"
    sig = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    sig_int = int.from_bytes(sig, "big")
    em = bg.pkcs1v15_sha256_encode(hashlib.sha256(msg).digest(), 1024)
    assert pow(sig_int, 65537, n_int) == em  # sanity on host

    k = 9  # 9 * 120 >= 1024
    cs = ConstraintSystem()
    sv = bg.alloc_bigint(cs, sig_int, k)
    nv = bg.alloc_bigint(cs, n_int, k)
    ev = bg.alloc_bigint(cs, em, k)
    bg.rsa65537_verify_gadget(cs, sv, nv, ev, n_int)
    assert cs.is_satisfied()

    # wrong signature: system builds (honest witness math) but the final
    # equality constraints are unsatisfied
    cs2 = ConstraintSystem()
    sv2 = bg.alloc_bigint(cs2, (sig_int + 1) % n_int, k)
    nv2 = bg.alloc_bigint(cs2, n_int, k)
    ev2 = bg.alloc_bigint(cs2, em, k)
    bg.rsa65537_verify_gadget(cs2, sv2, nv2, ev2, n_int)
    assert not cs2.is_satisfied()
