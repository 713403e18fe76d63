"""Device-binding sigma layer tests (device.rs tiers; pi2/Spartan pending)."""

import random


from crescent_tpu.core.curves import P256
from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.credentials import device, ecdsa_pop
from crescent_tpu.credentials.dlog import pedersen_commit
from crescent_tpu.utils.hash_to_curve import derive_pedersen_bases

rng = random.Random(13)


def test_test_device_signs_valid_ecdsa():
    dev = device.TestDevice(rng=rng)
    digest = bytes(rng.randrange(256) for _ in range(32))
    sig = device.ECDSASig.from_bytes(digest, dev.sign(digest))
    # verify with plain ECDSA math
    n = P256.n
    h = int.from_bytes(digest, "big") % n
    w = pow(sig.s, -1, n)
    X = P256.add(
        P256.mul(h * w % n, P256.generator), P256.mul(sig.r * w % n, dev.public)
    )
    assert X[0] % n == sig.r


def test_compute_rtu_statement():
    dev = device.TestDevice(rng=rng)
    digest = bytes(rng.randrange(256) for _ in range(32))
    sig = device.ECDSASig.from_bytes(digest, dev.sign(digest))
    Rpt, T, U = ecdsa_pop.compute_RTU(sig.r, sig.s, digest, *dev.public)
    # statement: s*T + U == Q (checked inside, but assert again)
    assert P256.add(P256.mul(sig.s, T), U) == dev.public


def test_split_public_key_x():
    x = rng.randrange(1 << 256)
    q0, q1 = ecdsa_pop.split_public_key_x(x)
    assert q0 + (q1 << 128) == x
    assert q0 < (1 << 128) and q1 < (1 << 128)


def test_hq_deterministic():
    h1 = ecdsa_pop.compute_hQ(1, 2, 3)
    assert h1 == ecdsa_pop.compute_hQ(1, 2, 3)
    assert h1 != ecdsa_pop.compute_hQ(1, 2, 4)
    assert len(h1) == 32


def test_device_sigma_layer():
    """pi0/pi1 + challenge plumbing round-trip, with pi2 stubbed out."""
    bases0 = derive_pedersen_bases()
    bases1 = [P := None, None]
    # com1_orig uses different bases (as in the show proof where each
    # committed IO has its own gamma_abc base)
    from crescent_tpu.core.curves import BN254_G1 as G1

    bases1 = [G1.mul(rng.randrange(1, R), G1.generator) for _ in range(2)]
    dev = device.TestDevice(rng=rng)
    q0, q1 = ecdsa_pop.split_public_key_x(dev.public[0])
    com0 = pedersen_commit(q0, bases0, rng=rng)
    com1_orig = pedersen_commit(q1, bases1, rng=rng)
    digest = bytes(rng.randrange(256) for _ in range(32))
    sig = device.ECDSASig.from_bytes(digest, dev.sign(digest))

    # the full DeviceProof (sigma glue + Spartan ECDSA-PoP pi2) round-trips
    # in tests/test_api_db.py; here drive the sigma sub-protocols directly
    z_val = rng.randrange(R)
    comz = pedersen_commit(z_val, com0.bases, rng=rng)
    com1 = pedersen_commit(com1_orig.m, com0.bases, rng=rng)
    from crescent_tpu.credentials.dlog import DLogPoK

    pi0 = DLogPoK.prove(
        device.CONTEXT_PI0,
        [com1_orig.c, com1.c],
        [list(com1_orig.bases), list(com0.bases)],
        [[com1_orig.m, com1_orig.r], [com1.m, com1.r]],
        eq_pos=[(0, 0)],
        rng=rng,
    )
    assert pi0.verify(
        device.CONTEXT_PI0,
        [list(com1_orig.bases), list(com0.bases)],
        [com1_orig.c, com1.c],
        eq_pos=[(0, 0)],
    )
    h_q = ecdsa_pop.compute_hQ(com0.m, com1.m, comz.m)
    e1, e2, _, _ = device.challenge_e1_e2(pi0.c, com0.c, com1.c, comz.c, h_q)
    m = (com0.m + com1.m * e1 + comz.m * e2) % R
    c_m = G1.add(G1.add(com0.c, G1.mul(e1, com1.c)), G1.mul(e2, comz.c))
    r_m = (com0.r + com1.r * e1 + comz.r * e2) % R
    g, h = com0.bases
    lhs1 = G1.add(c_m, G1.neg(G1.mul(m, g)))
    assert lhs1 == G1.mul(r_m, h)  # the m-opening algebra holds
    pi1 = DLogPoK.prove(
        device.CONTEXT_PI1, [lhs1, comz.c], [[h], [g, h]],
        [[r_m], [comz.m, comz.r]], rng=rng,
    )
    assert pi1.verify(device.CONTEXT_PI1, [[h], [g, h]], [lhs1, comz.c])
