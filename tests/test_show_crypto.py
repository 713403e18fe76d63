"""Show-layer crypto: merlin transcript KAT, serialization, DLogPoK/DLEQ,
KZG, range proof — mirroring the reference's test tiers (SURVEY.md §4.2)."""

import random

import pytest

from crescent_tpu.core.curves import BN254_G1 as G1
from crescent_tpu.core.curves import BN254G2
from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.credentials import dlog, rangeproof
from crescent_tpu.models import kzg
from crescent_tpu.utils import poly, serialize
from crescent_tpu.utils.hash_to_curve import derive_pedersen_bases
from crescent_tpu.utils.merlin import Transcript

rng = random.Random(31337)


def test_merlin_kat():
    # merlin's own test vector (transcript.rs tests)
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert c.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_serialize_roundtrip():
    p = G1.mul(rng.randrange(1, G1.n), G1.generator)
    assert serialize.deser_g1_compressed(serialize.ser_g1_compressed(p)) == p
    assert serialize.deser_g1_uncompressed(serialize.ser_g1_uncompressed(p)) == p
    assert serialize.deser_g1_compressed(serialize.ser_g1_compressed(None)) is None
    q = BN254G2.mul(7, BN254G2.generator())
    assert serialize.deser_g2_uncompressed(serialize.ser_g2_uncompressed(q)) == q
    b = serialize.to_b64url(b"\x01\x02\xff")
    assert serialize.from_b64url(b) == b"\x01\x02\xff"


def test_poly_division():
    m = R
    p = poly.rand_poly(10, m, rng)
    d = poly.rand_poly(3, m, rng)
    q, r = poly.divmod_poly(p, d, m)
    assert poly.add(poly.mul(q, d, m), r, m) == poly.trim(list(p))
    a = rng.randrange(m)
    ql, rl = poly.div_by_linear(p, a, m)
    assert rl == poly.evaluate(p, a, m)
    qv, rv = poly.div_by_vanishing(poly.mul_by_vanishing(p, 8, m), 8, m)
    assert qv == poly.trim(list(p)) and rv == []


def test_dlog_pok_roundtrip():
    nb = 5
    bases = [G1.mul(rng.randrange(1, G1.n), G1.generator) for _ in range(nb)]
    scalars = [rng.randrange(R) for _ in range(nb)]
    y = G1.msm(scalars, bases)
    pok = dlog.DLogPoK.prove(b"ctx", [y], [bases], [scalars], rng=rng)
    assert pok.verify(b"ctx", [bases], [y])
    # wrong context (dlog.rs negative tests)
    assert not pok.verify(b"other ctx", [bases], [y])
    # wrong bases
    bad = list(bases)
    bad[0] = G1.double(bad[0])
    assert not pok.verify(b"ctx", [bad], [y])


def test_dleq_eq_positions():
    bases0 = [G1.mul(rng.randrange(1, G1.n), G1.generator) for _ in range(3)]
    bases1 = [G1.mul(rng.randrange(1, G1.n), G1.generator) for _ in range(4)]
    shared = rng.randrange(R)
    s0 = [rng.randrange(R), shared, rng.randrange(R)]
    s1 = [rng.randrange(R), rng.randrange(R), shared, rng.randrange(R)]
    y0 = G1.msm(s0, bases0)
    y1 = G1.msm(s1, bases1)
    pok = dlog.DLogPoK.prove(None, [y0, y1], [bases0, bases1], [s0, s1], eq_pos=[(1, 2)], rng=rng)
    assert pok.verify(None, [bases0, bases1], [y0, y1], eq_pos=[(1, 2)])
    # verifying with a different eq position fails (dlog.rs:318-338)
    assert not pok.verify(None, [bases0, bases1], [y0, y1], eq_pos=[(0, 2)])


@pytest.fixture(scope="module")
def kzg_setup():
    return kzg.setup(64, random.Random(11))


def test_kzg_commit_open_check(kzg_setup):
    powers, vk = kzg_setup
    p = poly.rand_poly(20, R, rng)
    com, rand = kzg.commit(powers, p, 1, rng)
    z = rng.randrange(R)
    v = poly.evaluate(p, z, R)
    proof = kzg.open_proof(powers, p, z, rand)
    assert kzg.check(vk, com, z, v, proof)
    assert not kzg.check(vk, com, z, (v + 1) % R, proof)


def test_kzg_batch_check(kzg_setup):
    powers, vk = kzg_setup
    coms, zs, vs, proofs = [], [], [], []
    for _ in range(3):
        p = poly.rand_poly(15, R, rng)
        com, rand = kzg.commit(powers, p, 1, rng)
        z = rng.randrange(R)
        coms.append(com)
        zs.append(z)
        vs.append(poly.evaluate(p, z, R))
        proofs.append(kzg.open_proof(powers, p, z, rand))
    assert kzg.batch_check(vk, coms, zs, vs, proofs, rng)
    vs[1] = (vs[1] + 1) % R
    assert not kzg.batch_check(vk, coms, zs, vs, proofs, rng)


@pytest.fixture(scope="module")
def range_setup():
    return rangeproof.setup(32, random.Random(13))


def test_range_proof_roundtrip(range_setup):
    pk, vk = range_setup
    bases = derive_pedersen_bases()
    value = rng.randrange(1 << 32)
    ped = dlog.pedersen_commit(value, bases, rng=rng)
    proof = rangeproof.prove_n_bits(ped, 32, pk.powers, rng=rng)
    assert rangeproof.verify_n_bits(proof, ped.c, bases, 32, vk, rng=rng)


def test_range_proof_rejects_out_of_range(range_setup):
    pk, vk = range_setup
    bases = derive_pedersen_bases()
    ped = dlog.pedersen_commit((1 << 32) + 5, bases, rng=rng)
    with pytest.raises(AssertionError):
        rangeproof.prove_n_bits(ped, 32, pk.powers, rng=rng)


def test_range_proof_wrong_commitment_rejected(range_setup):
    pk, vk = range_setup
    bases = derive_pedersen_bases()
    ped = dlog.pedersen_commit(1234, bases, rng=rng)
    proof = rangeproof.prove_n_bits(ped, 32, pk.powers, rng=rng)
    other = dlog.pedersen_commit(1234, bases, rng=rng)  # different blinding
    assert not rangeproof.verify_n_bits(proof, other.c, bases, 32, vk, rng=rng)


def test_showdata_split_boundary():
    """crypto/show.js splitShowData: client_helper's /getshowdata blob is
    ser_client_state || ser_range_proof_pk in ONE b64url string
    (services.py _showdata_b64url, client_helper main.rs:259); the
    in-browser prover re-splits it by deserializing the client state and
    cutting at the reader position.  Validate that boundary logic against
    the checked-in golden vectors (whose JS mirror is byte-locked)."""
    import json
    import os

    from crescent_tpu.utils import ark
    from crescent_tpu.utils.serialize import from_b64url

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sample", "client", "test", "show_vectors.json",
    )
    vectors = json.load(open(path))
    assert vectors["cases"], "golden vectors missing"
    for case in vectors["cases"]:
        cs_b = from_b64url(case["client_state_b64url"])
        pk_b = from_b64url(case["range_pk_b64url"])
        blob = cs_b + pk_b
        r = ark.Reader(blob)
        cs = ark.deser_client_state(r)
        assert r.pos == len(cs_b), "ark boundary drifted from ser_client_state"
        assert blob[: r.pos] == cs_b and blob[r.pos :] == pk_b
        assert cs.credtype in ("jwt", "mdl")
