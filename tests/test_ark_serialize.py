"""ark CanonicalSerialize layout tests (utils/ark.py).

Golden byte-layout checks for the primitives, pairing-validated G2Prepared
construction (ark models/bn/g2.rs), and round-trips through every artifact
serializer on a real (small) zksetup/prove/show artifact tree.
"""

import random

import pytest

from crescent_tpu.core.curves import BN254G2, BN254_G1
from crescent_tpu.core import pairing as pr
from crescent_tpu.models import groth16
from crescent_tpu.utils import ark
from crescent_tpu.utils.serialize import ser_g1_uncompressed

rng = random.Random(7)


def test_primitive_layouts():
    # u64 LE
    assert ark.ser_u64(0x0102) == bytes([2, 1, 0, 0, 0, 0, 0, 0])
    # bool
    assert ark.ser_bool(True) == b"\x01"
    # Option
    assert ark.ser_option(None, ark.ser_fr) == b"\x00"
    assert ark.ser_option(5, ark.ser_fr)[:2] == b"\x01\x05"
    # String: u64 len + utf8
    assert ark.ser_string("ab") == bytes([2, 0, 0, 0, 0, 0, 0, 0]) + b"ab"
    # BigUint: Vec<u8> of to_bytes_le
    assert ark.ser_biguint(0x0100) == bytes([2, 0, 0, 0, 0, 0, 0, 0, 0x00, 0x01])
    assert ark.ser_biguint(0) == bytes([1, 0, 0, 0, 0, 0, 0, 0, 0])
    # G1 generator uncompressed: x=1, y=2 LE
    g = ser_g1_uncompressed(BN254_G1.generator)
    assert g[0] == 1 and g[1:32] == bytes(31)
    assert g[32] == 2 and g[33:64] == bytes(31)
    # infinity flag bit 6 of last byte
    inf = ser_g1_uncompressed(None)
    assert inf[:63] == bytes(63) and inf[63] == 0x40


def test_g2_prepared_matches_pairing():
    """The ell coefficients must reproduce the optimal-ate pairing exactly —
    validates the ark doubling/addition step transcription."""
    P1 = BN254_G1.mul(987654321, BN254_G1.generator)
    Q1 = BN254G2.mul(123456789, BN254G2.generator())
    ell, inf = ark.g2_prepare(Q1)
    assert not inf
    # 64 doublings + adds for each nonzero signed digit + 2 final steps
    nz = sum(1 for d in ark.ATE_LOOP_COUNT_I8[:-1] if d)
    assert len(ell) == 64 + nz + 2
    f = pr.final_exponentiation(ark.miller_loop_from_ell(P1, ell))
    assert f == pr.pairing(P1, Q1)


def test_g2_prepared_infinity():
    ell, inf = ark.g2_prepare(None)
    assert inf and ell == []
    assert ark.ser_g2_prepared((ell, inf)) == bytes(8) + b"\x01"


@pytest.fixture(scope="module")
def small_artifacts():
    r1cs, z = groth16.dummy_circuit(4, rng, num_public=2)
    pk = groth16.setup(r1cs, rng)
    proof = groth16.prove(pk, r1cs, z, rng)
    return r1cs, z, pk, proof


def _roundtrip(obj):
    b = ark.serialize(obj)
    out = ark.deserialize(b, type(obj))
    b2 = ark.serialize(out)
    assert b == b2, f"{type(obj).__name__} does not round-trip"
    return out


def test_groth16_artifact_roundtrip(small_artifacts):
    r1cs, z, pk, proof = small_artifacts
    p2 = _roundtrip(proof)
    assert (p2.a, p2.c) == (proof.a, proof.c) and p2.b == proof.b
    vk2 = _roundtrip(pk.vk)
    assert vk2.gamma_abc_g1 == pk.vk.gamma_abc_g1
    pvk = pk.vk.prepare()
    pvk2 = _roundtrip(pvk)
    assert pvk2.alpha_beta == pvk.alpha_beta
    pk2 = _roundtrip(pk)
    assert pk2.a_query == pk.a_query and pk2.b_g2_query == pk.b_g2_query
    # deserialized keys still verify
    inputs = z[1 : r1cs.num_instance]
    assert groth16.verify(pvk2, p2, inputs)


def test_show_pipeline_roundtrip(small_artifacts, tmp_path):
    """Full artifact tree: range keys, client state, show proof — serialized
    bytes round-trip and the deserialized proof still verifies."""
    import json

    from crescent_tpu.credentials import rangeproof as rp
    from crescent_tpu.credentials.api import ShowProof
    from crescent_tpu.credentials.dlog import PedersenOpening
    from crescent_tpu.credentials.groth16rand import ClientState
    from crescent_tpu.credentials.structs import IOLocations, PublicIOType

    r1cs, z, pk, proof = small_artifacts
    range_pk, range_vk = rp.setup(32, rng)
    _roundtrip(range_pk)
    _roundtrip(range_vk)

    pvk = pk.vk.prepare()
    inputs = z[1 : r1cs.num_instance]
    cs = ClientState(
        inputs=inputs,
        aux=None,
        proof=proof,
        vk=pk.vk,
        pvk=pvk,
        config_str="{}",
        credtype="jwt",
    )
    io_types = [PublicIOType.COMMITTED] + [PublicIOType.HIDDEN] * (len(inputs) - 1)
    show = cs.show_groth16(b"ctx", io_types, rng=rng)
    cs2 = _roundtrip(cs)
    assert cs2.inputs == cs.inputs
    assert len(cs2.committed_input_openings) == len(cs.committed_input_openings)
    _roundtrip(show)

    # a 32-bit committed value for the range proof (the dummy circuit's
    # public inputs are full field elements, so commit a fresh small one)
    from crescent_tpu.core.curves import BN254_G1 as G1

    b = cs.committed_input_openings[0].bases
    m_small, r_small = 123456789, rng.randrange(1 << 64)
    exp_open = PedersenOpening(
        bases=list(b),
        m=m_small,
        r=r_small,
        c=G1.add(G1.mul(m_small, b[0]), G1.mul(r_small, b[1])),
    )
    sr = cs.show_range(exp_open, 32, range_pk, rng=rng)
    sp = ShowProof(
        show_groth16=show,
        show_range_exp=sr,
        show_range_attr=[],
        revealed_inputs=[5, 6],
        revealed_preimages=None,
        inputs_len=len(inputs),
        cur_time=1700000000,
        device_proof=None,
    )
    sp2 = _roundtrip(sp)
    # the deserialized show proof still verifies against the vk
    assert sp2.show_groth16.verify(pk.vk, pvk, b"ctx", io_types, [])
