"""Full show_groth16 + show_range round-trip on a dummy circuit.

Mirrors the reference's `range_test` (creds/src/rangeproof.rs:446-557):
hand-built IOLocations over a small circuit, one Committed IO carrying a
32-bit value, one Revealed, one Hidden."""

import random

import pytest

from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.credentials import rangeproof
from crescent_tpu.credentials.groth16rand import ClientState
from crescent_tpu.credentials.structs import IOLocations, PublicIOType
from crescent_tpu.models import groth16

rng = random.Random(555)


def small_circuit():
    """Constraints: a*b = pub0 (32-bit), a*a = pub1, b*b = pub2.
    Variables: [1, pub0, pub1, pub2, a, b]."""
    a, b = 3, 12345
    cons = [
        ([(4, 1)], [(5, 1)], [(1, 1)]),
        ([(4, 1)], [(4, 1)], [(2, 1)]),
        ([(5, 1)], [(5, 1)], [(3, 1)]),
    ]
    r1cs = groth16.R1CS(4, 2, cons)
    z = [1, a * b, a * a, b * b, a, b]
    assert r1cs.is_satisfied(z)
    return r1cs, z


@pytest.fixture(scope="module")
def bundle():
    r1cs, z = small_circuit()
    pk = groth16.setup(r1cs, rng)
    proof = groth16.prove(pk, r1cs, z, rng)
    pvk = pk.vk.prepare()
    cs = ClientState(
        inputs=z[1 : r1cs.num_instance],
        aux=None,
        proof=proof,
        vk=pk.vk,
        pvk=pvk,
        config_str="{}",
    )
    range_pk, range_vk = rangeproof.setup(32, random.Random(77))
    return r1cs, z, pk, pvk, cs, range_pk, range_vk


IO_TYPES = [PublicIOType.COMMITTED, PublicIOType.REVEALED, PublicIOType.HIDDEN]


def test_show_and_verify(bundle):
    r1cs, z, pk, pvk, cs, *_ = bundle
    show = cs.show_groth16(b"test context", IO_TYPES, rng=rng)
    revealed = [z[2]]  # pub1 is the only revealed input
    assert show.verify(pk.vk, pvk, b"test context", IO_TYPES, revealed)
    # wrong context fails
    assert not show.verify(pk.vk, pvk, b"wrong", IO_TYPES, revealed)
    # wrong revealed value fails
    assert not show.verify(pk.vk, pvk, b"test context", IO_TYPES, [(z[2] + 1) % R])


def test_show_unlinkable(bundle):
    r1cs, z, pk, pvk, cs, *_ = bundle
    s1 = cs.show_groth16(None, IO_TYPES, rng=rng)
    s2 = cs.show_groth16(None, IO_TYPES, rng=rng)
    assert s1.rand_proof.a != s2.rand_proof.a
    assert s1.committed_inputs[0] != s2.committed_inputs[0]
    assert s1.verify(pk.vk, pvk, None, IO_TYPES, [z[2]])
    assert s2.verify(pk.vk, pvk, None, IO_TYPES, [z[2]])


def test_show_range_roundtrip(bundle):
    r1cs, z, pk, pvk, cs, range_pk, range_vk = bundle
    show = cs.show_groth16(b"ctx", IO_TYPES, rng=rng)
    assert show.verify(pk.vk, pvk, b"ctx", IO_TYPES, [z[2]])
    opening = cs.committed_input_openings[0]
    sr = cs.show_range(opening, 32, range_pk, rng=rng)

    io_locs = IOLocations({"exp_value": 1, "square_a": 2, "square_b": 3})
    assert sr.verify(
        opening.c, 32, range_vk, io_locs, pk.vk, "exp_value", rng=rng
    )
    # binding: a different commitment must not verify
    from crescent_tpu.core.curves import BN254_G1 as G1

    assert not sr.verify(
        G1.double(opening.c), 32, range_vk, io_locs, pk.vk, "exp_value", rng=rng
    )
