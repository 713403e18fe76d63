"""Groth16 end-to-end on a dummy circuit (setup -> prove -> verify).

Mirrors the reference test strategy tier 1 (SURVEY.md §4: DummyCircuit
round-trips without circom)."""

import random

import pytest

from crescent_tpu.core.curves import BN254_G1 as G1
from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.models import groth16


@pytest.fixture(scope="module")
def setup_bundle():
    rng = random.Random(7)
    r1cs, z = groth16.dummy_circuit(6, rng, num_public=2)
    pk = groth16.setup(r1cs, rng)
    proof = groth16.prove(pk, r1cs, z, rng)
    return rng, r1cs, z, pk, proof


def test_r1cs_satisfied(setup_bundle):
    _, r1cs, z, _, _ = setup_bundle
    assert r1cs.is_satisfied(z)
    bad = list(z)
    bad[-1] = (bad[-1] + 1) % R
    assert not r1cs.is_satisfied(bad)


def test_prove_verify(setup_bundle):
    _, r1cs, z, pk, proof = setup_bundle
    pvk = pk.vk.prepare()
    pub = z[1 : r1cs.num_instance]
    assert groth16.verify(pvk, proof, pub)


def test_wrong_public_inputs_rejected(setup_bundle):
    _, r1cs, z, pk, proof = setup_bundle
    pvk = pk.vk.prepare()
    pub = [x for x in z[1 : r1cs.num_instance]]
    pub[0] = (pub[0] + 1) % R
    assert not groth16.verify(pvk, proof, pub)


def test_tampered_proof_rejected(setup_bundle):
    _, r1cs, z, pk, proof = setup_bundle
    pvk = pk.vk.prepare()
    pub = z[1 : r1cs.num_instance]
    bad = groth16.Proof(G1.double(proof.a), proof.b, proof.c)
    assert not groth16.verify(pvk, bad, pub)


def test_rerandomize(setup_bundle):
    rng, r1cs, z, pk, proof = setup_bundle
    pvk = pk.vk.prepare()
    pub = z[1 : r1cs.num_instance]
    re = groth16.rerandomize_proof(pk.vk, proof, rng)
    assert re.a != proof.a and re.b != proof.b and re.c != proof.c
    assert groth16.verify(pvk, re, pub)


def test_prepared_inputs_split(setup_bundle):
    _, r1cs, z, pk, proof = setup_bundle
    pvk = pk.vk.prepare()
    pub = z[1 : r1cs.num_instance]
    prepared = groth16.prepare_inputs(pk.vk, pub)
    assert groth16.verify_with_prepared_inputs(pvk, proof, prepared)
