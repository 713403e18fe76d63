"""The real rs256 JWT statement circuit (r1cs/jwt_circuit.py + JWTFrontend).

Positive: a real RS256-signed JWT satisfies the circuit and the revealed /
hashed public IOs match the host pipeline.  Negative: tampered signature,
wrong revealed value, and mislocated claim interval are all unsatisfiable.
"""

import base64
import hashlib
import json
import random

import pytest

from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.credentials.prep_inputs import (
    parse_config,
    prepare_prover_inputs,
)
from crescent_tpu.r1cs import jwt_circuit as jc
from crescent_tpu.r1cs.builder import ConstraintSystem
from crescent_tpu.utils import jwt as jwtutil

rng = random.Random(1234)

CONFIG = {
    "alg": "RS256",
    "max_cred_len": 256,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {
        "type": "string", "reveal": True, "max_claim_byte_len": 31,
        "reveal_domain_only": True,
    },
    "tier": {"type": "string", "max_claim_byte_len": 31, "reveal_digest": True},
    "iat": {"type": "number"},
}


@pytest.fixture(scope="module")
def fixture():
    config = parse_config(json.dumps(CONFIG))
    priv, pub = jwtutil.generate_rsa_keypair(2048)
    token = jwtutil.sign_jwt_rs256(
        {"email": "a@b.co", "exp": 2000000000, "iat": 1700000000, "tier": "gold"},
        priv,
    )
    pi, aux, _ = prepare_prover_inputs(config, token, pub)
    return config, token, pi, aux


def test_base64_decode_gadget():
    data = b'{"hello":"world","n":12}'
    enc = base64.urlsafe_b64encode(data).decode().rstrip("=")
    # pad to 4-boundary with '=' like the circuit's header treatment
    enc_padded = enc + "=" * (-len(enc) % 4)
    cs = ConstraintSystem()
    chars = [cs.alloc(ord(c)) for c in enc_padded]
    out = jc.base64_decode(cs, chars, len(data))
    assert bytes(cs.value(b) for b in out) == data
    assert cs.is_satisfied()


def test_ascii_digits_to_field():
    cs = ConstraintSystem()
    digits = [cs.alloc(b) for b in b"1234500\x00\x00"]  # trailing NULs = padding
    # note: buffer semantics are "digits then zero padding"
    out = jc.ascii_digits_to_field(cs, digits)
    assert cs.value(out) == 1234500
    assert cs.is_satisfied()


def test_jwt_circuit_satisfied_and_ios(fixture):
    config, token, pi, aux = fixture
    fe = JWTFrontend()
    pi2 = dict(pi)
    pi2["tier_digest"] = _expected_digest(aux["tier"])
    r1cs, assignment, io = fe.synthesize(config, pi2)
    assert r1cs.is_satisfied(assignment)
    # revealed email domain packs to 'b.co'
    email_pos = io.get_io_location("email_value")
    packed = assignment[email_pos]
    assert packed == int.from_bytes(b"b.co", "little")
    exp_pos = io.get_io_location("exp_value")
    assert assignment[exp_pos] == 2000000000


def _expected_digest(preimage) -> int:
    from crescent_tpu.credentials.api import bits_to_num

    # JSON-serialized form (quotes for strings): the slice the circuit hashes
    pre = json.dumps(preimage, separators=(",", ":"))
    return bits_to_num(hashlib.sha256(pre.encode()).digest()[:31])


def test_jwt_circuit_rejects_tampering(fixture):
    config, token, pi, aux = fixture
    fe = JWTFrontend()

    # 1. flipped signature limb
    bad = dict(pi)
    bad["tier_digest"] = _expected_digest(aux["tier"])
    sig = [int(x) for x in bad["signature"]]
    sig[0] ^= 1
    bad["signature"] = [str(x) for x in sig]
    cs = fe._build(config, bad)
    assert not cs.is_satisfied(), "tampered signature accepted"

    # 2. wrong revealed claim value
    bad = dict(pi)
    bad["tier_digest"] = _expected_digest(aux["tier"])
    bad["exp_value"] = str(int(pi["exp_value"]) + 1)
    cs = fe._build(config, bad)
    assert not cs.is_satisfied(), "wrong revealed value accepted"

    # 3. claim interval pointing at another claim
    bad = dict(pi)
    bad["tier_digest"] = _expected_digest(aux["tier"])
    bad["exp_l"] = bad["iat_l"]
    bad["exp_r"] = bad["iat_r"]
    cs = fe._build(config, bad)
    assert not cs.is_satisfied(), "mislocated claim interval accepted"

    # 4. wrong hashed-claim digest
    bad = dict(pi)
    bad["tier_digest"] = str(_expected_digest(aux["tier"]) + 1)
    cs = fe._build(config, bad)
    assert not cs.is_satisfied(), "wrong claim digest accepted"
