"""Witness-program replay parity for the mDL (ES256/P-256) frontend.

Exercises the non-native hint family (nn_red / nn_quot / nn_inv_mul —
r1cs/p256.py emulated arithmetic) end-to-end: compile the mdl1 circuit
once, replay a SECOND credential through the program, and match the full
Python synthesis bit-for-bit (Python and native executors).
"""

import json
import random

import pytest

from crescent_tpu.credentials.mdl import (
    MDLFrontend,
    generate_es256_issuer_keypair,
    prepare_mdl_prover_inputs,
)
from crescent_tpu.credentials.prep_inputs import parse_config
from crescent_tpu.r1cs.witness_program import compile_witness_program

CONFIG = {
    "credtype": "mdl",
    "alg": "ES256",
    "max_cred_len": 960,
    "birth_date": {"type": "date", "reveal": True, "max_claim_byte_len": 31},
    "height": {"type": "integer", "reveal": True, "max_claim_byte_len": 31},
    "family_name": {"type": "string", "reveal_digest": True,
                    "max_claim_byte_len": 62},
}


@pytest.fixture(scope="module")
def mdl_setup():
    priv, pub = generate_es256_issuer_keypair()
    config = parse_config(json.dumps(CONFIG))
    frontend = MDLFrontend(issuer_pem=pub)
    rng = random.Random(99)

    def make_inputs(attrs, valid_until):
        pi, aux = prepare_mdl_prover_inputs(
            config, attrs, valid_until, pub, issuer_priv_pem=priv, rng=rng,
        )
        merged = dict(pi)
        for k, v in aux.items():
            merged.setdefault(k, v)
        return merged

    return config, frontend, make_inputs


def test_mdl_replay_matches_full_build(mdl_setup):
    config, frontend, make_inputs = mdl_setup
    pi1 = make_inputs(
        {"birth_date": "1990-05-17", "height": 170, "family_name": "Example"},
        "2030-01-01",
    )
    r1cs, assignment, _ = frontend.synthesize(config, pi1)
    prog = compile_witness_program(r1cs)

    pi1p = frontend.replay_inputs(config, pi1)
    vals = prog.run(pi1p)
    assert vals == [v % r1cs.field for v in assignment]

    # unseen credential through the same program (different attrs + sig)
    pi2 = make_inputs(
        {"birth_date": "1985-12-03", "height": 182, "family_name": "Zeta"},
        "2031-06-15",
    )
    _, assignment2, _ = frontend.synthesize(config, pi2)
    vals2 = prog.run(frontend.replay_inputs(config, pi2))
    assert vals2 == [v % r1cs.field for v in assignment2]


def test_mdl_native_replay_matches_python(mdl_setup):
    from crescent_tpu.native import backend as nb

    if not nb.available():
        pytest.skip("native backend unavailable")
    config, frontend, make_inputs = mdl_setup
    pi = make_inputs(
        {"birth_date": "2001-02-28", "height": 155, "family_name": "Nat"},
        "2029-09-09",
    )
    r1cs, assignment, _ = frontend.synthesize(config, pi)
    prog = compile_witness_program(r1cs)
    vals = prog.run_native(frontend.replay_inputs(config, pi))
    got = nb.u64_to_ints(vals)
    assert got == [v % r1cs.field for v in assignment]
