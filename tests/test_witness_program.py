"""Witness-program compile + replay parity (r1cs/witness_program.py).

The compiled replay must reproduce the full Python synthesis bit-for-bit,
including on a SECOND credential it has never seen (same circuit shape,
different witness) — that is the production use: compile once per config,
replay per prove.  Mirrors the role of the reference's compiled witness
calculator (forks/circom-compat/src/witness/witness_calculator.rs).
"""

import json
import random

import pytest

from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.credentials.prep_inputs import parse_config, prepare_prover_inputs
from crescent_tpu.r1cs.witness_program import compile_witness_program
from crescent_tpu.utils import jwt as jwtutil

CONFIG = {
    "alg": "RS256",
    "max_cred_len": 256,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {
        "type": "string",
        "reveal": True,
        "max_claim_byte_len": 31,
        "reveal_domain_only": True,
    },
    "tier": {"type": "string", "max_claim_byte_len": 31, "reveal_digest": True},
}


@pytest.fixture(scope="module")
def rs256_setup():
    priv, pub = jwtutil.generate_rsa_keypair(2048)
    config = parse_config(json.dumps(CONFIG))
    frontend = JWTFrontend()

    def make_inputs(claims):
        token = jwtutil.sign_jwt_rs256(claims, priv)
        pi, aux, _ = prepare_prover_inputs(config, token, pub)
        merged = dict(pi)
        for k, v in aux.items():
            merged.setdefault(k, v)
        return merged

    return config, frontend, make_inputs


def test_replay_matches_full_build(rs256_setup):
    config, frontend, make_inputs = rs256_setup
    pi1 = make_inputs(
        {"email": "alice@contoso.com", "exp": 2000000000, "iat": 1700000000,
         "tier": "gold"}
    )
    r1cs, assignment, _io = frontend.synthesize(config, pi1)
    prog = compile_witness_program(r1cs)

    # frontends preprocess (digest derivation) before _build; replay needs
    # the same preprocessed dict — reuse synthesize's own preprocessing via
    # the public helper path (make_inputs already merged aux; digests are
    # derived inside synthesize, so derive them the same way here)
    pi1p = frontend.replay_inputs(config, pi1)
    vals = prog.run(pi1p)
    assert vals == [v % r1cs.field for v in assignment]

    # a DIFFERENT credential through the same program
    pi2 = make_inputs(
        {"email": "bob@fabrikam.io", "exp": 2123456789, "iat": 1711111111,
         "tier": "silver-plus"}
    )
    _, assignment2, _ = frontend.synthesize(config, pi2)
    vals2 = prog.run(frontend.replay_inputs(config, pi2))
    assert vals2 == [v % r1cs.field for v in assignment2]
    assert vals2 != vals


def test_replay_satisfies_r1cs(rs256_setup):
    config, frontend, make_inputs = rs256_setup
    pi = make_inputs({"email": "c@d.org", "exp": 1999999999, "iat": 1690000000,
                      "tier": "basic"})
    r1cs, _, _ = frontend.synthesize(config, pi)
    prog = compile_witness_program(r1cs)
    vals = prog.run(frontend.replay_inputs(config, pi))
    assert r1cs.is_satisfied(vals)


def test_native_replay_matches_python(rs256_setup):
    from crescent_tpu.native import backend as nb

    if not nb.available():
        pytest.skip("native backend unavailable")
    config, frontend, make_inputs = rs256_setup
    pi = make_inputs(
        {"email": "nat@ive.example", "exp": 2050505050, "iat": 1701234567,
         "tier": "platinum"}
    )
    r1cs, assignment, _ = frontend.synthesize(config, pi)
    prog = compile_witness_program(r1cs)
    pip = frontend.replay_inputs(config, pi)
    vals_u64 = prog.run_native(pip)
    got = nb.u64_to_ints(vals_u64)
    assert got == [v % r1cs.field for v in assignment]


def test_compile_reports_underivable_wires():
    from crescent_tpu.r1cs.builder import ConstraintSystem
    from crescent_tpu.r1cs.witness_program import CompileError

    cs = ConstraintSystem()
    cs.alloc(42)  # never constrained, never marked input
    r1cs = cs.to_r1cs()
    with pytest.raises(CompileError):
        compile_witness_program(r1cs)


def test_simple_gadget_program():
    rng = random.Random(9)
    from crescent_tpu.r1cs.builder import LC, ConstraintSystem

    def build(x_val, y_val):
        cs = ConstraintSystem()
        x = cs.alloc(x_val)
        y = cs.alloc(y_val)
        cs.mark_input(x, "x")
        cs.mark_input(y, "y")
        p = cs.mul(x, y)
        bits = cs.decompose_bits(p, 64)
        z = cs.is_zero(LC.of(x) - LC.of(y))
        s = cs.select(z, p, x)
        cs.xor(bits[0], bits[1])
        cs.bits_to_num(bits[:8])
        cs.add_const_mul(LC.of(s) + LC.of(7))
        return cs

    base = build(123456, 789)
    prog = compile_witness_program(base.to_r1cs())
    for _ in range(5):
        xv, yv = rng.randrange(1 << 30), rng.randrange(1 << 30)
        want = build(xv, yv).assignment()
        got = prog.run({"x": xv, "y": yv})
        assert got == want
    # x == y exercises the is_zero branch
    want = build(555, 555).assignment()
    assert prog.run({"x": 555, "y": 555}) == want
