"""The api-level witness-program cache: a second prove of the same config
must take the native replay path and still produce a verifying proof.

Reference behavior parity: the reference re-runs its compiled circom WASM
witness calculator per prove (creds/src/lib.rs:255-302); here the compiled
witness program is the equivalent artifact.
"""

import json
import random
import tempfile

from crescent_tpu.credentials import api
from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.credentials.prep_inputs import ProofSpec, parse_config, prepare_prover_inputs
from crescent_tpu.credentials.structs import IOLocations
from crescent_tpu.utils import jwt as jwtutil

CONFIG = {
    "alg": "RS256",
    "max_cred_len": 256,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {"type": "string", "reveal": True, "max_claim_byte_len": 31},
}


def test_second_prove_uses_replay_and_verifies():
    rng = random.Random(777)
    with tempfile.TemporaryDirectory() as base:
        with open(base + "/config.json", "w") as f:
            json.dump(CONFIG, f)
        priv, pub = jwtutil.generate_rsa_keypair(2048)
        with open(base + "/issuer.pub", "w") as f:
            f.write(pub)
        paths = api.CachePaths(base)
        frontend = JWTFrontend()
        api.run_zksetup(base, frontend, rng)
        config = parse_config(open(paths.config).read())

        api._WITNESS_CACHE.clear()
        states = []
        for email, exp in (("a@x.io", 2000000000), ("b@y.org", 2111111111)):
            token = jwtutil.sign_jwt_rs256(
                {"email": email, "exp": exp, "iat": 1700000000}, priv
            )
            prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, pub)
            cs = api.create_client_state(
                paths, prover_inputs, frontend,
                prover_aux=json.dumps(prover_aux), rng=rng,
            )
            states.append(cs)
        # cache has a compiled program; second prove went through replay
        (ent,) = api._WITNESS_CACHE.values()
        assert ent[2] is not None, "witness program failed to compile"

        # both client states produce verifying show proofs
        io_locations = IOLocations.from_file(paths.io_locations)
        range_pk = api.read_from_file(paths.range_pk)
        spec = ProofSpec.from_json('{"revealed": ["email"]}')
        vp = api.VerifierParams(
            vk=api.read_from_file(paths.groth16_vk),
            pvk=api.read_from_file(paths.groth16_pvk),
            range_vk=api.read_from_file(paths.range_vk),
            io_locations_str=open(paths.io_locations).read(),
            issuer_pem=pub,
            config_str=open(paths.config).read(),
        )
        for cs, email in zip(states, ("a@x.io", "b@y.org")):
            now = 2000000000 - 86400
            show = api.create_show_proof(
                cs, range_pk, io_locations, spec, rng=rng, cur_time=now
            )
            ok, revealed = api.verify_show(vp, show, spec, now_seconds=now + 10)
            assert ok, f"show proof failed for {email}"
            assert json.loads(revealed)["email_value"] == email
