"""End-to-end API test: zksetup -> prove -> show -> verify through files.

Equivalent of the reference's end_to_end_test_rs256 (creds/src/lib.rs:964):
every artifact round-trips through disk serialization deliberately."""

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
    "email": {
        "type": "string",
        "reveal": True,
        "max_claim_byte_len": 31,
        "reveal_domain_only": True,
    },
}


def test_end_to_end_rs256():
    rng = random.Random(2718)
    with tempfile.TemporaryDirectory() as base:
        with open(base + "/config.json", "w") as f:
            json.dump(CONFIG, f)
        priv, pub = jwtutil.generate_rsa_keypair(2048)
        with open(base + "/issuer.pub", "w") as f:
            f.write(pub)
        exp = 2000000000
        token = jwtutil.sign_jwt_rs256(
            {"email": "alice@contoso.com", "exp": exp, "iat": 1700000000}, priv
        )

        paths = api.CachePaths(base)
        # the REAL rs256 statement (SHA-256 + RSA-65537 + base64 + claim
        # engine) — reference end_to_end_test_rs256, creds/src/lib.rs:964
        frontend = JWTFrontend()
        # role 1: zksetup
        api.run_zksetup(base, frontend, rng)
        # role 2: holder prove
        config = parse_config(open(paths.config).read())
        prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, pub)
        cs = api.create_client_state(
            paths, prover_inputs, frontend, prover_aux=json.dumps(prover_aux), rng=rng
        )
        api.write_to_file(cs, paths.client_state)
        # role 3: show (at a time before expiry so exp - now fits 32 bits)
        cs2 = api.read_from_file(paths.client_state)
        range_pk = api.read_from_file(paths.range_pk)
        io_locations = IOLocations.from_file(paths.io_locations)
        spec = ProofSpec.from_json('{"revealed": ["email"]}')
        now = exp - 86400
        show = api.create_show_proof(cs2, range_pk, io_locations, spec, rng=rng, cur_time=now)
        api.write_to_file(show, paths.show_proof)
        # role 4: verify
        vp = api.VerifierParams(
            vk=api.read_from_file(paths.groth16_vk),
            pvk=api.read_from_file(paths.groth16_pvk),
            range_vk=api.read_from_file(paths.range_vk),
            io_locations_str=open(paths.io_locations).read(),
            issuer_pem=pub,
            config_str=open(paths.config).read(),
        )
        show2 = api.read_from_file(paths.show_proof)
        ok, revealed = api.verify_show(vp, show2, spec, now_seconds=now + 10)
        assert ok
        assert json.loads(revealed)["email_value"] == "contoso.com"
        # freshness window (lib.rs:635-643)
        ok_stale, _ = api.verify_show(vp, show2, spec, now_seconds=now + 400)
        assert not ok_stale
        # role 3c: thin-client module (wasm_lib.rs:46 string surface) — show
        # from b64url blobs at the real current time, verify at the real
        # current time with the challenge-derived presentation message
        import hashlib

        from crescent_tpu import client as thin
        from crescent_tpu.utils import ark
        from crescent_tpu.utils.serialize import from_b64url, to_b64url

        challenge = "nonce-12345"
        proof_b64 = thin.create_show_proof_client(
            to_b64url(ark.serialize(api.read_from_file(paths.client_state))),
            to_b64url(ark.serialize(range_pk)),
            open(paths.io_locations).read(),
            "crescent://email_domain",
            challenge,
            to_b64url(spec.to_json().encode()),
        )
        spec_v = ProofSpec(
            revealed=["email"],
            presentation_message=hashlib.sha256(challenge.encode()).digest(),
        )
        show3 = ark.deserialize(from_b64url(proof_b64), api.ShowProof)
        ok3, revealed3 = api.verify_show(vp, show3, spec_v)
        assert ok3
        assert json.loads(revealed3)["email_value"] == "contoso.com"
        # expired credential: exp - now negative -> range proof must fail to build
        cs3 = api.read_from_file(paths.client_state)
        try:
            api.create_show_proof(
                cs3, range_pk, io_locations, spec, rng=rng, cur_time=exp + 5
            )
            raised = False
        except AssertionError:
            raised = True
        assert raised, "expired credential must not produce a show proof"
