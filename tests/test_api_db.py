"""End-to-end rs256-db: device-bound credential show/verify.

Equivalent of the reference's end_to_end_test_rs256_db (creds/src/lib.rs:964):
the JWT carries the split device public key as claims device_key_0/1, the
show commits them, and the DeviceProof (sigma glue + Spartan ECDSA-PoP NIZK)
binds a fresh device signature on the presentation message to those
commitments.
"""

import hashlib
import json
import random
import tempfile

from crescent_tpu.credentials import api
from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.credentials.device import TestDevice
from crescent_tpu.credentials.ecdsa_pop import split_public_key_x
from crescent_tpu.credentials.prep_inputs import (
    ProofSpec,
    parse_config,
    prepare_prover_inputs,
)
from crescent_tpu.credentials.structs import IOLocations
from crescent_tpu.utils import jwt as jwtutil

CONFIG = {
    "alg": "RS256",
    "device_bound": True,
    "max_cred_len": 384,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {"type": "string", "reveal": True, "max_claim_byte_len": 31},
}


def test_end_to_end_rs256_db():
    rng = random.Random(314)
    dev = TestDevice(rng=rng)
    q0, q1 = split_public_key_x(dev.public[0])
    with tempfile.TemporaryDirectory() as base:
        with open(base + "/config.json", "w") as f:
            json.dump(CONFIG, f)
        priv, pub = jwtutil.generate_rsa_keypair(2048)
        with open(base + "/issuer.pub", "w") as f:
            f.write(pub)
        exp = 2000000000
        token = jwtutil.sign_jwt_rs256(
            {
                "email": "alice@contoso.com",
                "exp": exp,
                "iat": 1700000000,
                "device_key_0": q0,
                "device_key_1": q1,
            },
            priv,
        )

        paths = api.CachePaths(base)
        # real statement (reference end_to_end_test_rs256_db, lib.rs:964)
        frontend = JWTFrontend()
        api.run_zksetup(base, frontend, rng)

        config = parse_config(open(paths.config).read())
        prover_inputs, prover_aux, _ = prepare_prover_inputs(
            config, token, pub, device_pub_pem=dev.public_pem()
        )
        cs = api.create_client_state(
            paths, prover_inputs, frontend, prover_aux=json.dumps(prover_aux), rng=rng
        )
        api.write_to_file(cs, paths.client_state)

        cs2 = api.read_from_file(paths.client_state)
        range_pk = api.read_from_file(paths.range_pk)
        io_locations = IOLocations.from_file(paths.io_locations)
        pm = b"challenge-nonce-123"
        # the CLI layer hashes the raw presentation message before handing it
        # to the library (main.rs:191-192); mirror that here
        psi_digest = hashlib.sha256(pm).digest()
        spec = ProofSpec.from_json(
            json.dumps({"revealed": ["email"], "device_bound": True,
                        "presentation_message": list(psi_digest)})
        )
        now = exp - 86400
        device_sig = dev.sign(psi_digest)
        show = api.create_show_proof(
            cs2, range_pk, io_locations, spec,
            device_signature=device_sig, rng=rng, cur_time=now,
        )
        api.write_to_file(show, paths.show_proof)

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
        assert ok, "device-bound show proof must verify"
        assert json.loads(revealed)["email_value"] == "alice@contoso.com"

        # tamper: flip a byte of pi2 -> reject
        import copy

        bad = copy.deepcopy(show2)
        blob = bytearray(bad.device_proof.pi2)
        blob[len(blob) // 2] ^= 1
        bad.device_proof.pi2 = bytes(blob)
        ok_bad, _ = api.verify_show(vp, bad, spec, now_seconds=now + 10)
        assert not ok_bad, "tampered device proof accepted"
