"""rs256-sd parameter set: selective disclosure of hashed claims.

The -sd family reveals claims as SHA-256 digests whose preimages travel with
the show proof (reference: reveal_digest config flag, lib.rs:560-605)."""

import json
import random
import tempfile

from crescent_tpu.credentials import api
from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.credentials.prep_inputs import ProofSpec, parse_config, prepare_prover_inputs
from crescent_tpu.credentials.structs import IOLocations
from crescent_tpu.utils import jwt as jwtutil

SD_CONFIG = {
    "alg": "RS256",
    "max_cred_len": 256,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "family_name": {"type": "string", "reveal_digest": True, "max_claim_byte_len": 64},
}


def test_end_to_end_rs256_sd():
    rng = random.Random(99)
    with tempfile.TemporaryDirectory() as base:
        with open(base + "/config.json", "w") as f:
            json.dump(SD_CONFIG, f)
        priv, pub = jwtutil.generate_rsa_keypair(2048)
        with open(base + "/issuer.pub", "w") as f:
            f.write(pub)
        exp = 2000000000
        token = jwtutil.sign_jwt_rs256(
            {"family_name": "Matthewson", "exp": exp, "iat": 1700000000}, priv
        )
        paths = api.CachePaths(base)
        # real statement (reference end_to_end_test_rs256_sd, lib.rs:964)
        frontend = JWTFrontend()
        api.run_zksetup(base, frontend, rng)

        config = parse_config(open(paths.config).read())
        prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, pub)
        # the sd pipeline carries hashed-claim preimages in aux
        # (prepare_prover_aux fills them from the reveal_digest config)
        assert prover_aux == {"family_name": "Matthewson"}
        # the frontend needs the preimage among prover inputs to compute the
        # digest public IO (the circuit hashes the in-token claim bytes)
        prover_inputs["family_name"] = "Matthewson"
        cs = api.create_client_state(
            paths, prover_inputs, frontend, prover_aux=json.dumps(prover_aux), rng=rng
        )
        range_pk = api.read_from_file(paths.range_pk)
        io_locations = IOLocations.from_file(paths.io_locations)
        spec = ProofSpec.from_json('{"revealed": ["family_name"]}')
        now = exp - 1000
        show = api.create_show_proof(cs, range_pk, io_locations, spec, rng=rng, cur_time=now)
        assert show.revealed_preimages is not None
        vp = api.VerifierParams(
            vk=api.read_from_file(paths.groth16_vk),
            pvk=api.read_from_file(paths.groth16_pvk),
            range_vk=api.read_from_file(paths.range_vk),
            io_locations_str=open(paths.io_locations).read(),
            issuer_pem=pub,
            config_str=open(paths.config).read(),
        )
        ok, revealed = api.verify_show(vp, show, spec, now_seconds=now + 5)
        assert ok
        assert json.loads(revealed)["family_name"] == "Matthewson"
        # a wrong preimage must fail (digest mismatch breaks the pairing check)
        show.revealed_preimages = json.dumps({"family_name": "Mallory"})
        ok2, _ = api.verify_show(vp, show, spec, now_seconds=now + 5)
        assert not ok2
