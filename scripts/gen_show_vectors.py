"""Generate cross-language golden vectors for the in-browser show prover.

Creates a small rs256 credential (256-byte cred, fast zksetup), runs
client.py::create_show_proof_client with a seeded HashDRBG + fixed
cur_time, VERIFIES the resulting proof, and writes
sample/client/test/show_vectors.json.  The JS prover
(sample/client/crypto/show.js) must reproduce the b64url output
byte-for-byte — sample/client/test/show_test.html runs the comparison in
any browser.

Run: python scripts/gen_show_vectors.py  [--out PATH]
"""

import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from crescent_tpu import client  # noqa: E402
from crescent_tpu.credentials import api  # noqa: E402
from crescent_tpu.credentials.circuits import JWTFrontend  # noqa: E402
from crescent_tpu.credentials.prep_inputs import (  # noqa: E402
    ProofSpec,
    parse_config,
    prepare_prover_inputs,
)
from crescent_tpu.utils import jwt as jwtutil  # noqa: E402
from crescent_tpu.utils import ark  # noqa: E402
from crescent_tpu.utils.serialize import to_b64url, from_b64url  # noqa: E402

CONFIG = {
    "alg": "RS256",
    "max_cred_len": 256,
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {"type": "string", "reveal": True, "max_claim_byte_len": 31},
}


def main() -> int:
    out_path = "sample/client/test/show_vectors.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    rng = random.Random(31337)
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
        frontend = JWTFrontend()
        print("zksetup (256-scale)...", flush=True)
        api.run_zksetup(base, frontend, rng)
        config = parse_config(open(paths.config).read())
        prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, pub)
        print("prove...", flush=True)
        cs = api.create_client_state(
            paths, prover_inputs, frontend,
            prover_aux=json.dumps(prover_aux), rng=rng,
        )

        client_state_b64url = to_b64url(ark.serialize(cs))
        range_pk = api.read_from_file(paths.range_pk)
        range_pk_b64url = to_b64url(ark.serialize(range_pk))
        io_locations_str = open(paths.io_locations).read()
        cur_time = exp - 86400

        cases = []
        for name, spec_json, seed in (
            ("reveal_email", '{"revealed": ["email"]}', b"crescent-show-vector-1"),
            ("reveal_none", '{"revealed": []}', b"crescent-show-vector-2"),
        ):
            proof_spec_b64url = to_b64url(spec_json.encode())
            print(f"show ({name})...", flush=True)
            show_b64url = client.create_show_proof_client(
                client_state_b64url,
                range_pk_b64url,
                io_locations_str,
                "crescent://over_18",
                "test-challenge-string",
                proof_spec_b64url,
                rng_seed=seed,
                cur_time=cur_time,
            )
            # verify before recording (the vector must be a VALID proof)
            vp = api.VerifierParams(
                vk=api.read_from_file(paths.groth16_vk),
                pvk=api.read_from_file(paths.groth16_pvk),
                range_vk=api.read_from_file(paths.range_vk),
                io_locations_str=io_locations_str,
                issuer_pem=pub,
                config_str=open(paths.config).read(),
            )
            import hashlib

            spec = ProofSpec.from_json(spec_json)
            spec.presentation_message = hashlib.sha256(
                b"test-challenge-string"
            ).digest()
            show = ark.deserialize(from_b64url(show_b64url), api.ShowProof)
            ok, _revealed = api.verify_show(
                vp, show, spec, now_seconds=cur_time + 10
            )
            assert ok, f"golden vector {name} does not verify!"
            cases.append(
                {
                    "name": name,
                    "client_state_b64url": client_state_b64url,
                    "range_pk_b64url": range_pk_b64url,
                    "io_locations_str": io_locations_str,
                    "disc_uid": "crescent://over_18",
                    "challenge": "test-challenge-string",
                    "proof_spec_b64url": proof_spec_b64url,
                    "rng_seed_b64url": to_b64url(seed),
                    "cur_time": cur_time,
                    "expected_show_proof_b64url": show_b64url,
                }
            )

        with open(out_path, "w") as f:
            json.dump({"version": 1, "cases": cases}, f)
        print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
