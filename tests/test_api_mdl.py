"""End-to-end mdl1: device-bound mDL with selective disclosure + age range.

Equivalent of end_to_end_test_mdl1 (creds/src/lib.rs:964): ES256 issuer,
revealed resident_state/height, hashed family_name/given_name, committed
birth_date with an 18-years range proof, device binding, freshness.
"""

import hashlib
import json
import random
import tempfile

from crescent_tpu.credentials import api
from crescent_tpu.credentials.device import TestDevice
from crescent_tpu.credentials.mdl import (
    MDLFrontend,
    generate_es256_issuer_keypair,
    prepare_mdl_prover_inputs,
)
from crescent_tpu.credentials.prep_inputs import ProofSpec, parse_config
from crescent_tpu.credentials.structs import IOLocations

CONFIG = {
    "credtype": "mdl",
    "alg": "ES256",
    "device_bound": True,
    "max_cred_len": 1792,
    "birth_date": {"type": "date", "reveal": True, "max_claim_byte_len": 31},
    "resident_state": {"type": "string", "reveal": True, "max_claim_byte_len": 31},
    "height": {"type": "integer", "reveal": True, "max_claim_byte_len": 31},
    "family_name": {"type": "string", "reveal_digest": True, "max_claim_byte_len": 62},
    "given_name": {"type": "string", "reveal_digest": True, "max_claim_byte_len": 62},
}


def test_end_to_end_mdl1():
    rng = random.Random(1618)
    dev = TestDevice(rng=rng)
    with tempfile.TemporaryDirectory() as base:
        with open(base + "/config.json", "w") as f:
            json.dump(CONFIG, f)
        issuer_prv, issuer_pub = generate_es256_issuer_keypair()
        with open(base + "/issuer.pub", "w") as f:
            f.write(issuer_pub)

        config = parse_config(open(base + "/config.json").read())
        prover_inputs, prover_aux = prepare_mdl_prover_inputs(
            config,
            {
                "birth_date": "1990-05-17",
                "resident_state": "WA",
                "height": 170,
                "family_name": "Example",
                "given_name": "Alice",
            },
            valid_until="2033-01-01",
            issuer_pem=issuer_pub,
            device_pub_pem=dev.public_pem(),
            issuer_priv_pem=issuer_prv,
            rng=rng,
        )

        paths = api.CachePaths(base)
        frontend = MDLFrontend(issuer_pub)
        api.run_zksetup(base, frontend, rng)
        cs = api.create_client_state(
            paths, prover_inputs, frontend, prover_aux=json.dumps(prover_aux),
            credtype="mdl", rng=rng,
        )
        api.write_to_file(cs, paths.client_state)

        cs2 = api.read_from_file(paths.client_state)
        range_pk = api.read_from_file(paths.range_pk)
        io_locations = IOLocations.from_file(paths.io_locations)
        pm_digest = hashlib.sha256(b"mdl challenge").digest()
        spec = ProofSpec.from_json(json.dumps({
            "revealed": ["resident_state", "height"],
            "range_over_year": {"birth_date": 18},
            "device_bound": True,
            "presentation_message": list(pm_digest),
        }))
        # hashed attributes ride the same spec (mdl1 proof_spec.json reveals
        # family_name/given_name as digests via config reveal_digest)
        spec.revealed += ["family_name", "given_name"]

        device_sig = dev.sign(pm_digest)
        show = api.create_show_proof_mdl(
            cs2, range_pk, spec, io_locations,
            device_signature=device_sig, rng=rng,
        )
        api.write_to_file(show, paths.show_proof)

        vp = api.VerifierParams(
            vk=api.read_from_file(paths.groth16_vk),
            pvk=api.read_from_file(paths.groth16_pvk),
            range_vk=api.read_from_file(paths.range_vk),
            io_locations_str=open(paths.io_locations).read(),
            issuer_pem=issuer_pub,
            config_str=open(paths.config).read(),
        )
        show2 = api.read_from_file(paths.show_proof)
        # pin the verification time: the CPU-backed device prove can take
        # longer than the 300 s freshness window in this test environment
        now = show2.cur_time + 10
        ok, revealed = api.verify_show_mdl(vp, show2, spec, now_seconds=now)
        assert ok, f"mdl show proof must verify: {revealed}"
        rev = json.loads(revealed)
        assert rev["resident_state_value"] == "WA"
        assert rev["height_value"] == "170"
        assert rev["family_name"] == "Example"
        assert rev["given_name"] == "Alice"

        # stale proof rejected (freshness window)
        import copy

        stale = copy.deepcopy(show2)
        stale.cur_time -= 1000
        ok_stale, _ = api.verify_show_mdl(vp, stale, spec, now_seconds=now)
        assert not ok_stale

        # tampered device proof rejected
        bad = copy.deepcopy(show2)
        blob = bytearray(bad.device_proof.pi2)
        blob[len(blob) // 2] ^= 1
        bad.device_proof.pi2 = bytes(blob)
        ok_bad, _ = api.verify_show_mdl(vp, bad, spec, now_seconds=now)
        assert not ok_bad

        # wrong preimage for a hashed attribute rejected
        bad2 = copy.deepcopy(show2)
        pre = json.loads(bad2.revealed_preimages)
        pre["family_name"] = "Mallory"
        bad2.revealed_preimages = json.dumps(pre)
        ok_bad2, _ = api.verify_show_mdl(vp, bad2, spec, now_seconds=now)
        assert not ok_bad2
