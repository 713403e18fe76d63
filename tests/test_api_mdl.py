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


def test_x509_chain_issuance():
    """gen_x509_cert_chain.sh semantics + x5chain in the IssuerAuth
    unprotected header (mdl-gen.rs:135-150, RFC 9360 label 33)."""
    import base64

    from cryptography import x509
    from cryptography.hazmat.primitives.asymmetric import ec, padding  # noqa: F401
    from cryptography.hazmat.primitives.serialization import Encoding

    from crescent_tpu.credentials.mdl import gen_x509_cert_chain, issue_mdl
    from crescent_tpu.credentials.prep_inputs import parse_config

    priv, pub, chain_pem = gen_x509_cert_chain()
    certs = x509.load_pem_x509_certificates(chain_pem.encode())
    assert len(certs) == 3
    leaf, ca, root = certs
    # chain-of-signatures: root self-signed, CA by root, leaf by CA
    root.verify_directly_issued_by(root)
    ca.verify_directly_issued_by(root)
    leaf.verify_directly_issued_by(ca)
    # parameters from the reference script
    assert isinstance(leaf.public_key().curve, ec.SECP256R1)
    assert isinstance(ca.public_key().curve, ec.SECP384R1)
    assert isinstance(root.public_key().curve, ec.SECP521R1)
    assert leaf.subject.rfc4514_string() == "CN=NY DMV Test Issuer"
    assert ca.subject.rfc4514_string() == "CN=NY DMV Test CA"
    assert root.subject.rfc4514_string() == "CN=NY DMV Test Root CA"
    # leaf pubkey matches the returned issuer.pub
    from cryptography.hazmat.primitives.serialization import (
        PublicFormat, load_pem_public_key,
    )

    assert leaf.public_key().public_bytes(
        Encoding.PEM, PublicFormat.SubjectPublicKeyInfo
    ).decode() == pub

    # issuance embeds the chain into IssuerAuth's unprotected header
    config = parse_config(json.dumps({
        "alg": "ES256", "credtype": "mdl", "max_cred_len": 1792,
        "family_name": {"type": "string", "reveal": True,
                        "max_claim_byte_len": 62},
    }))
    pi, aux = issue_mdl(
        config, {"family_name": "Doe"}, "2033-01-01", priv,
        device_pub_pem=None, rng=random.Random(3), x5chain_pem=chain_pem,
    )
    ia = base64.urlsafe_b64decode(aux["issuer_auth"])
    # minimal CBOR decoder (enough for COSE_Sign1 + x5chain structures)
    def dec(b, i=0):
        mt, arg = b[i] >> 5, b[i] & 0x1F
        i += 1
        if arg == 24:
            arg, i = b[i], i + 1
        elif arg == 25:
            arg, i = int.from_bytes(b[i:i + 2], "big"), i + 2
        elif arg == 26:
            arg, i = int.from_bytes(b[i:i + 4], "big"), i + 4
        if mt == 0:
            return arg, i
        if mt == 1:
            return -1 - arg, i
        if mt in (2, 3):
            v = b[i:i + arg]
            return (v if mt == 2 else v.decode()), i + arg
        if mt == 4:
            out = []
            for _ in range(arg):
                v, i = dec(b, i)
                out.append(v)
            return out, i
        if mt == 5:
            out = {}
            for _ in range(arg):
                k, i = dec(b, i)
                v, i = dec(b, i)
                out[k] = v
            return out, i
        if mt == 6:
            v, i = dec(b, i)
            return ("tag", arg, v), i
        raise AssertionError(f"cbor mt {mt}")

    cose, end = dec(ia)
    assert end == len(ia)
    protected, unprotected, payload, sig = cose
    assert protected == bytes([0xA1, 0x01, 0x26])
    # x5chain: label 33, DER certs leaf-first, verbatim
    ders = [c.public_bytes(Encoding.DER) for c in certs]
    assert unprotected == {33: ders}
    # payload is the tag24-wrapped MSO
    tag = dec(payload)[0]
    assert tag[0] == "tag" and tag[1] == 24
    # signature over the Sig_structure verifies with the leaf key
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric.utils import (
        encode_dss_signature,
    )
    from crescent_tpu.utils import cbor as _c

    tbs = (b"\x84" + _c.encode("Signature1") + _c.encode(protected)
           + _c.encode(b"") + _c.encode(payload))
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    leaf.public_key().verify(
        encode_dss_signature(r, s), tbs, ec.ECDSA(hashes.SHA256())
    )


def test_x509_chain_reuses_existing_key():
    from cryptography.hazmat.primitives.serialization import (
        load_pem_private_key,
    )

    from crescent_tpu.credentials.mdl import (
        gen_x509_cert_chain, generate_es256_issuer_keypair,
    )

    priv0, pub0 = generate_es256_issuer_keypair()
    priv, pub, chain = gen_x509_cert_chain(issuer_priv_pem=priv0)
    assert pub == pub0
