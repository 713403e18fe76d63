"""JWT input-preparation pipeline tests (prep_inputs.rs semantics)."""

import json

import pytest

from crescent_tpu.credentials import daystamp, prep_inputs
from crescent_tpu.credentials.prep_inputs import (
    ProofSpec,
    b64url_decode,
    create_proof_spec_internal,
    find_value_interval,
    pack_string_to_int,
    pack_string_to_int_unquoted,
    parse_config,
    prepare_prover_inputs,
    sha256_padding,
    unpack_int_to_string_unquoted,
)
from crescent_tpu.utils import jwt as jwtutil

RS256_CONFIG = json.dumps(
    {
        "alg": "RS256",
        "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
        "email": {
            "type": "string",
            "reveal": True,
            "max_claim_byte_len": 31,
            "reveal_domain_only": True,
        },
    }
)

CLAIMS = {
    "email": "matthew@example.com",
    "exp": 1759517346,
    "iat": 1728067746,
    "iss": "https://login.example.com/v2.0",
    "sub": "aaabbbbccccdddd",
}


@pytest.fixture(scope="module")
def issuer_keys():
    return jwtutil.generate_rsa_keypair(2048)


@pytest.fixture(scope="module")
def token(issuer_keys):
    priv, _ = issuer_keys
    return jwtutil.sign_jwt_rs256(CLAIMS, priv)


def test_sha256_padding_matches_hashlib_semantics():
    msg = list(b"hello world")
    padded = sha256_padding(msg)
    assert len(padded) % 64 == 0
    assert padded[len(msg)] == 0x80
    # length field is the bit length, big-endian
    assert int.from_bytes(bytes(padded[-8:]), "big") == len(msg) * 8


def test_limb_packing():
    n = (1 << 2047) + 12345
    limbs = prep_inputs.to_circom_ints_from_int(n, 121)
    assert len(limbs) == 17  # 2048/121 -> 17 limbs (BASELINE.md row)
    assert sum(l << (121 * i) for i, l in enumerate(limbs)) == n


def test_pack_unpack_string():
    packed = pack_string_to_int("matthew@example.com", 31)
    assert unpack_int_to_string_unquoted(packed) == "matthew@example.com"
    dom = pack_string_to_int_unquoted("example.com", 31)
    assert unpack_int_to_string_unquoted(dom) == "example.com"


def test_find_value_interval():
    msg = '{"a":1,"email":"x@y.com","exp":123456,"flag":true,"arr":[1,[2]],"obj":{"k":{}}}'
    l, r = find_value_interval(msg, '"email"', "string")
    assert msg[l:r] == '"email":"x@y.com"'
    l, r = find_value_interval(msg, '"exp"', "number")
    assert msg[l:r] == '"exp":123456'
    l, r = find_value_interval(msg, '"arr"', "array")
    assert msg[l:r] == '"arr":[1,[2]]'
    l, r = find_value_interval(msg, '"obj"', "object")
    assert msg[l:r] == '"obj":{"k":{}}'


def test_parse_config_defaults_and_validation():
    cfg = parse_config(RS256_CONFIG)
    assert cfg["max_cred_len"] == 2048
    assert cfg["device_bound"] is False
    # device_bound injects device_key claims (prep_inputs.rs:554-565)
    cfg2 = parse_config(json.dumps({"alg": "RS256", "device_bound": True}))
    assert cfg2["device_key_0"]["reveal"] is True
    # rounding to multiple of 64
    cfg3 = parse_config(json.dumps({"alg": "RS256", "max_cred_len": 1000}))
    assert cfg3["max_cred_len"] == 1024
    with pytest.raises(prep_inputs.PrepError):
        parse_config(json.dumps({"alg": "HS256"}))
    with pytest.raises(prep_inputs.PrepError):
        parse_config(json.dumps({"alg": "RS256", "e": {"type": "string", "reveal": True}}))


def test_prepare_prover_inputs(token, issuer_keys):
    _, pub = issuer_keys
    cfg = parse_config(RS256_CONFIG)
    pi, aux, pub_ios = prepare_prover_inputs(cfg, token, pub)

    assert len(pi["message"]) == 2048
    # message starts with the base64 header bytes
    h = token.split(".")[0]
    assert [int(x) for x in pi["message"][:5]] == [ord(c) for c in h[:5]]
    assert len(pi["signature"]) == 17
    assert len(pi["modulus"]) == 17
    assert pub_ios["modulus"] == pi["modulus"]
    # claim intervals point at the right substrings in the decoded payload
    hp = (
        b64url_decode(token.split(".")[0]).decode()
        + prep_inputs.base_64_decoded_header_padding(len(h))
        + b64url_decode(token.split(".")[1]).decode()
    )
    l, r = int(pi["exp_l"]), int(pi["exp_r"])
    assert hp[l:r] == f'"exp":{CLAIMS["exp"]}'
    assert pi["exp_value"] == str(CLAIMS["exp"])
    # email revealed domain-only
    assert unpack_int_to_string_unquoted(int(pi["email_value"])) == "example.com"


def test_prepare_rejects_bad_signature(token, issuer_keys):
    _, pub = issuer_keys
    cfg = parse_config(RS256_CONFIG)
    bad = token[:-6] + ("AAAAAA" if not token.endswith("AAAAAA") else "BBBBBB")
    with pytest.raises(Exception):
        prepare_prover_inputs(cfg, bad, pub)


def test_pem_to_inputs_matches_modulus(issuer_keys):
    _, pub = issuer_keys
    from cryptography.hazmat.primitives.serialization import load_pem_public_key

    limbs = prep_inputs.pem_to_inputs(pub)
    n = load_pem_public_key(pub.encode()).public_numbers().n
    assert sum(l << (121 * i) for i, l in enumerate(limbs)) == n


def test_proof_spec_internal():
    spec = ProofSpec(revealed=["email", "exp"])
    psi = create_proof_spec_internal(spec, RS256_CONFIG)
    assert psi.revealed == ["email", "exp"]
    assert psi.hashed == []
    assert psi.claim_types == {"exp": "number", "email": "string"}
    with pytest.raises(prep_inputs.PrepError):
        create_proof_spec_internal(ProofSpec(revealed=["nope"]), RS256_CONFIG)
    with pytest.raises(prep_inputs.PrepError):
        create_proof_spec_internal(ProofSpec(device_bound=True), RS256_CONFIG)


def test_daystamp_matches_cpython():
    import datetime

    for (y, m, d) in [(1900, 1, 1), (2000, 2, 29), (2026, 8, 17), (1999, 12, 31)]:
        assert daystamp.ymd_to_ordinal(y, m, d) == datetime.date(y, m, d).toordinal()
    # circuit table anchor (circuits-mdl/strings.circom:210)
    assert daystamp.days_before_year(1900) == 693595
    # age arithmetic
    days = daystamp.days_to_be_age(18, datetime.date(2026, 8, 17))
    assert days == (datetime.date(2026, 8, 17) - datetime.date(2008, 8, 17)).days


def test_io_locations_from_circom_sym():
    """Golden circom main.sym (docs.circom.io sym format: #s,#w,#c,fullname)
    through the run_setup.sh:176 awk-equivalent filter."""
    from crescent_tpu.credentials.structs import IOLocations

    sym = "\n".join([
        "1,1,0,main.digest_248",            # public output, wire 1
        "2,2,0,main.exp_value",             # public output, wire 2
        "3,3,1,main.modulus[0]",            # public input (issuer key limb)
        "4,-1,1,main.sha.t1[0]",            # optimized away -> dropped
        "5,17,2,main.internal_wire",        # beyond the public window -> dropped
        "malformed line",                    # ignored
    ])
    io = IOLocations.from_circom_sym(sym, num_public_ios=3)
    assert io.public_io_locations == {
        "digest_248": 1, "exp_value": 2, "modulus[0]": 3,
    }
    assert io.get_public_key_indices() == [2]
    # roundtrip through the csv wire format the Rust side reads
    assert IOLocations.from_str(io.to_str()).public_io_locations == io.public_io_locations
