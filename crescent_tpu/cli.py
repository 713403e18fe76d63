"""crescent CLI: zksetup / prove / show / verify (+ gen-fixtures).

Mirrors creds/src/main.rs:52-93: subcommands share state through the
`test-vectors/<name>/` directory layout (CachePaths).  `gen-fixtures`
replaces the reference's run_setup.sh:96-126 sample-credential generation
(random issuer key + deterministic-structure JWT).

Usage:
  python -m crescent_tpu.cli gen-fixtures --name rs256
  python -m crescent_tpu.cli zksetup --name rs256
  python -m crescent_tpu.cli prove   --name rs256
  python -m crescent_tpu.cli show    --name rs256
  python -m crescent_tpu.cli verify  --name rs256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from .credentials import api
from .credentials.circuits import StubJWTFrontend
from .credentials.prep_inputs import ProofSpec, parse_config, prepare_prover_inputs
from .credentials.structs import IOLocations

DEFAULT_BASE = "test-vectors"

RS256_DEFAULT_CONFIG = {
    "alg": "RS256",
    "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
    "email": {
        "type": "string",
        "reveal": True,
        "max_claim_byte_len": 31,
        "reveal_domain_only": True,
    },
}


def _paths(args) -> api.CachePaths:
    base = os.path.join(args.base, args.name)
    os.makedirs(base, exist_ok=True)
    return api.CachePaths(base)


def cmd_gen_fixtures(args):
    from .utils import jwt as jwtutil

    paths = _paths(args)
    if not os.path.exists(paths.config):
        with open(paths.config, "w") as f:
            json.dump(RS256_DEFAULT_CONFIG, f, indent=2)
    priv, pub = jwtutil.generate_rsa_keypair(2048)
    with open(paths.issuer_pem, "w") as f:
        f.write(pub)
    with open(paths.base + "issuer.prv", "w") as f:
        f.write(priv)
    claims = {
        "email": "alice@contoso.com",
        "exp": int(time.time()) + 365 * 86400,
        "iat": int(time.time()),
        "iss": "https://issuer.example/",
        "sub": "alice",
        "tenant_ctry": "US",
    }
    token = jwtutil.sign_jwt_rs256(claims, priv)
    with open(paths.jwt, "w") as f:
        f.write(token)
    if not os.path.exists(paths.proof_spec):
        with open(paths.proof_spec, "w") as f:
            f.write(api.DEFAULT_PROOF_SPEC)
    print(f"fixtures written under {paths.base}")
    return 0


def cmd_zksetup(args):
    paths = _paths(args)
    t0 = time.time()
    api.run_zksetup(paths.base, StubJWTFrontend())
    print(f"zksetup completed in {time.time()-t0:.1f}s; artifacts in {paths.cache}")
    return 0


def cmd_prove(args):
    paths = _paths(args)
    with open(paths.config) as f:
        config = parse_config(f.read())
    with open(paths.jwt) as f:
        token = f.read().strip()
    with open(paths.issuer_pem) as f:
        issuer_pem = f.read()
    t0 = time.time()
    prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, issuer_pem)
    cs = api.create_client_state(
        paths, prover_inputs, StubJWTFrontend(), prover_aux=json.dumps(prover_aux)
    )
    api.write_to_file(cs, paths.client_state)
    print(f"Proving time: {time.time()-t0:.1f}s; client state written to {paths.client_state}")
    return 0


def cmd_show(args):
    paths = _paths(args)
    client_state = api.read_from_file(paths.client_state)
    pp = api.read_from_file(paths.prover_params)
    range_pk = api.read_from_file(paths.range_pk)
    io_locations = IOLocations.from_file(paths.io_locations)
    with open(paths.proof_spec) as f:
        spec = ProofSpec.from_json(f.read())
    if args.presentation_message:
        spec.presentation_message = args.presentation_message.encode()
    t0 = time.time()
    sp = api.create_show_proof(client_state, range_pk, io_locations, spec)
    api.write_to_file(sp, paths.show_proof)
    blob = open(paths.show_proof, "rb").read()
    print(f"show completed in {time.time()-t0:.1f}s; proof size {len(blob)} bytes -> {paths.show_proof}")
    return 0


def cmd_verify(args):
    paths = _paths(args)
    vp = api.VerifierParams(
        vk=api.read_from_file(paths.groth16_vk),
        pvk=api.read_from_file(paths.groth16_pvk),
        range_vk=api.read_from_file(paths.range_vk),
        io_locations_str=open(paths.io_locations).read(),
        issuer_pem=open(paths.issuer_pem).read(),
        config_str=open(paths.config).read(),
    )
    show_proof = api.read_from_file(paths.show_proof)
    with open(paths.proof_spec) as f:
        spec = ProofSpec.from_json(f.read())
    t0 = time.time()
    ok, revealed = api.verify_show(vp, show_proof, spec)
    print(f"Verification time: {time.time()-t0:.2f}s")
    print(f"verify: {'PASS' if ok else 'FAIL'}")
    if ok:
        print(f"revealed: {revealed}")
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(prog="crescent", description=__doc__)
    p.add_argument("--base", default=DEFAULT_BASE, help="base directory for parameter sets")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("gen-fixtures", cmd_gen_fixtures),
        ("zksetup", cmd_zksetup),
        ("prove", cmd_prove),
        ("show", cmd_show),
        ("verify", cmd_verify),
    ]:
        sp = sub.add_parser(name)
        sp.add_argument("--name", default="rs256")
        if name == "show":
            sp.add_argument("--presentation-message", default=None)
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
