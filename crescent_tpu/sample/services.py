"""The four sample HTTP services (Python stdlib; reference: sample/*/src/main.rs).

Each service is a ThreadingHTTPServer wired to the crescent_tpu API over a
shared CachePaths directory — the same artifact-sharing model the reference
uses.  `run_all` starts every service; tests drive the full HTTP flow
(issue -> prepare -> status -> show -> verify) across real process-boundary
sockets, mirroring the end-to-end path in SURVEY.md §3.5.
"""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..credentials import api
from ..credentials.circuits import JWTFrontend, StubJWTFrontend
from ..credentials.prep_inputs import ProofSpec, parse_config, prepare_prover_inputs
from ..credentials.structs import IOLocations
from ..utils import jwt as jwtutil
from ..utils.serialize import from_b64url, to_b64url
from . import common


def _b64url_obj(obj) -> str:
    """b64url of ark CanonicalSerialize bytes (utils.rs:154-166
    write_to_b64url) — the wire format the reference services/extension use."""
    from ..utils import ark

    return to_b64url(ark.serialize(obj))


def _obj_b64url(s: str, typ):
    """Typed decode (utils.rs:167-177 read_from_b64url::<T>); never executes
    attacker-controlled bytes, unlike a pickle load."""
    from ..utils import ark

    return ark.deserialize(from_b64url(s), typ)


def _showdata_b64url(client_state, range_pk) -> str:
    """ShowData = (ClientState, RangeProofPK) struct bytes, b64url-wrapped
    (client_helper main.rs:259 getshowdata)."""
    from ..utils import ark

    return to_b64url(ark.ser_client_state(client_state) + ark.ser_range_proof_pk(range_pk))


class _JsonHandler(BaseHTTPRequestHandler):
    service = None  # subclass sets

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body, ctype="application/json"):
        data = body if isinstance(body, (bytes, bytearray)) else (
            body.encode() if isinstance(body, str) else json.dumps(body).encode()
        )
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(data)

    def _read_body(self):
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    @property
    def query(self):
        return dict(urllib.parse.parse_qsl(urllib.parse.urlparse(self.path).query))

    @property
    def route(self):
        return urllib.parse.urlparse(self.path).path


# ---------------------------------------------------------------------------
# issuer (:8001) — sample/issuer/src/main.rs
# ---------------------------------------------------------------------------

class IssuerService:
    """Entra-like RS256 JWT issuer with demo users alice/bob (main.rs:263)."""

    def __init__(self, base_path: str):
        self.paths = api.CachePaths(base_path)
        with open(self.paths.issuer_pem) as f:
            self.pub_pem = f.read()
        with open(self.paths.base + "issuer.prv") as f:
            self.priv_pem = f.read()
        self.users = {"alice": "password", "bob": "password"}

    def issue(self, username: str) -> str:
        claims = {
            "email": f"{username}@contoso.com",
            "exp": int(time.time()) + 365 * 86400,
            "family_name": username.capitalize(),
            "iat": int(time.time()),
            "iss": "https://issuer.example/",
            "sub": username,
            "tenant_ctry": "US",
        }
        return jwtutil.sign_jwt_rs256(claims, self.priv_pem)

    def jwks(self) -> dict:
        """/.well-known/jwks.json (main.rs:244)."""
        from cryptography.hazmat.primitives.serialization import load_pem_public_key

        nums = load_pem_public_key(self.pub_pem.encode()).public_numbers()
        def b64u(i: int, size: int) -> str:
            return base64.urlsafe_b64encode(i.to_bytes(size, "big")).decode().rstrip("=")

        return {
            "keys": [
                {
                    "kty": "RSA",
                    "use": "sig",
                    "kid": "crescent-sample-1",
                    "alg": "RS256",
                    "n": b64u(nums.n, 256),
                    "e": b64u(nums.e, 3),
                }
            ]
        }

    def handler(self):
        svc = self

        class H(_JsonHandler):
            def do_GET(self):
                if self.route == "/.well-known/jwks.json":
                    return self._send(200, svc.jwks())
                if self.route in ("/", "/login"):
                    return self._send(200, "<html><body>crescent sample issuer</body></html>", "text/html")
                if self.route == "/welcome":
                    user = self.query.get("user", "alice")
                    token = svc.issue(user)
                    page = f'<html><head><meta name="CRESCENT_JWT" content="{token}"></head><body>welcome {user}</body></html>'
                    return self._send(200, page, "text/html")
                self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.route == "/issue":
                    body = json.loads(self._read_body() or b"{}")
                    user = body.get("username", "alice")
                    if user not in svc.users:
                        return self._send(403, {"error": "unknown user"})
                    return self._send(200, {"jwt": svc.issue(user)})
                if self.route == "/login":
                    return self._send(200, {"ok": True})
                self._send(404, {"error": "not found"})

        return H


# ---------------------------------------------------------------------------
# setup service (:8002) — sample/setup_service/src/main.rs
# ---------------------------------------------------------------------------

class SetupService:
    def __init__(self, base_path: str):
        self.paths = api.CachePaths(base_path)

    def check_params(self) -> bool:
        import os

        for f in [
            self.paths.groth16_pvk, self.paths.groth16_vk, self.paths.range_vk,
            self.paths.io_locations, self.paths.prover_params, self.paths.range_pk,
        ]:
            if not os.path.exists(f):
                return False
        return True

    def handler(self):
        svc = self

        class H(_JsonHandler):
            def do_GET(self):
                if self.route.startswith("/prove_params/"):
                    rel = self.route[len("/prove_params/") :]
                    import os

                    full = os.path.realpath(os.path.join(svc.paths.base, rel))
                    if not full.startswith(os.path.realpath(svc.paths.base) + os.sep):
                        return self._send(403, {"error": "forbidden"})
                    try:
                        with open(full, "rb") as f:
                            return self._send(200, f.read(), "application/octet-stream")
                    except OSError:
                        return self._send(404, {"error": "no such file"})
                if self.route == "/show_params":
                    sp = api.ShowParams(range_pk=api.read_from_file(svc.paths.range_pk))
                    return self._send(200, _b64url_obj(sp), "text/plain")
                if self.route == "/verifier_params":
                    vp = api.VerifierParams(
                        vk=api.read_from_file(svc.paths.groth16_vk),
                        pvk=api.read_from_file(svc.paths.groth16_pvk),
                        range_vk=api.read_from_file(svc.paths.range_vk),
                        io_locations_str=open(svc.paths.io_locations).read(),
                        issuer_pem=open(svc.paths.issuer_pem).read(),
                        config_str=open(svc.paths.config).read(),
                    )
                    return self._send(200, _b64url_obj(vp), "text/plain")
                self._send(404, {"error": "not found"})

        return H


# ---------------------------------------------------------------------------
# client helper (:8003) — sample/client_helper/src/main.rs
# ---------------------------------------------------------------------------

class ClientHelperService:
    """Holds client state per credential; background-threads the slow prove
    (the reference tokio-spawns it, main.rs:178-243)."""

    def __init__(self, base_path: str, frontend=None):
        self.paths = api.CachePaths(base_path)
        self.creds: dict[str, dict] = {}
        self.lock = threading.Lock()
        self.frontend = frontend if frontend is not None else self._default_frontend()

    def _default_frontend(self):
        """The REAL statement circuit for the configured credtype (the stub
        is a protocol-test scaffold only; opt back in with
        CRESCENT_SAMPLE_FRONTEND=stub for demo-speed runs)."""
        import os

        if os.environ.get("CRESCENT_SAMPLE_FRONTEND") == "stub":
            return StubJWTFrontend()
        try:
            credtype = json.load(open(self.paths.config)).get("credtype")
        except FileNotFoundError:
            credtype = None
        if credtype == "mdl":
            from ..credentials.mdl import MDLFrontend

            return MDLFrontend(issuer_pem=open(self.paths.issuer_pem).read())
        return JWTFrontend()

    def prepare(self, cred: dict) -> str:
        token = cred["cred"]
        cred_uid = hashlib.sha256(token.encode()).hexdigest()[:16]
        with self.lock:
            if cred_uid in self.creds:
                return cred_uid
            self.creds[cred_uid] = {"status": "preparing"}

        def work():
            try:
                config = parse_config(open(self.paths.config).read())
                issuer_pem = open(self.paths.issuer_pem).read()
                pi, aux, _ = prepare_prover_inputs(config, token, issuer_pem)
                # hashed-claim preimages (the circuit recomputes digests)
                from ..credentials.prep_inputs import b64url_decode

                claims = json.loads(b64url_decode(token.split(".")[1]))
                for k, v in claims.items():
                    pi.setdefault(k, v if not isinstance(v, (dict, list)) else json.dumps(v))
                cs = api.create_client_state(
                    self.paths, pi, self.frontend, prover_aux=json.dumps(aux)
                )
                with self.lock:
                    self.creds[cred_uid] = {"status": "ready", "client_state": cs}
            except Exception as e:  # failure -> credential removed (main.rs:237-243)
                with self.lock:
                    self.creds[cred_uid] = {"status": "error", "error": str(e)}

        threading.Thread(target=work, daemon=True).start()
        return cred_uid

    def show(self, cred_uid: str, disc_uid: str, challenge: str, proof_spec_b64: str | None) -> str:
        with self.lock:
            entry = self.creds.get(cred_uid)
        if not entry or entry.get("status") != "ready":
            raise ValueError("credential not ready")
        cs = entry["client_state"]
        if not common.is_disc_uid_supported(disc_uid, cs.credtype):
            raise ValueError("unsupported disclosure uid")
        if proof_spec_b64:
            spec = ProofSpec.from_json(from_b64url(proof_spec_b64).decode())
        else:
            spec = ProofSpec.from_json(common.disc_uid_to_proof_spec(disc_uid))
        range_pk = api.read_from_file(self.paths.range_pk)
        io_locations = IOLocations.from_file(self.paths.io_locations)
        import copy

        sp = api.create_show_proof(copy.deepcopy(cs), range_pk, io_locations, spec)
        return _b64url_obj(sp)

    def handler(self):
        svc = self

        class H(_JsonHandler):
            def do_POST(self):
                if self.route == "/prepare":
                    body = json.loads(self._read_body())
                    uid = svc.prepare(body)
                    return self._send(200, {"cred_uid": uid})
                self._send(404, {"error": "not found"})

            def do_GET(self):
                q = self.query
                if self.route == "/status":
                    entry = svc.creds.get(q.get("cred_uid", ""))
                    # unknown credentials surface as "unknown" (main.rs:246-257)
                    return self._send(200, {"status": entry["status"] if entry else "unknown"})
                if self.route == "/getshowdata":
                    entry = svc.creds.get(q.get("cred_uid", ""))
                    if not entry or entry.get("status") != "ready":
                        return self._send(404, {"error": "not ready"})
                    range_pk = api.read_from_file(svc.paths.range_pk)
                    blob = _showdata_b64url(entry["client_state"], range_pk)
                    return self._send(200, blob, "text/plain")
                if self.route == "/show":
                    try:
                        proof = svc.show(
                            q.get("cred_uid", ""), q.get("disc_uid", ""),
                            q.get("challenge", ""), q.get("proof_spec"),
                        )
                        return self._send(200, proof, "text/plain")
                    except Exception as e:
                        return self._send(400, {"error": str(e)})
                if self.route == "/delete":
                    svc.creds.pop(q.get("cred_uid", ""), None)
                    return self._send(200, {"ok": True})
                self._send(404, {"error": "not found"})

        return H


# ---------------------------------------------------------------------------
# verifier (:8004) — sample/verifier/src/main.rs
# ---------------------------------------------------------------------------

class VerifierService:
    def __init__(self, base_path: str, setup_url: str):
        self.paths = api.CachePaths(base_path)
        self.setup_url = setup_url
        self.sessions: dict[str, float] = {}
        self.lock = threading.Lock()

    def _verifier_params(self) -> api.VerifierParams:
        import urllib.request

        with urllib.request.urlopen(self.setup_url + "/verifier_params") as r:
            return _obj_b64url(r.read().decode(), api.VerifierParams)

    def verify(self, proof_b64: str, proof_spec_json: str, challenge: str) -> tuple[bool, str]:
        # session/challenge replay protection (main.rs:299)
        with self.lock:
            if challenge in self.sessions:
                return False, "challenge replay"
            self.sessions[challenge] = time.time()
        vp = self._verifier_params()
        show_proof = _obj_b64url(proof_b64, api.ShowProof)
        spec = ProofSpec.from_json(proof_spec_json)
        return api.verify_show(vp, show_proof, spec)

    def handler(self):
        svc = self

        class H(_JsonHandler):
            def do_GET(self):
                if self.route in ("/", "/login"):
                    challenge = hashlib.sha256(str(time.time()).encode()).hexdigest()[:32]
                    page = (
                        "<html><head>"
                        f'<meta name="crescent_verify_url" content="/verify">'
                        f'<meta name="crescent_disclosure_uid" content="crescent://email_domain">'
                        f'<meta name="crescent_challenge" content="{challenge}">'
                        "</head><body>crescent sample verifier</body></html>"
                    )
                    return self._send(200, page, "text/html")
                self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.route == "/verify":
                    body = json.loads(self._read_body())
                    try:
                        # extension clients send proof_spec: null when the
                        # page has no crescent_proof_spec tag (content.js
                        # send-proof) — treat null like absent
                        ok, revealed = svc.verify(
                            body["proof"],
                            body.get("proof_spec") or api.DEFAULT_PROOF_SPEC,
                            body.get("challenge", ""),
                        )
                    except Exception as e:
                        return self._send(400, {"verified": False, "error": str(e)})
                    return self._send(200, {"verified": ok, "revealed": revealed})
                self._send(404, {"error": "not found"})

        return H


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def start_service(handler_cls, port: int) -> ThreadingHTTPServer:
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def run_all(base_path: str, ports: dict | None = None) -> dict:
    """Start all four services; returns {name: (server, port)}.

    Pass port 0 for any service to bind an ephemeral port (the actual port
    is read back from the socket) — keeps tests free of bind conflicts."""
    ports = dict(ports or {
        "issuer": common.ISSUER_PORT,
        "setup": common.SETUP_PORT,
        "helper": common.CLIENT_HELPER_PORT,
        "verifier": common.VERIFIER_PORT,
    })
    out = {}
    for name, svc in (
        ("issuer", lambda: IssuerService(base_path)),
        ("setup", lambda: SetupService(base_path)),
        ("helper", lambda: ClientHelperService(base_path)),
        ("verifier", lambda: VerifierService(
            base_path, f"http://127.0.0.1:{ports['setup']}"
        )),
    ):
        srv = start_service(svc().handler(), ports[name])
        ports[name] = srv.server_address[1]
        out[name] = (srv, ports[name])
    return out


if __name__ == "__main__":
    # standalone deployment on the reference ports (8001-8004), e.g. for
    # driving the sample/client browser extension by hand:
    #   python -m crescent_tpu.cli gen-fixtures zksetup --name rs256
    #   python -m crescent_tpu.sample.services test-vectors/rs256/
    import sys

    base = sys.argv[1] if len(sys.argv) > 1 else "test-vectors/rs256/"
    started = run_all(base)
    for name, (_, port) in started.items():
        print(f"{name}: http://127.0.0.1:{port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
