"""HTTP end-to-end across the 4 sample services (SURVEY.md §3.5 flow):

  issuer /welcome meta tag -> helper /prepare (async prove) -> /status poll
  -> helper /show -> verifier /verify, all over real localhost sockets."""

import json
import random
import re
import time
import urllib.request

import pytest

from crescent_tpu.credentials import api
from crescent_tpu.credentials.circuits import JWTFrontend
from crescent_tpu.sample import common, services
from crescent_tpu.utils import jwt as jwtutil


def _get(url: str, timeout: int = 300) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


def _post(url: str, obj) -> dict:
    req = urllib.request.Request(
        url, json.dumps(obj).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sample"))
    rng = random.Random(1)
    with open(base + "/config.json", "w") as f:
        json.dump(
            {
                "alg": "RS256",
                "max_cred_len": 256,
                "exp": {"type": "number", "max_claim_byte_len": 31, "reveal": True},
                "email": {
                    "type": "string", "reveal": True,
                    "max_claim_byte_len": 31, "reveal_domain_only": True,
                },
            },
            f,
        )
    priv, pub = jwtutil.generate_rsa_keypair(2048)
    with open(base + "/issuer.pub", "w") as f:
        f.write(pub)
    with open(base + "/issuer.prv", "w") as f:
        f.write(priv)
    api.run_zksetup(base, JWTFrontend(), rng)
    # port 0 = ephemeral: no bind conflicts across parallel/stale runs
    servers = services.run_all(
        base, {"issuer": 0, "setup": 0, "helper": 0, "verifier": 0}
    )
    ports = {name: port for name, (_srv, port) in servers.items()}
    yield ports
    for srv, _ in servers.values():
        srv.shutdown()


def test_schema_registry():
    assert common.cred_type_from_schema("jwt_sd") == "jwt"
    assert common.is_disc_supported_by_schema("crescent://over_18", "mdl_1")
    assert not common.is_disc_supported_by_schema("crescent://over_18", "jwt_sd")
    assert common.disc_uid_to_age("crescent://over_21") == 21


def test_http_end_to_end(stack):
    ports = stack
    issuer = f"http://127.0.0.1:{ports['issuer']}"
    helper = f"http://127.0.0.1:{ports['helper']}"
    verifier = f"http://127.0.0.1:{ports['verifier']}"
    setup = f"http://127.0.0.1:{ports['setup']}"

    # issuer serves JWKS and a page with the CRESCENT_JWT meta tag
    jwks = json.loads(_get(issuer + "/.well-known/jwks.json"))
    assert jwks["keys"][0]["kty"] == "RSA"
    page = _get(issuer + "/welcome?user=alice").decode()
    token = re.search(r'name="CRESCENT_JWT" content="([^"]+)"', page).group(1)

    # setup service exposes parameter blobs
    assert len(_get(setup + "/verifier_params")) > 100
    assert len(_get(setup + "/show_params")) > 100

    # client helper: prepare (async), poll status until ready
    uid = _post(helper + "/prepare", {"cred": token, "schema_uid": "jwt_corporate_1"})["cred_uid"]
    deadline = time.time() + 600
    while time.time() < deadline:
        st = json.loads(_get(helper + f"/status?cred_uid={uid}"))["status"]
        if st == "ready":
            break
        assert st in ("preparing",), st
        time.sleep(2)
    assert st == "ready"

    # unknown credential -> "unknown" (client_helper main.rs:246-257)
    assert json.loads(_get(helper + "/status?cred_uid=nope"))["status"] == "unknown"

    # show via helper, then verify via verifier service
    proof = _get(
        helper + f"/show?cred_uid={uid}&disc_uid=crescent://email_domain&challenge=c1"
    ).decode()
    res = _post(
        verifier + "/verify",
        {"proof": proof, "proof_spec": '{"revealed": ["email"]}', "challenge": "c1"},
    )
    assert res["verified"] is True
    assert json.loads(res["revealed"])["email_value"] == "contoso.com"

    # challenge replay is rejected (verifier main.rs:299)
    res2 = _post(
        verifier + "/verify",
        {"proof": proof, "proof_spec": '{"revealed": ["email"]}', "challenge": "c1"},
    )
    assert res2["verified"] is False

    # unsupported disclosure uid rejected by helper
    try:
        _get(helper + f"/show?cred_uid={uid}&disc_uid=crescent://over_18&challenge=c2")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised

    # delete
    assert json.loads(_get(helper + f"/delete?cred_uid={uid}"))["ok"]
    assert json.loads(_get(helper + f"/status?cred_uid={uid}"))["status"] == "unknown"


# ---------------------------------------------------------------------------
# Browser-extension smoke (sample/client/): no JS runtime ships in this
# image, so the test drives the extension's PROTOCOL — the exact meta-tag
# scanning semantics of content.js (name= and attribute-style tags) over
# the real issuer page and the checked-in test pages, then the
# import -> prepare -> disclose -> POST-to-verifier flow background.js
# performs — against live services.  Reference flow:
# sample/client/src/content.ts:14-37 + background orchestration.
# ---------------------------------------------------------------------------

import os

_CLIENT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sample", "client",
)


def _meta_tags(html: str) -> list[dict]:
    from html.parser import HTMLParser

    class P(HTMLParser):
        def __init__(self):
            super().__init__()
            self.metas = []

        def handle_starttag(self, tag, attrs):
            if tag == "meta":
                self.metas.append({k: (v or "") for k, v in attrs})

    p = P()
    p.feed(html)
    return p.metas


def _get_named_meta(metas, name):
    """content.js getNamedMeta: <meta name=... content=...>."""
    for m in metas:
        if m.get("name") == name:
            return m.get("content", "")
    return ""


def _get_meta_tag(metas, name):
    """content.js getMetaTag: attribute-style first, then name=."""
    for m in metas:
        if name in m:
            return m[name]
    return _get_named_meta(metas, name)


def test_extension_manifest_and_sources():
    manifest = json.load(open(os.path.join(_CLIENT_DIR, "manifest.json")))
    assert manifest["manifest_version"] == 3
    files = {manifest["background"]["service_worker"]}
    for cs in manifest["content_scripts"]:
        files.update(cs["js"])
    files.add(manifest["action"]["default_popup"])
    for f in files:
        assert os.path.exists(os.path.join(_CLIENT_DIR, f)), f
    # the meta names the content script scans are the protocol surface
    src = open(os.path.join(_CLIENT_DIR, "content.js")).read()
    for name in (
        "CRESCENT_JWT", "CRESCENT_SCHEMA_UID", "crescent_verify_url",
        "crescent_disclosure_uid", "crescent_challenge", "crescent_proof_spec",
    ):
        assert name in src, name
    # in-browser show wiring (background.js localShowProof mode): the
    # service worker must load the crypto modules and use the splitter the
    # golden-vector pages exercise
    bg = open(os.path.join(_CLIENT_DIR, "background.js")).read()
    for frag in (
        "./crypto/show.js", "splitShowData", "createShowProofClient",
        "clientHelperShowProof", "getIoLocations",
    ):
        assert frag in bg, frag
    show_src = open(os.path.join(_CLIENT_DIR, "crypto", "show.js")).read()
    assert "splitShowData," in show_src  # exported on CrescentShow


@pytest.fixture(scope="module")
def prepared(stack):
    """content.js scan + background.js handlePrepare: import the issuer
    page's credential and run the slow /prepare once for the module."""
    ports = stack
    issuer = f"http://127.0.0.1:{ports['issuer']}"
    helper = f"http://127.0.0.1:{ports['helper']}"

    # -- content.js scanForCredential on the real issuer page --------------
    page = _get(issuer + "/welcome?user=alice").decode()
    metas = _meta_tags(page)
    jwt = _get_named_meta(metas, "CRESCENT_JWT")
    assert jwt
    schema_uid = _get_named_meta(metas, "CRESCENT_SCHEMA_UID") or "jwt_corporate_1"

    # -- background.js handlePrepare: POST /prepare + /status poll ---------
    uid = _post(helper + "/prepare", {"cred": jwt, "schema_uid": schema_uid})[
        "cred_uid"
    ]
    deadline = time.time() + 600
    status = None
    while time.time() < deadline:
        status = json.loads(_get(helper + f"/status?cred_uid={uid}"))["status"]
        if status == "ready":
            break
        time.sleep(2)
    assert status == "ready"
    return uid


def test_extension_flow_against_live_services(stack, prepared):
    ports = stack
    uid = prepared

    # the checked-in issuer test page exposes the same tag names
    ipage = open(os.path.join(_CLIENT_DIR, "test", "issuer.html")).read()
    imetas = _meta_tags(ipage)
    assert _get_named_meta(imetas, "CRESCENT_JWT")
    assert _get_named_meta(imetas, "CRESCENT_SCHEMA_UID") == "jwt_corporate_1"

    helper = f"http://127.0.0.1:{ports['helper']}"

    # -- content.js queryDisclosureRequest on the test verifier page -------
    vpage = open(os.path.join(_CLIENT_DIR, "test", "verifier.html")).read()
    vmetas = _meta_tags(vpage)
    url = _get_meta_tag(vmetas, "crescent_verify_url")
    disc_uid = _get_meta_tag(vmetas, "crescent_disclosure_uid")
    challenge = _get_meta_tag(vmetas, "crescent_challenge")
    proof_spec = _get_meta_tag(vmetas, "crescent_proof_spec") or None
    assert url and disc_uid and challenge  # the content.js gating condition

    # -- background.js handleDisclose: GET /show -> POST to the page URL ---
    qs = f"cred_uid={uid}&disc_uid={urllib.parse.quote(disc_uid)}&challenge={challenge}"
    proof = _get(helper + f"/show?{qs}").decode()
    # the static page pins :8004; rebase onto the live ephemeral port
    target = url.replace(
        "localhost:8004", f"127.0.0.1:{ports['verifier']}"
    )
    res = _post(
        target,
        {"proof": proof, "proof_spec": proof_spec, "challenge": challenge},
    )
    assert res["verified"] is True
    assert json.loads(res["revealed"])["email_value"] == "contoso.com"


def test_in_browser_show_mode(stack, prepared):
    """The extension's clientHelperShowProof=false mode (background.js
    localShowProof): cache ShowData + io_locations after prepare, split the
    blob at the ark boundary (crypto/show.js splitShowData), prove the show
    IN-CLIENT with client.py (the JS prover's golden-vector-locked mirror,
    wasm_lib.rs:46 semantics), and have the live verifier accept it."""
    from crescent_tpu import client
    from crescent_tpu.utils import ark
    from crescent_tpu.utils.serialize import from_b64url, to_b64url

    ports = stack
    helper = f"http://127.0.0.1:{ports['helper']}"
    setup = f"http://127.0.0.1:{ports['setup']}"
    verifier = f"http://127.0.0.1:{ports['verifier']}"
    uid = prepared

    # background.js handlePrepare caches these once, after /status=ready
    blob = _get(helper + f"/getshowdata?cred_uid={uid}").decode()
    io_locations_str = _get(setup + "/prove_params/io_locations.sym").decode()
    assert "email_domain" in io_locations_str or "email" in io_locations_str

    # crypto/show.js splitShowData: one b64url blob -> client_state | range_pk
    raw = from_b64url(blob)
    r = ark.Reader(raw)
    cs = ark.deser_client_state(r)
    assert 0 < r.pos < len(raw)
    assert cs.credtype == "jwt"  # mdl/device-bound would fall back to /show
    cs_b64, pk_b64 = to_b64url(raw[: r.pos]), to_b64url(raw[r.pos :])

    # content.js queryDisclosureRequest on a LIVE verifier page (fresh
    # challenge — the static test page's was consumed by the flow test)
    vpage = _get(verifier + "/login").decode()
    vmetas = _meta_tags(vpage)
    disc_uid = _get_meta_tag(vmetas, "crescent_disclosure_uid")
    challenge = _get_meta_tag(vmetas, "crescent_challenge")
    verify_url = verifier + _get_meta_tag(vmetas, "crescent_verify_url")

    # background.js defaultProofSpec(disc_uid) when the page has no
    # crescent_proof_spec meta (sample/common.py is the Python source)
    spec_b64 = to_b64url(common.disc_uid_to_proof_spec(disc_uid).encode())

    proof = client.create_show_proof_client(
        cs_b64, pk_b64, io_locations_str, disc_uid, challenge, spec_b64
    )

    # content.js send-proof -> POST to the page's verify URL
    res = _post(
        verify_url, {"proof": proof, "proof_spec": None, "challenge": challenge}
    )
    assert res["verified"] is True
    assert json.loads(res["revealed"])["email_value"] == "contoso.com"
