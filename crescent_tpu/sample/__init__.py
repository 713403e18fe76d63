"""Sample 4-service deployment (reference: sample/, SURVEY.md §2e).

Ports and routes mirror the reference Rocket services:
  issuer :8001  — login/welcome pages, POST /issue, /.well-known/jwks.json
  setup  :8002  — /prove_params/<file>, /show_params, /verifier_params
  helper :8003  — POST /prepare, GET /status|/getshowdata|/show|/delete
  verifier :8004 — POST /verify, demo pages with crescent meta tags
"""
