"""Schema/disclosure UID registry (sample/setup_service/src/common.rs:20-66)."""

from __future__ import annotations

SCHEMA_UIDS = ["jwt_corporate_1", "jwt_sd", "mdl_1"]

ISSUER_PORT = 8001
SETUP_PORT = 8002
CLIENT_HELPER_PORT = 8003
VERIFIER_PORT = 8004


def is_disc_uid_supported(disc_uid: str, cred_type: str) -> bool:
    if cred_type == "jwt":
        return disc_uid in ("crescent://email_domain", "crescent://selective_disclosure")
    if cred_type == "mdl":
        return disc_uid in ("crescent://over_18", "crescent://over_21", "crescent://over_65")
    return False


def is_disc_supported_by_schema(disc: str, schema: str) -> bool:
    return (schema, disc) in {
        ("jwt_corporate_1", "crescent://email_domain"),
        ("jwt_sd", "crescent://selective_disclosure"),
        ("mdl_1", "crescent://over_18"),
        ("mdl_1", "crescent://over_21"),
        ("mdl_1", "crescent://over_65"),
    }


def disc_uid_to_age(disc_uid: str) -> int:
    ages = {
        "crescent://over_18": 18,
        "crescent://over_21": 21,
        "crescent://over_65": 65,
    }
    if disc_uid not in ages:
        raise ValueError("disc_uid_to_age: invalid disclosure uid")
    return ages[disc_uid]


def cred_type_from_schema(schema_uid: str) -> str:
    kinds = {"jwt_corporate_1": "jwt", "jwt_sd": "jwt", "mdl_1": "mdl"}
    if schema_uid not in kinds:
        raise ValueError("cred_type_from_schema: Unknown schema UID")
    return kinds[schema_uid]


def disc_uid_to_proof_spec(disc_uid: str) -> str:
    """Default proof spec per disclosure UID (client extension semantics)."""
    if disc_uid == "crescent://email_domain":
        return '{"revealed": ["email"]}'
    if disc_uid == "crescent://selective_disclosure":
        return '{"revealed": ["family_name"]}'
    if disc_uid.startswith("crescent://over_"):
        age = disc_uid_to_age(disc_uid)
        return '{"revealed": [], "range_over_year": {"birth_date": %d}}' % age
    raise ValueError(f"unknown disclosure uid {disc_uid}")
