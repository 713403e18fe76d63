"""Statement circuits for the credential pipeline (native frontend).

Reference equivalents: circuit_setup/circuits/*.circom generated per
config.json by prepare_setup.py.  The full JWT statement is
   SHA-256(padded token) -> RSA-65537 verify -> base64 decode -> claim
   matching/packing (match_claim.circom) -> claim digests,
built from the gadget library in crescent_tpu.r1cs.builder and the sha256
gadget (crescent_tpu.r1cs.sha256).

Status: `StubJWTFrontend` below lays out the exact public-IO surface of the
rs256 parameter set (digests, modulus limbs, claim values — io_locations
names match structs.rs expectations) so the whole zksetup/prove/show/verify
pipeline runs end-to-end, but its constraints DO NOT yet enforce the
signature/hash statement — each public IO is only bound to the prover's
witness copy.  It is a scaffold for protocol/API testing, NOT a sound
credential statement; the sha256/rsa/base64/match_claim gadget circuits
replace it (tracked as the main round-2 item in PARITY.md).
"""

from __future__ import annotations

import hashlib

from ..core.fields import BN254_FR as R
from ..r1cs.builder import LC, ConstraintSystem
from .api import CircuitFrontend, bits_to_num
from .prep_inputs import CRESCENT_CONFIG_KEYS, CIRCOM_RS256_LIMB_BITS
from .structs import IOLocations


class StubJWTFrontend(CircuitFrontend):
    """Public-IO-faithful placeholder statement for the rs256 family."""

    def _claim_names(self, config: dict):
        revealed, hashed = [], []
        for name, entry in config.items():
            if name in CRESCENT_CONFIG_KEYS:
                continue
            if entry.get("reveal_digest", False):
                hashed.append(name)
            elif entry.get("reveal", False):
                revealed.append(name)
        return sorted(hashed), sorted(revealed)

    def _build(self, config: dict, prover_inputs: dict | None) -> ConstraintSystem:
        cs = ConstraintSystem()
        hashed, revealed = self._claim_names(config)
        pi = prover_inputs or {}

        def val(name, default=0):
            v = pi.get(name, default)
            return int(v) if not isinstance(v, list) else [int(x) for x in v]

        pub_vars = []
        # digests first, then modulus limbs, then claim values — mirroring
        # the reference circuit's output ordering (io_locations.sym).
        for name in hashed:
            pub_vars.append((f"{name}_digest", cs.alloc_public(val(f"{name}_digest"), f"{name}_digest")))
        n_limbs = -(-2048 // CIRCOM_RS256_LIMB_BITS)
        modulus = val("modulus", [0] * n_limbs)
        for i in range(n_limbs):
            pub_vars.append((f"modulus[{i}]", cs.alloc_public(modulus[i], f"modulus[{i}]")))
        for name in revealed:
            pub_vars.append((f"{name}_value", cs.alloc_public(val(f"{name}_value"), f"{name}_value")))

        # placeholder binding: pub == private witness copy (1 constraint each).
        for _, v in pub_vars:
            w = cs.alloc(cs.value(v))
            cs.assert_equal(w, v)
        return cs

    def setup(self, config: dict):
        cs = self._build(config, None)
        return cs.to_r1cs(), cs.io_locations()

    def synthesize(self, config: dict, prover_inputs: dict):
        pi = dict(prover_inputs)
        # digests of hashed claims are circuit outputs in the real statement;
        # the stub computes them host-side from aux-provided preimages.
        hashed, _ = self._claim_names(config)
        for name in hashed:
            if f"{name}_digest" not in pi and name in pi:
                digest = hashlib.sha256(str(pi[name]).encode()).digest()
                pi[f"{name}_digest"] = bits_to_num(digest[:31])
        cs = self._build(config, pi)
        assert cs.is_satisfied()
        return cs.to_r1cs(), cs.assignment(), cs.io_locations()
