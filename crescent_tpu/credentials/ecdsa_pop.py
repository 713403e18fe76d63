"""ECDSA proof-of-possession support (reference: ecdsa-pop/src/lib.rs).

Statement (lib.rs:38-57): given public T = (1/r)R and U = (-h/r)G on P-256,
prove knowledge of (s, q0, q1, z) such that
    h_Q = Poseidon(q0, q1, z),
    m   = q0 + q1*e1 + z*e2  (mod BN254 Fr, emulated),
    Q.x = q0 + 2^128*q1,  and  (s*T + U).x = Q.x,
which ties a fresh ECDSA signature under the committed device key to the
BN254 commitments of the show proof.

Host-side pieces (adapter math, hQ, RTU) are complete; the Spartan-t256
NIZK prover/verifier for the circuit itself (`ECDSAProof.prove/verify`,
lib.rs:476-615) builds on crescent_tpu.models.spartan and is round-2 work —
calls raise NotImplementedError with that pointer.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..core.curves import P256
from ..core.fields import BN254_FR, P256_FP, P256_FQ
from ..core.poseidon import get_poseidon


@dataclass
class ECDSAParams:
    """ECDSAParams (lib.rs:78): P-256 signature curve, BN254 commitment field."""

    curve: str = "secp256r1"
    commitment_field: int = BN254_FR


def split_public_key_x(pubkey_x: int) -> tuple[int, int]:
    """Q.x = q0 + 2^128*q1 (ECDSAProof::split_public_key_x, lib.rs:441)."""
    mask = (1 << 128) - 1
    return pubkey_x & mask, pubkey_x >> 128


def compute_hQ(q0: int, q1: int, z: int) -> bytes:
    """h_Q = Poseidon(q0, q1, z) over P-256's base field (lib.rs:308),
    serialized little-endian (32 bytes)."""
    pos = get_poseidon(P256_FP, 4)  # arity 3
    h = pos.hash([q0 % P256_FP, q1 % P256_FP, z % P256_FP])
    return int(h).to_bytes(32, "little")


def compute_RTU(sig_r: int, sig_s: int, digest: bytes, pubkey_x: int, pubkey_y: int):
    """Recover R and compute T = (1/r)R, U = (-h/r)G (lib.rs:180-240).

    Returns (R, T, U) as affine P-256 points; R chosen so that the statement
    s*T + U == Q holds for the given public key."""
    n = P256_FQ
    h = int.from_bytes(digest[:32], "big") % n
    # R candidates from r (x-coordinate); pick the one consistent with Q:
    # s*R == h*G + r*Q  (standard ECDSA relation)
    rhs = P256.add(P256.mul(h, P256.generator), P256.mul(sig_r, (pubkey_x, pubkey_y)))
    for parity in (0, 1):
        R = P256.lift_x(sig_r, parity)
        if P256.mul(sig_s, R) == rhs:
            r_inv = pow(sig_r, -1, n)
            T = P256.mul(r_inv, R)
            U = P256.mul((-h * r_inv) % n, P256.generator)
            # sanity: s*T + U == Q
            assert P256.add(P256.mul(sig_s, T), U) == (pubkey_x, pubkey_y)
            return R, T, U
    raise ValueError("signature r does not correspond to a valid point")


class ECDSAProof:
    """Spartan NIZK for the ECDSA-PoP circuit (lib.rs:476-615).

    The circuit (ECDSAProofCircuit::synthesize, lib.rs:360-420: in-circuit
    T-256 scalar mul + Poseidon + emulated BN254-Fr arithmetic in 16x16-bit
    limbs) and the Spartan prover over crescent_tpu.models.spartan are
    round-2 work; see PARITY.md."""

    @staticmethod
    def prove(params, pubkey_x, pubkey_y, sig_r, sig_s, digest, h_q, m, e1, e2, z):
        raise NotImplementedError(
            "ECDSA-PoP Spartan prover is round-2 work (models/spartan.py has "
            "the sumcheck/commitment substrate; the bellpepper-style circuit "
            "synthesis and NIZK assembly are pending)"
        )

    @staticmethod
    def verify(params, r_x, r_y, digest, h_q, m, e1, e2, proof) -> bool:
        raise NotImplementedError("see ECDSAProof.prove")
