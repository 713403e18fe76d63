"""Variable-time hash-to-curve (public inputs only) matching utils.rs:45.

The reference hunts-and-pecks: SHA-512("{input}||{counter}") interpreted via
ark `G1Affine::from_random_bytes` until a valid point appears.  We mirror
that: take the first 32 bytes, strip the two ark SWFlags bits from the top
byte, reject if >= p or flags invalid, otherwise lift x with the flagged y
sign.  Used to derive Pedersen commitment bases (dlog.rs:197).
"""

from __future__ import annotations

import hashlib

from ..core.curves import AffinePoint, BN254_G1, Curve
from .serialize import INFINITY_FLAG, NEGATIVE_FLAG


def _from_random_bytes(curve: Curve, digest: bytes) -> AffinePoint | None:
    raw = bytearray(digest[:32])
    flags = raw[31] & 0xC0
    raw[31] &= 0x3F
    x = int.from_bytes(raw, "little")
    if x >= curve.p:
        return None
    if flags == (INFINITY_FLAG | NEGATIVE_FLAG):
        return None
    if flags & INFINITY_FLAG:
        return None  # identity is useless as a base; reference also skips via x==0 check
    try:
        pt = curve.lift_x(x)
    except ValueError:
        return None
    # pick sign: flag bit7 set -> the "negative" root (y > p - y)
    y = pt[1]
    y_neg = y > curve.p - y
    want_neg = bool(flags & NEGATIVE_FLAG)
    if y_neg != want_neg:
        pt = (pt[0], curve.p - pt[1])
    return pt


def hash_to_curve_vartime(input_str: str, curve: Curve = BN254_G1) -> AffinePoint:
    counter = 0
    while True:
        digest = hashlib.sha512(f"{input_str}||{counter}".encode()).digest()
        pt = _from_random_bytes(curve, digest)
        if pt is not None:
            return pt
        counter += 1


def derive_pedersen_bases(curve: Curve = BN254_G1) -> list:
    """Pedersen bases g1, g2 (dlog.rs:197)."""
    return [
        hash_to_curve_vartime(f"Pedersen commitment base {i}", curve) for i in (1, 2)
    ]
