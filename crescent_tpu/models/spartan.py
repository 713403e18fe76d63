"""Spartan proof-system primitives over T-256's scalar field.

Foundation for the TPU-native equivalent of forks/Spartan-t256 (the NIZK
behind the ECDSA device-binding proof, SURVEY.md §2c): dense multilinear
polynomials, the sumcheck protocol (quadratic/cubic rounds), Pedersen
vector commitments over T-256, and the R1CS-satisfiability sumcheck
instance.  The full zero-knowledge NIZK assembly (zk-sumcheck with
committed rounds, sparse-mlpoly ABC evaluation proof, bullet IPA —
r1csproof.rs:24-146, sparse_mlpoly.rs, nizk/bullet.rs) builds on these and
is tracked as round-2 work in PARITY.md.

Field: T-256 scalar = P-256 base prime, so commitments here can carry P-256
coordinates natively (the whole point of the Tom-256 curve).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

from ..core.curves import T256, AffinePoint
from ..core.fields import T256_FQ as Q  # scalar field of T-256
from ..utils.merlin import Transcript

# ---------------------------------------------------------------------------
# Dense multilinear polynomials (dense_mlpoly.rs)
# ---------------------------------------------------------------------------


class DenseMlPoly:
    """Multilinear polynomial in evaluation form over {0,1}^m.

    evals[i] is the value at the bit-vector of i (little-endian: bit 0 of i
    is variable x_0... matching Spartan's ordering where `bound_poly_var_top`
    fixes the MOST significant variable)."""

    def __init__(self, evals: list[int]):
        n = len(evals)
        assert n & (n - 1) == 0
        self.evals = [e % Q for e in evals]

    @property
    def num_vars(self) -> int:
        return (len(self.evals)).bit_length() - 1

    def bound_poly_var_top(self, r: int) -> "DenseMlPoly":
        """Fix the top variable to r: new[i] = (1-r)*lo[i] + r*hi[i]."""
        half = len(self.evals) // 2
        lo, hi = self.evals[:half], self.evals[half:]
        return DenseMlPoly([(l + r * (h - l)) % Q for l, h in zip(lo, hi)])

    def evaluate(self, rs: list[int]) -> int:
        """Evaluate at a point (top variable first, Spartan convention)."""
        p = self
        for r in rs:
            p = p.bound_poly_var_top(r)
        assert len(p.evals) == 1
        return p.evals[0]


def eq_evals(rs: list[int]) -> list[int]:
    """Evaluations of eq(x, r) over x in {0,1}^m (EqPolynomial::evals)."""
    evals = [1]
    for r in rs:
        out = []
        for e in evals:
            out.append(e * (1 - r) % Q)
        for e in evals:
            out.append(e * r % Q)
        evals = out
    return evals


# ---------------------------------------------------------------------------
# Sumcheck (sumcheck.rs prove_quad / prove_cubic, non-ZK core)
# ---------------------------------------------------------------------------


def _challenge_scalar(ts: Transcript, label: bytes) -> int:
    return int.from_bytes(ts.challenge_bytes(label, 31), "little") % Q


def _append_poly(ts: Transcript, label: bytes, coeffs: list[int]):
    ts.append_message(label, b"".join(int(c % Q).to_bytes(32, "little") for c in coeffs))


@dataclass
class SumcheckProof:
    round_polys: list  # per round: coefficient list of the univariate poly


def sumcheck_prove_quad(
    poly_a: DenseMlPoly, poly_b: DenseMlPoly, claim: int, ts: Transcript
) -> tuple[SumcheckProof, list[int], tuple[int, int]]:
    """Prove sum_x A(x)*B(x) == claim.  Returns (proof, challenge point,
    final evaluations (A(r), B(r)))."""
    a, b = poly_a, poly_b
    num_rounds = a.num_vars
    e = claim % Q
    r_point = []
    round_polys = []
    for _ in range(num_rounds):
        half = len(a.evals) // 2
        # univariate g(t) = sum_i (a_lo + t(a_hi-a_lo)) * (b_lo + t(b_hi-b_lo))
        eval0 = sum(a.evals[i] * b.evals[i] for i in range(half)) % Q
        eval2 = 0
        for i in range(half):
            a2 = (2 * a.evals[half + i] - a.evals[i]) % Q
            b2 = (2 * b.evals[half + i] - b.evals[i]) % Q
            eval2 += a2 * b2
        eval2 %= Q
        eval1 = (e - eval0) % Q  # g(0) + g(1) = e
        # interpolate degree-2 poly from g(0), g(1), g(2)
        c0 = eval0
        c2 = ((eval2 - 2 * eval1 + eval0) * pow(2, -1, Q)) % Q
        c1 = (eval1 - c0 - c2) % Q
        coeffs = [c0, c1, c2]
        _append_poly(ts, b"poly", coeffs)
        r = _challenge_scalar(ts, b"challenge_nextround")
        r_point.append(r)
        e = (c0 + c1 * r + c2 * r * r) % Q
        a = a.bound_poly_var_top(r)
        b = b.bound_poly_var_top(r)
        round_polys.append(coeffs)
    return SumcheckProof(round_polys), r_point, (a.evals[0], b.evals[0])


def sumcheck_prove_cubic(
    poly_a: DenseMlPoly, poly_b: DenseMlPoly, poly_c: DenseMlPoly, claim: int, ts: Transcript
) -> tuple[SumcheckProof, list[int], tuple[int, int, int]]:
    """Prove sum_x A(x)*B(x)*C(x) == claim (Spartan phase-1 shape with C=eq)."""
    a, b, c = poly_a, poly_b, poly_c
    num_rounds = a.num_vars
    e = claim % Q
    r_point = []
    round_polys = []
    for _ in range(num_rounds):
        half = len(a.evals) // 2

        def g_at(t: int) -> int:
            acc = 0
            for i in range(half):
                at = (a.evals[i] + t * (a.evals[half + i] - a.evals[i])) % Q
                bt = (b.evals[i] + t * (b.evals[half + i] - b.evals[i])) % Q
                ct = (c.evals[i] + t * (c.evals[half + i] - c.evals[i])) % Q
                acc += at * bt * ct
            return acc % Q

        g0, g2, g3 = g_at(0), g_at(2), g_at(3)
        g1 = (e - g0) % Q
        # interpolate cubic from g(0..3)
        c0 = g0
        # solve Vandermonde for c1, c2, c3
        #   g1 = c0 + c1 + c2 + c3
        #   g2 = c0 + 2c1 + 4c2 + 8c3
        #   g3 = c0 + 3c1 + 9c2 + 27c3
        d1 = (g1 - c0) % Q
        d2 = (g2 - c0) % Q
        d3 = (g3 - c0) % Q
        inv2, inv6 = pow(2, -1, Q), pow(6, -1, Q)
        c3 = ((d3 - 3 * d2 + 3 * d1) * inv6) % Q
        c2 = ((d2 - 2 * d1) * inv2 - 3 * c3) % Q
        c1 = (d1 - c2 - c3) % Q
        coeffs = [c0, c1, c2, c3]
        _append_poly(ts, b"poly", coeffs)
        r = _challenge_scalar(ts, b"challenge_nextround")
        r_point.append(r)
        e = (c0 + r * (c1 + r * (c2 + r * c3))) % Q
        a = a.bound_poly_var_top(r)
        b = b.bound_poly_var_top(r)
        c = c.bound_poly_var_top(r)
        round_polys.append(coeffs)
    return SumcheckProof(round_polys), r_point, (a.evals[0], b.evals[0], c.evals[0])


def sumcheck_verify(
    proof: SumcheckProof, claim: int, num_rounds: int, degree: int, ts: Transcript
) -> tuple[int, list[int]]:
    """Returns (final expected evaluation, challenge point); the caller must
    check it against the claimed polynomial opening."""
    e = claim % Q
    r_point = []
    for coeffs in proof.round_polys:
        assert len(coeffs) == degree + 1
        # g(0) + g(1) == e
        g0 = coeffs[0]
        g1 = sum(coeffs) % Q
        assert (g0 + g1) % Q == e, "sumcheck round check failed"
        _append_poly(ts, b"poly", coeffs)
        r = _challenge_scalar(ts, b"challenge_nextround")
        r_point.append(r)
        e = 0
        for c in reversed(coeffs):
            e = (e * r + c) % Q
    assert len(r_point) == num_rounds
    return e, r_point


# ---------------------------------------------------------------------------
# Pedersen vector commitments over T-256 (commitments.rs / NIZKGens)
# ---------------------------------------------------------------------------


def derive_generators(n: int, label: bytes) -> list[AffinePoint]:
    """n independent T-256 generators via hash-to-curve (size-derived, like
    NIZKGens lib.rs:591-609)."""
    out = []
    counter = 0
    while len(out) < n:
        digest = hashlib.sha512(label + counter.to_bytes(8, "little")).digest()
        x = int.from_bytes(digest[:32], "little") % T256.p
        try:
            out.append(T256.lift_x(x, digest[32] & 1))
        except ValueError:
            pass
        counter += 1
    return out


@dataclass
class PedersenGens:
    g: list[AffinePoint]  # vector bases
    h: AffinePoint        # blinding base


def pedersen_gens(n: int, label: bytes = b"crescent-tpu spartan gens") -> PedersenGens:
    pts = derive_generators(n + 1, label)
    return PedersenGens(pts[:n], pts[n])


def commit_vector(gens: PedersenGens, values: list[int], blind: int) -> AffinePoint:
    from ..ops.msm import get_msm
    from ..ops.ec import get_curve_ctx

    bases = gens.g[: len(values)] + [gens.h]
    scalars = [v % Q for v in values] + [blind % Q]
    if len(bases) <= 16:
        return T256.msm(scalars, bases)
    return get_msm(T256).run_host(scalars, bases)


# ---------------------------------------------------------------------------
# R1CS-satisfiability phase-1 sumcheck (the algebra of r1csproof.rs:24-38):
# prove sum_x eq(tau, x) * (Az(x)*Bz(x) - Cz(x)) == 0.
# ---------------------------------------------------------------------------


def r1cs_phase1_prove(
    az: list[int], bz: list[int], cz: list[int], tau: list[int], ts: Transcript
) -> tuple[SumcheckProof, list[int], tuple[int, int, int, int]]:
    """Cubic sumcheck over G(x) = eq(x)*(A(x)*B(x) - C(x)), claim 0.
    Returns (proof, r, (eq(r), A(r), B(r), C(r)))."""
    eq = DenseMlPoly(eq_evals(tau))
    A, B, C = DenseMlPoly(az), DenseMlPoly(bz), DenseMlPoly(cz)
    e = 0
    r_point = []
    round_polys = []
    for _ in range(A.num_vars):
        half = len(A.evals) // 2

        def g_at(t: int) -> int:
            acc = 0
            for i in range(half):
                et = (eq.evals[i] + t * (eq.evals[half + i] - eq.evals[i])) % Q
                at = (A.evals[i] + t * (A.evals[half + i] - A.evals[i])) % Q
                bt = (B.evals[i] + t * (B.evals[half + i] - B.evals[i])) % Q
                ct = (C.evals[i] + t * (C.evals[half + i] - C.evals[i])) % Q
                acc += et * ((at * bt - ct) % Q)
            return acc % Q

        g0, g2, g3 = g_at(0), g_at(2), g_at(3)
        g1 = (e - g0) % Q
        c0 = g0
        d1, d2, d3 = (g1 - c0) % Q, (g2 - c0) % Q, (g3 - c0) % Q
        inv2, inv6 = pow(2, -1, Q), pow(6, -1, Q)
        c3 = ((d3 - 3 * d2 + 3 * d1) * inv6) % Q
        c2 = ((d2 - 2 * d1) * inv2 - 3 * c3) % Q
        c1 = (d1 - c2 - c3) % Q
        coeffs = [c0, c1, c2, c3]
        _append_poly(ts, b"poly", coeffs)
        r = _challenge_scalar(ts, b"challenge_nextround")
        r_point.append(r)
        e = (c0 + r * (c1 + r * (c2 + r * c3))) % Q
        eq = eq.bound_poly_var_top(r)
        A = A.bound_poly_var_top(r)
        B = B.bound_poly_var_top(r)
        C = C.bound_poly_var_top(r)
        round_polys.append(coeffs)
    return (
        SumcheckProof(round_polys),
        r_point,
        (eq.evals[0], A.evals[0], B.evals[0], C.evals[0]),
    )
