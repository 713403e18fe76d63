"""Spartan primitives over T-256: mlpolys, sumcheck, Pedersen commitments."""

import random

from crescent_tpu.core.curves import T256
from crescent_tpu.core.fields import T256_FQ as Q
from crescent_tpu.models import spartan as sp
from crescent_tpu.utils.merlin import Transcript

rng = random.Random(616)


def test_mlpoly_evaluate_matches_definition():
    m = 3
    evals = [rng.randrange(Q) for _ in range(1 << m)]
    p = sp.DenseMlPoly(evals)
    rs = [rng.randrange(Q) for _ in range(m)]
    got = p.evaluate(rs)
    # direct multilinear extension: sum_i evals[i] * prod_j chi_{i_j}(r_j)
    # bound_poly_var_top fixes the TOP variable first -> top variable is the
    # most significant index bit and corresponds to rs[0]
    want = 0
    for i, e in enumerate(evals):
        term = e
        for j in range(m):
            bit = (i >> (m - 1 - j)) & 1
            term = term * ((rs[j] if bit else (1 - rs[j])) % Q) % Q
        want = (want + term) % Q
    assert got == want


def test_eq_evals_consistency():
    m = 4
    taus = [rng.randrange(Q) for _ in range(m)]
    eq = sp.DenseMlPoly(sp.eq_evals(taus))
    # eq(x, tau) at a Boolean x equals the indicator-like product
    idx = rng.randrange(1 << m)
    # index bit ordering: eq_evals appends top variable last -> evals[i]'s
    # most significant bit corresponds to taus[-1]... pin by evaluation:
    point = [rng.randrange(Q) for _ in range(m)]
    lhs = eq.evaluate(point)
    rhs = 1
    # evaluate(point) fixes top var (last-added tau) to point[0]
    for t, r in zip(reversed(taus), point):
        rhs = rhs * ((t * r + (1 - t) * (1 - r)) % Q) % Q
    assert lhs == rhs


def test_sumcheck_quad_roundtrip():
    m = 4
    a = sp.DenseMlPoly([rng.randrange(Q) for _ in range(1 << m)])
    b = sp.DenseMlPoly([rng.randrange(Q) for _ in range(1 << m)])
    claim = sum(x * y for x, y in zip(a.evals, b.evals)) % Q
    ts = Transcript(b"test")
    proof, r_p, (ea, eb) = sp.sumcheck_prove_quad(a, b, claim, ts)
    ts_v = Transcript(b"test")
    final_e, r_v = sp.sumcheck_verify(proof, claim, m, 2, ts_v)
    assert r_p == r_v
    assert final_e == ea * eb % Q
    assert ea == a.evaluate(r_v) and eb == b.evaluate(r_v)


def test_sumcheck_rejects_wrong_claim():
    m = 3
    a = sp.DenseMlPoly([rng.randrange(Q) for _ in range(1 << m)])
    b = sp.DenseMlPoly([rng.randrange(Q) for _ in range(1 << m)])
    claim = sum(x * y for x, y in zip(a.evals, b.evals)) % Q
    ts = Transcript(b"test")
    proof, _, _ = sp.sumcheck_prove_quad(a, b, claim, ts)
    ts_v = Transcript(b"test")
    try:
        sp.sumcheck_verify(proof, (claim + 1) % Q, m, 2, ts_v)
        ok = True
    except AssertionError:
        ok = False
    assert not ok


def test_r1cs_phase1_sumcheck():
    """Satisfied R1CS rows -> phase-1 claim 0 verifies; final eval opens
    correctly against eq*(AB - C)."""
    m = 3
    n = 1 << m
    az = [rng.randrange(Q) for _ in range(n)]
    bz = [rng.randrange(Q) for _ in range(n)]
    cz = [a * b % Q for a, b in zip(az, bz)]  # satisfied: Az*Bz = Cz
    tau = [rng.randrange(Q) for _ in range(m)]

    ts = Transcript(b"r1cs")
    proof, r_p, (eeq, ea, eb, ec) = sp.r1cs_phase1_prove(az, bz, cz, tau, ts)
    ts_v = Transcript(b"r1cs")
    final_e, r_v = sp.sumcheck_verify(proof, 0, m, 3, ts_v)
    assert r_p == r_v
    assert final_e == eeq * ((ea * eb - ec) % Q) % Q
    # openings match direct evaluations
    assert ea == sp.DenseMlPoly(az).evaluate(r_v)
    assert ec == sp.DenseMlPoly(cz).evaluate(r_v)

    # unsatisfied instance cannot claim 0
    cz_bad = list(cz)
    cz_bad[0] = (cz_bad[0] + 1) % Q
    ts2 = Transcript(b"r1cs")
    proof2, _, _ = sp.r1cs_phase1_prove(az, bz, cz_bad, tau, ts2)
    ts2_v = Transcript(b"r1cs")
    try:
        e2, r2 = sp.sumcheck_verify(proof2, 0, m, 3, ts2_v)
        # even if rounds pass, the final opening against the true polys fails
        eq_r = sp.DenseMlPoly(sp.eq_evals(tau)).evaluate(r2)
        a_r = sp.DenseMlPoly(az).evaluate(r2)
        b_r = sp.DenseMlPoly(bz).evaluate(r2)
        c_r = sp.DenseMlPoly(cz_bad).evaluate(r2)
        ok = e2 == eq_r * ((a_r * b_r - c_r) % Q) % Q
    except AssertionError:
        ok = False
    # a cheating prover of an unsatisfied instance is caught either in-round
    # or at the final opening with overwhelming probability — but since this
    # prover honestly computed rounds for a nonzero-sum polynomial with claim
    # 0, round 1 must already fail
    assert not ok


def test_pedersen_commit_t256():
    gens = sp.pedersen_gens(8)
    assert all(T256.is_on_curve(g) for g in gens.g + [gens.h])
    vals = [rng.randrange(Q) for _ in range(8)]
    blind = rng.randrange(Q)
    c1 = sp.commit_vector(gens, vals, blind)
    c2 = sp.commit_vector(gens, vals, blind)
    assert c1 == c2
    c3 = sp.commit_vector(gens, vals, (blind + 1) % Q)
    assert c1 != c3  # hiding base matters
