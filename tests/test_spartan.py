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


# --- full NIZK (zk-sumcheck + poly commitment + bullet IPA) -----------------


def _synthetic_r1cs(num_cons, num_vars, num_inputs, seed=7):
    r = random.Random(seed)
    size_z = num_vars + num_inputs + 1
    Z = [r.randrange(Q) for _ in range(size_z)]
    Z[num_vars] = 1
    A, B, C = [], [], []
    for i in range(num_cons):
        ai, bi = i % size_z, (i + 2) % size_z
        A.append((i, ai, 1))
        B.append((i, bi, 1))
        ab = Z[ai] * Z[bi] % Q
        ci = (i + 3) % size_z
        if Z[ci] == 0:
            C.append((i, num_vars, ab))
        else:
            C.append((i, ci, ab * pow(Z[ci], -1, Q) % Q))
    inst = sp.SpartanR1CSInstance(num_cons, num_vars, num_inputs, A, B, C)
    return inst, Z[:num_vars], Z[num_vars + 1 :]


def test_t256_hash_to_curve_on_curve():
    from crescent_tpu.utils.hash_to_curve import expand_message_xmd, t256_hash_to_curve

    # RFC 9380 expand_message_xmd test vector (§K.1)
    out = expand_message_xmd(b"", b"QUUX-V01-CS02-with-expander-SHA256-128", 0x20)
    assert out.hex() == "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"
    for i in range(3):
        assert T256.is_on_curve(t256_hash_to_curve(f"msg {i}".encode()))


def test_multicommit_gens_deterministic():
    g1 = sp.MultiCommitGens.new(4, b"test-gens")
    g2 = sp.MultiCommitGens.new(4, b"test-gens")
    assert g1.G == g2.G and g1.h == g2.h
    g3 = sp.MultiCommitGens.new(4, b"other")
    assert g1.G != g3.G


def test_sigma_protocols_roundtrip():
    gens1 = sp.MultiCommitGens.new(1, b"test-sigma")
    tape = sp.RandomTape()
    x, r = rng.randrange(Q), rng.randrange(Q)
    ts = Transcript(b"ex")
    proof, C = sp.KnowledgeProof.prove(gens1, ts, tape, x, r)
    proof.verify(gens1, Transcript(b"ex"), C)

    v, s1, s2 = rng.randrange(Q), rng.randrange(Q), rng.randrange(Q)
    proof, C1, C2 = sp.EqualityProof.prove(gens1, Transcript(b"ex"), tape, v, s1, v, s2)
    proof.verify(gens1, Transcript(b"ex"), C1, C2)

    y, rX, rY, rZ = rng.randrange(Q), rng.randrange(Q), rng.randrange(Q), rng.randrange(Q)
    proof, X, Y, Z = sp.ProductProof.prove(
        gens1, Transcript(b"ex"), tape, x, rX, y, rY, x * y % Q, rZ
    )
    proof.verify(gens1, Transcript(b"ex"), X, Y, Z)


def test_dot_product_proof_log():
    n = 16
    gens = sp.DotProductProofGens(n, b"test-dppl")
    tape = sp.RandomTape()
    x = [rng.randrange(Q) for _ in range(n)]
    a = [rng.randrange(Q) for _ in range(n)]
    y = sum(u * v for u, v in zip(x, a)) % Q
    proof, Cx, Cy = sp.DotProductProofLog.prove(
        gens, Transcript(b"ex"), tape, x, rng.randrange(Q), a, y, rng.randrange(Q)
    )
    proof.verify(n, gens, Transcript(b"ex"), a, Cx, Cy)


def test_poly_eval_proof():
    m = 6
    poly = sp.DenseMlPoly([rng.randrange(Q) for _ in range(1 << m)])
    gens = sp.PolyCommitmentGens(m, b"test-pep")
    tape = sp.RandomTape()
    comm, blinds = sp.poly_commit(poly, gens, tape)
    r = [rng.randrange(Q) for _ in range(m)]
    eval_ = poly.evaluate(r)
    proof, C_Zr = sp.PolyEvalProof.prove(
        poly, blinds, r, eval_, rng.randrange(Q), gens, Transcript(b"ex"), tape
    )
    proof.verify(gens, Transcript(b"ex"), r, C_Zr, comm)


def test_nizk_end_to_end():
    inst, vars_, inputs = _synthetic_r1cs(32, 32, 5)
    assert inst.is_sat(vars_, inputs)
    gens = sp.NIZKGens(inst.num_cons, inst.num_vars, inst.num_inputs)
    proof = sp.NIZK.prove(inst, vars_, inputs, gens, Transcript(b"example"))
    proof.verify(inst, inputs, Transcript(b"example"), gens)

    # wrong public input -> reject
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % Q
    try:
        proof.verify(inst, bad, Transcript(b"example"), gens)
        assert False, "tampered input accepted"
    except sp.SpartanError:
        pass

    # tampered proof bytes -> reject
    import copy

    p2 = copy.deepcopy(proof)
    p2.r1cs_sat_proof.comm_vars_at_ry = sp._comp(
        T256.add(sp._decomp(p2.r1cs_sat_proof.comm_vars_at_ry), T256.generator)
    )
    try:
        p2.verify(inst, inputs, Transcript(b"example"), gens)
        assert False, "tampered proof accepted"
    except sp.SpartanError:
        pass


def test_nizk_unsatisfied_rejected():
    inst, vars_, inputs = _synthetic_r1cs(32, 32, 5)
    vars_bad = list(vars_)
    vars_bad[3] = (vars_bad[3] + 1) % Q
    assert not inst.is_sat(vars_bad, inputs)
    gens = sp.NIZKGens(inst.num_cons, inst.num_vars, inst.num_inputs)
    proof = sp.NIZK.prove(inst, vars_bad, inputs, gens, Transcript(b"example"))
    try:
        proof.verify(inst, inputs, Transcript(b"example"), gens)
        assert False, "unsatisfied instance accepted"
    except sp.SpartanError:
        pass


def test_instance_padding_rules():
    # 3 cons, 5 vars, 2 inputs -> 4 cons, 8 vars, input columns shifted by 3
    A = [(0, 0, 1), (0, 6, 2)]  # col 6 = input 0 at unpadded layout (5+1+0)
    inst = sp.SpartanR1CSInstance.from_unpadded(3, 5, 2, A, [(0, 5, 1)], [])
    assert inst.num_cons == 4 and inst.num_vars == 8
    assert (0, 9, 2) in inst.A  # 6 + (8-5) = 9
    assert (0, 8, 1) in inst.B  # constant column 5 -> 8
