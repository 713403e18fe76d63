"""Adversarial byte-layout anchors for the Spartan NIZK wire encoding
(models/spartan_ser.py) — VERDICT r4 item 7.

The offsets below are derived BY HAND from bincode 1.x semantics applied to
the reference's struct declarations (NOT by calling the writer):

  * Scalar (t256 Fq, halo2curves derive field/common.rs:111,
    serde_arrays):               32 raw LE bytes, no prefix
  * CompressedGroup (serde_bytes::ByteArray<33>, Spartan-t256
    src/group.rs:17):            u64 LE length (=33) + 33 bytes = 41
  * Vec<T>:                      u64 LE length + items
  * fixed arrays & tuples:       items raw, no prefix
    (ProductProof.z: [Scalar;5] nizk/mod.rs:153; claims_phase2 4-tuple
    r1csproof.rs:27)
  * serialized object = bare NIZK (ecdsa-pop/src/lib.rs:544)

A transposed field pair or a wrong prefix rule shifts every subsequent
offset, so these goldens fail on any such change; the mutation test then
asserts the verifier rejects corruption at every field boundary of a real
proof.
"""


import pytest

from crescent_tpu.models import spartan as sp
from crescent_tpu.models import spartan_ser as ser
from crescent_tpu.core.curves import T256
from crescent_tpu.utils.merlin import Transcript

Q = T256.n

PT = 41   # 8-byte length prefix + 33 point bytes
SC = 32   # bare scalar


def _pt(tag: int) -> bytes:
    return bytes([tag]) * 33


def _mk_dotproduct(tag: int, nz: int) -> sp.DotProductProof:
    return sp.DotProductProof(
        delta=_pt(tag), beta=_pt(tag + 1),
        z=[1000 * tag + j for j in range(nz)],
        z_delta=77 + tag, z_beta=78 + tag,
    )


def _mk_sumcheck(tag: int, rounds: int, nz: int) -> sp.ZKSumcheckInstanceProof:
    return sp.ZKSumcheckInstanceProof(
        comm_polys=[_pt(tag + i) for i in range(rounds)],
        comm_evals=[_pt(tag + 50 + i) for i in range(rounds)],
        proofs=[_mk_dotproduct(tag + 100 + i, nz) for i in range(rounds)],
    )


def _mk_nizk(nc=3, r1=2, r2=2, nb=2, nrx=4, nry=5) -> sp.NIZK:
    proof = sp.R1CSProof(
        comm_vars=sp.PolyCommitment(C=[_pt(10 + i) for i in range(nc)]),
        sc_proof_phase1=_mk_sumcheck(20, r1, 4),
        claims_phase2=tuple(_pt(60 + i) for i in range(4)),
        pok_claims_phase2=(
            sp.KnowledgeProof(alpha=_pt(70), z1=701, z2=702),
            sp.ProductProof(alpha=_pt(71), beta=_pt(72), delta=_pt(73),
                            z=[731, 732, 733, 734, 735]),
        ),
        proof_eq_sc_phase1=sp.EqualityProof(alpha=_pt(80), z=801),
        sc_proof_phase2=_mk_sumcheck(90, r2, 3),
        comm_vars_at_ry=_pt(110),
        proof_eval_vars_at_ry=sp.PolyEvalProof(
            proof=sp.DotProductProofLog(
                bullet=sp.BulletReductionProof(
                    L_vec=[_pt(120 + i) for i in range(nb)],
                    R_vec=[_pt(130 + i) for i in range(nb)],
                ),
                delta=_pt(140), beta=_pt(141), z1=1401, z2=1402,
            )
        ),
        proof_eq_sc_phase2=sp.EqualityProof(alpha=_pt(150), z=1501),
    )
    return sp.NIZK(r1cs_sat_proof=proof, rx=list(range(2000, 2000 + nrx)),
                   ry=list(range(3000, 3000 + nry)))


def test_hand_derived_offsets():
    nc, r1, r2, nb, nrx, nry = 3, 2, 2, 2, 4, 5
    buf = ser.nizk_to_bytes(_mk_nizk(nc, r1, r2, nb, nrx, nry))

    def u64(off):
        return int.from_bytes(buf[off : off + 8], "little")

    def point_at(off, tag):
        assert u64(off) == 33, f"point length prefix at {off}"
        assert buf[off + 8 : off + 41] == _pt(tag), f"point bytes at {off}"

    def scalar_at(off, val):
        assert buf[off : off + 32] == val.to_bytes(32, "little"), f"scalar at {off}"

    # ---- PolyCommitment.C: u64 count + nc points
    off = 0
    assert u64(off) == nc
    off += 8
    for i in range(nc):
        point_at(off, 10 + i)
        off += PT

    # ---- sc_proof_phase1: Vec comm_polys, Vec comm_evals, Vec proofs
    def sumcheck_at(off, tag, rounds, nz):
        assert u64(off) == rounds
        off += 8
        for i in range(rounds):
            point_at(off, tag + i)
            off += PT
        assert u64(off) == rounds
        off += 8
        for i in range(rounds):
            point_at(off, tag + 50 + i)
            off += PT
        assert u64(off) == rounds
        off += 8
        for i in range(rounds):
            t = tag + 100 + i
            point_at(off, t)           # delta
            off += PT
            point_at(off, t + 1)       # beta
            off += PT
            assert u64(off) == nz      # z: Vec<Scalar>
            off += 8
            for j in range(nz):
                scalar_at(off, 1000 * t + j)
                off += SC
            scalar_at(off, 77 + t)     # z_delta
            off += SC
            scalar_at(off, 78 + t)     # z_beta
            off += SC
        return off

    off = sumcheck_at(off, 20, r1, 4)

    # ---- claims_phase2: 4-tuple of points, NO length prefix
    for i in range(4):
        point_at(off, 60 + i)
        off += PT

    # ---- KnowledgeProof: point + 2 scalars
    point_at(off, 70); off += PT
    scalar_at(off, 701); off += SC
    scalar_at(off, 702); off += SC

    # ---- ProductProof: 3 points + [Scalar; 5] with NO length prefix
    for tag in (71, 72, 73):
        point_at(off, tag)
        off += PT
    for v in (731, 732, 733, 734, 735):
        scalar_at(off, v)
        off += SC

    # ---- EqualityProof phase1
    point_at(off, 80); off += PT
    scalar_at(off, 801); off += SC

    # ---- sc_proof_phase2
    off = sumcheck_at(off, 90, r2, 3)

    # ---- comm_vars_at_ry
    point_at(off, 110); off += PT

    # ---- PolyEvalProof: Bullet L_vec, R_vec, delta, beta, z1, z2
    assert u64(off) == nb
    off += 8
    for i in range(nb):
        point_at(off, 120 + i); off += PT
    assert u64(off) == nb
    off += 8
    for i in range(nb):
        point_at(off, 130 + i); off += PT
    point_at(off, 140); off += PT
    point_at(off, 141); off += PT
    scalar_at(off, 1401); off += SC
    scalar_at(off, 1402); off += SC

    # ---- EqualityProof phase2
    point_at(off, 150); off += PT
    scalar_at(off, 1501); off += SC

    # ---- NIZK.r = (Vec rx, Vec ry)
    assert u64(off) == nrx
    off += 8
    for i in range(nrx):
        scalar_at(off, 2000 + i); off += SC
    assert u64(off) == nry
    off += 8
    for i in range(nry):
        scalar_at(off, 3000 + i); off += SC

    assert off == len(buf), f"derived size {off} != serialized size {len(buf)}"


def test_roundtrip_and_field_swap_detection():
    nizk = _mk_nizk()
    buf = ser.nizk_to_bytes(nizk)
    back = ser.nizk_from_bytes(buf)
    assert ser.nizk_to_bytes(back) == buf
    # swapping two adjacent scalar fields changes the bytes (anti-transpose)
    p = back.r1cs_sat_proof.pok_claims_phase2[0]
    swapped = sp.KnowledgeProof(alpha=p.alpha, z1=p.z2, z2=p.z1)
    back.r1cs_sat_proof = sp.R1CSProof(
        **{**back.r1cs_sat_proof.__dict__,
           "pok_claims_phase2": (swapped, back.r1cs_sat_proof.pok_claims_phase2[1])}
    )
    assert ser.nizk_to_bytes(back) != buf


def _real_small_proof():
    from tests.test_spartan import _synthetic_r1cs

    inst, vars_, inputs = _synthetic_r1cs(16, 16, 3)
    gens = sp.NIZKGens(inst.num_cons, inst.num_vars, inst.num_inputs)
    proof = sp.NIZK.prove(inst, vars_, inputs, gens, Transcript(b"golden"))
    return inst, inputs, gens, proof


def test_mutation_rejected_at_every_field_boundary():
    """Corrupting any field start of a REAL serialized proof must make
    verification fail (or deserialization raise)."""
    inst, inputs, gens, proof = _real_small_proof()
    buf = ser.nizk_to_bytes(proof)
    # sanity: clean round trip verifies
    ser.nizk_from_bytes(buf).verify(inst, inputs, Transcript(b"golden"), gens)

    # field boundaries: walk the buffer structurally using the reader's own
    # token stream (lengths from the data, so this stays valid if shapes
    # change); corrupt ONE byte at each boundary
    boundaries = [0]
    r = ser._R(buf)
    # drive a full parse, recording positions before each primitive
    orig_raw = ser._R.raw

    def spy_raw(self, n):
        boundaries.append(self.pos)
        return orig_raw(self, n)

    ser._R.raw = spy_raw
    try:
        ser.nizk_from_bytes(buf)
    finally:
        ser._R.raw = orig_raw

    tested = 0
    for off in sorted(set(boundaries)):
        if off >= len(buf):
            continue
        bad = bytearray(buf)
        bad[off] ^= 0x01
        bad = bytes(bad)
        try:
            nizk = ser.nizk_from_bytes(bad)
            nizk.verify(inst, inputs, Transcript(b"golden"), gens)
        except Exception:
            tested += 1
            continue
        pytest.fail(f"corruption at byte {off} was accepted")
    assert tested >= 50, f"only {tested} boundaries exercised"
