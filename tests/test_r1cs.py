"""R1CS builder, gadget library, and .r1cs file format tests."""

import os
import random
import tempfile

from crescent_tpu.core.fields import BN254_FR as R
from crescent_tpu.r1cs import reader
from crescent_tpu.r1cs.builder import LC, ConstraintSystem

rng = random.Random(4242)


def test_builder_basic_gadgets():
    cs = ConstraintSystem()
    out = cs.alloc_public(21, "product")
    a = cs.alloc(3)
    b = cs.alloc(7)
    ab = cs.mul(a, b)
    cs.assert_equal(ab, out)
    assert cs.is_satisfied()
    assert cs.io_locations().get_io_location("product") == 1
    # tamper the witness
    cs.values[out.idx] = 22
    assert not cs.is_satisfied()


def test_bit_gadgets():
    cs = ConstraintSystem()
    x = cs.alloc(0b1011)
    bits = cs.decompose_bits(x, 4)
    assert [cs.value(b) for b in bits] == [1, 1, 0, 1]
    y = cs.bits_to_num(bits)
    assert cs.value(y) == 0b1011
    b0, b1 = bits[0], bits[2]
    assert cs.value(cs.xor(b0, b1)) == 1
    assert cs.value(cs.and_(b0, b1)) == 0
    assert cs.value(cs.select(b0, x, y)) == cs.value(x)
    z = cs.is_zero(LC.of(x) - LC.of(y))
    assert cs.value(z) == 1
    nz = cs.is_zero(x)
    assert cs.value(nz) == 0
    assert cs.is_satisfied()


def test_is_zero_soundness():
    cs = ConstraintSystem()
    x = cs.alloc(5)
    out = cs.is_zero(x)
    assert cs.is_satisfied()
    # forging out=1 for nonzero x must violate constraints
    cs.values[out.idx] = 1
    assert not cs.is_satisfied()


def test_r1cs_file_roundtrip():
    cs = ConstraintSystem()
    pub = cs.alloc_public(35, "out")
    a = cs.alloc(5)
    b = cs.alloc(7)
    cs.assert_equal(cs.mul(a, b), pub)
    assert cs.is_satisfied()

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.r1cs")
        cs.write_r1cs(path)
        rf = reader.read_r1cs(path)
        assert rf.prime == R
        assert rf.n_wires == len(cs.values)
        assert rf.num_instance == cs.num_instance
        assert rf.constraints == cs.constraints
        r1 = rf.to_r1cs()
        assert r1.is_satisfied(cs.assignment())


def test_r1cs_groth16_integration():
    """Build with the native frontend, prove with Groth16, verify."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from crescent_tpu.models import groth16

    cs = ConstraintSystem()
    pub = cs.alloc_public(3 * 7 * 7 % R, "out")
    a = cs.alloc(3)
    b = cs.alloc(7)
    ab = cs.mul(a, b)
    cs.assert_equal(cs.mul(ab, b), pub)
    assert cs.is_satisfied()

    pk = groth16.setup(cs.to_r1cs(), rng)
    proof = groth16.prove(pk, cs.to_r1cs(), cs.assignment(), rng)
    assert groth16.verify(pk.vk.prepare(), proof, [cs.value(pub)])


def test_r1cs_reader_spec_golden():
    """Parse a byte-by-byte handcrafted .r1cs built directly from iden3's
    binary spec (r1cs_bin_format.md) — independent of our writer, with the
    quirks a circom/snarkjs producer may emit: sections out of order, an
    unknown custom section, BN254 prime.  Circuit: out = a*b with
    one public output and two private inputs (wires [1, out, a, b])."""
    import struct

    from crescent_tpu.core.fields import BN254_FR
    from crescent_tpu.r1cs.reader import read_r1cs

    fs = 32
    prime = BN254_FR

    def coeff(x):
        return int(x % prime).to_bytes(fs, "little")

    # header section payload
    hdr = struct.pack("<I", fs) + prime.to_bytes(fs, "little")
    hdr += struct.pack("<IIII", 4, 1, 0, 2)     # wires, pub_out, pub_in, prv_in
    hdr += struct.pack("<Q", 4)                  # labels
    hdr += struct.pack("<I", 1)                  # constraints
    # constraints payload: A=[(2,1)], B=[(3,1)], C=[(1,1)]
    cons = (
        struct.pack("<I", 1) + struct.pack("<I", 2) + coeff(1)
        + struct.pack("<I", 1) + struct.pack("<I", 3) + coeff(1)
        + struct.pack("<I", 1) + struct.pack("<I", 1) + coeff(1)
    )
    # wire-to-label payload
    w2l = b"".join(struct.pack("<Q", i) for i in (0, 1, 2, 3))
    custom = b"\xde\xad\xbe\xef"  # unknown section type must be skipped

    blob = b"r1cs" + struct.pack("<I", 1) + struct.pack("<I", 4)
    # deliberately out of order: constraints, custom, header, wire map
    for stype, payload in ((2, cons), (9, custom), (1, hdr), (3, w2l)):
        blob += struct.pack("<I", stype) + struct.pack("<Q", len(payload)) + payload

    rf = read_r1cs(blob)
    assert rf.prime == prime
    assert (rf.n_wires, rf.n_pub_out, rf.n_pub_in, rf.n_prv_in) == (4, 1, 0, 2)
    assert rf.num_instance == 2
    assert rf.constraints == [([(2, 1)], [(3, 1)], [(1, 1)])]
    assert rf.wire_to_label == [0, 1, 2, 3]
    r1cs = rf.to_r1cs()
    a, b = 7, 9
    assert r1cs.is_satisfied([1, a * b, a, b])
    assert not r1cs.is_satisfied([1, a * b + 1, a, b])


def test_wtns_roundtrip_and_spec_golden(tmp_path):
    """wtns writer/reader roundtrip + a spec-handcrafted golden blob."""
    import struct

    from crescent_tpu.core.fields import BN254_FR
    from crescent_tpu.r1cs.wtns import read_wtns, write_wtns

    wit = [1, 63, 7, 9]
    p = tmp_path / "w.wtns"
    write_wtns(str(p), wit)
    prime, got = read_wtns(str(p))
    assert prime == BN254_FR and got == wit

    fs = 32
    hdr = struct.pack("<I", fs) + BN254_FR.to_bytes(fs, "little") + struct.pack("<I", 2)
    data = (5).to_bytes(fs, "little") + (11).to_bytes(fs, "little")
    blob = (
        b"wtns" + struct.pack("<I", 2) + struct.pack("<I", 2)
        + struct.pack("<I", 1) + struct.pack("<Q", len(hdr)) + hdr
        + struct.pack("<I", 2) + struct.pack("<Q", len(data)) + data
    )
    prime, got = read_wtns(blob)
    assert prime == BN254_FR and got == [5, 11]
