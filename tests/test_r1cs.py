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
