"""SHA-256 R1CS gadget vs hashlib, including constraint-soundness checks."""

import hashlib
import random

from crescent_tpu.r1cs import sha256 as sg
from crescent_tpu.r1cs.builder import ConstraintSystem

rng = random.Random(8)


def _pad(msg: bytes) -> bytes:
    bitlen = len(msg) * 8
    out = msg + b"\x80"
    out += b"\x00" * ((56 - len(out) % 64) % 64)
    return out + bitlen.to_bytes(8, "big")


def _run(msg: bytes):
    cs = ConstraintSystem()
    padded = _pad(msg)
    byte_vars = [cs.alloc(b) for b in padded]
    digest = sg.sha256_gadget(cs, byte_vars)
    return cs, sg.digest_bytes_value(cs, digest)


def test_sha256_one_block():
    msg = b"abc"
    cs, got = _run(msg)
    assert got == hashlib.sha256(msg).digest()
    assert cs.is_satisfied()


def test_sha256_two_blocks():
    msg = bytes(rng.randrange(256) for _ in range(100))  # 100 bytes -> 2 blocks
    cs, got = _run(msg)
    assert got == hashlib.sha256(msg).digest()
    assert cs.is_satisfied()
    # soundness spot check: flipping a digest bit wire breaks satisfaction
    # (find the wire for the last allocated state bit and flip it)
    cs.values[-1] ^= 1
    assert not cs.is_satisfied()


def test_sha256_constraint_count():
    cs, _ = _run(b"abc")
    n = len(cs.constraints)
    # ~27k constraints/block is the expected R1CS costing; leave headroom
    assert 20000 < n < 40000, n
