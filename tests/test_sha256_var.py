"""Variable-length SHA-256 gadget (sha256general semantics) vs hashlib."""

import hashlib
import random

from crescent_tpu.r1cs import sha256 as sg
from crescent_tpu.r1cs.builder import ConstraintSystem

rng = random.Random(77)


def _embed(msg: bytes, max_len: int) -> tuple[list, int]:
    """SHA-pad msg and zero-extend to max_len (prep_inputs pipeline shape)."""
    bitlen = len(msg) * 8
    out = msg + b"\x80"
    out += b"\x00" * ((56 - len(out) % 64) % 64)
    out += bitlen.to_bytes(8, "big")
    padded_len = len(out)
    out += b"\x00" * (max_len - len(out))
    return list(out), padded_len


def test_var_sha256_selects_correct_block():
    max_len = 256  # 4 blocks
    for msg_len in [3, 55, 56, 100]:
        msg = bytes(rng.randrange(256) for _ in range(msg_len))
        buf, padded_len = _embed(msg, max_len)
        cs = ConstraintSystem()
        byte_vars = [cs.alloc(b) for b in buf]
        nb = cs.alloc(padded_len // 64)
        digest = sg.sha256_var_gadget(cs, byte_vars, nb)
        got = sg.digest_bytes_value(cs, digest)
        assert got == hashlib.sha256(msg).digest(), msg_len
        assert cs.is_satisfied()


def test_var_sha256_indicator_soundness():
    buf, padded_len = _embed(b"abc", 128)
    cs = ConstraintSystem()
    byte_vars = [cs.alloc(b) for b in buf]
    nb = cs.alloc(padded_len // 64)
    sg.sha256_var_gadget(cs, byte_vars, nb)
    assert cs.is_satisfied()
    # flipping the block count wire must break the indicator constraints
    cs.values[nb.idx] = 2
    assert not cs.is_satisfied()
