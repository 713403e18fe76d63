"""Differential fuzzing of the native WASM interpreter (native/wasmvm.cpp).

The interpreter executes untrusted-format bytecode (circom `main.wasm`
artifacts), standing in for wasmer 2.3
(forks/circom-compat/src/witness/witness_calculator.rs:56-155).  These tests
give it an adversarial surface the hand-assembled ABI fixtures don't:

  * a random straight-line expression generator covering every implemented
    numeric opcode class (i32/i64 arithmetic, division/remainder with trap
    paths, shifts/rotates, clz/ctz/popcnt, comparisons, eqz, conversions,
    sign-extensions, select / typed select, local.tee), executed
    differentially against an independent Python evaluator of the same
    expression tree;
  * memory load/store sequences of every width mirrored against a Python
    bytearray, plus out-of-bounds trap checks;
  * malformed-module tests: truncation, mutation, >8-result function types,
    oversized locals, unknown host imports (must trap, not silently no-op).
"""

import random
import struct

import pytest

from crescent_tpu.native import wasm_backend
from wasm_fixture import (
    END,
    I32,
    I64,
    build_circom_toy,
    func,
    functype,
    i32c,
    i64c,
    leb_s,
    leb_u,
    lget,
    sec,
    vec,
)

pytestmark = pytest.mark.skipif(
    not wasm_backend.available(), reason="no C++ toolchain"
)

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1
TRAP = object()


def _s(v, bits):
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >> (bits - 1) else v


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _trunc_rem(a, b):
    r = abs(a) % abs(b)
    return r if a >= 0 else -r


def _clz(v, bits):
    return bits if v == 0 else bits - v.bit_length()


def _ctz(v, bits):
    return bits if v == 0 else (v & -v).bit_length() - 1


def _rotl(v, n, bits):
    n %= bits
    m = (1 << bits) - 1
    return ((v << n) | (v >> (bits - n))) & m


# (opcode, pyfunc) tables.  pyfunc takes unsigned operand(s), returns
# unsigned result or TRAP.  All operands/results wrapped to width.
def _bin_table(bits):
    m = (1 << bits) - 1
    imin = -(1 << (bits - 1))

    def div_s(a, b):
        sa, sb = _s(a, bits), _s(b, bits)
        if sb == 0 or (sa == imin and sb == -1):
            return TRAP
        return _trunc_div(sa, sb) & m

    def rem_s(a, b):
        sa, sb = _s(a, bits), _s(b, bits)
        if sb == 0:
            return TRAP
        if sa == imin and sb == -1:
            return 0
        return _trunc_rem(sa, sb) & m

    sh = bits - 1
    base = 0x6A if bits == 32 else 0x7C
    return [
        (base + 0, lambda a, b: (a + b) & m),
        (base + 1, lambda a, b: (a - b) & m),
        (base + 2, lambda a, b: (a * b) & m),
        (base + 3, div_s),
        (base + 4, lambda a, b: TRAP if b == 0 else a // b),
        (base + 5, rem_s),
        (base + 6, lambda a, b: TRAP if b == 0 else a % b),
        (base + 7, lambda a, b: a & b),
        (base + 8, lambda a, b: a | b),
        (base + 9, lambda a, b: a ^ b),
        (base + 10, lambda a, b: (a << (b & sh)) & m),
        (base + 11, lambda a, b: (_s(a, bits) >> (b & sh)) & m),
        (base + 12, lambda a, b: a >> (b & sh)),
        (base + 13, lambda a, b: _rotl(a, b & sh, bits)),
        (base + 14, lambda a, b: _rotl(a, bits - (b & sh), bits) if (b & sh) else a),
    ]


def _cmp_table(bits):
    base = 0x46 if bits == 32 else 0x51
    s = lambda v: _s(v, bits)  # noqa: E731
    return [
        (base + 0, lambda a, b: int(a == b)),
        (base + 1, lambda a, b: int(a != b)),
        (base + 2, lambda a, b: int(s(a) < s(b))),
        (base + 3, lambda a, b: int(a < b)),
        (base + 4, lambda a, b: int(s(a) > s(b))),
        (base + 5, lambda a, b: int(a > b)),
        (base + 6, lambda a, b: int(s(a) <= s(b))),
        (base + 7, lambda a, b: int(a <= b)),
        (base + 8, lambda a, b: int(s(a) >= s(b))),
        (base + 9, lambda a, b: int(a >= b)),
    ]


def _un_table(bits):
    m = (1 << bits) - 1
    base = 0x67 if bits == 32 else 0x79
    return [
        (base + 0, lambda a: _clz(a, bits)),
        (base + 1, lambda a: _ctz(a, bits)),
        (base + 2, lambda a: bin(a).count("1")),
        # sign-extension ops (0xc0/0xc1 for i32, 0xc2/0xc3/0xc4 for i64)
        (0xC0 if bits == 32 else 0xC2, lambda a: _s(a & 0xFF, 8) & m),
        (0xC1 if bits == 32 else 0xC3, lambda a: _s(a & 0xFFFF, 16) & m),
    ]


class ExprGen:
    """Generates a random (code_bytes, python_value) expression of a type."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.tee32 = 0  # local indices reserved for tee: 0..3 i32, 4..7 i64

    def const(self, bits):
        r = self.rng.random()
        if r < 0.3:
            v = self.rng.choice(
                [0, 1, 2, (1 << bits) - 1, 1 << (bits - 1), (1 << (bits - 1)) - 1]
            )
        else:
            v = self.rng.getrandbits(self.rng.randint(1, bits))
        code = (b"\x41" if bits == 32 else b"\x42") + leb_s(_s(v, bits))
        return code, v

    def gen(self, bits, depth):
        rng = self.rng
        if depth <= 0:
            return self.const(bits)
        kind = rng.random()
        if kind < 0.35:  # binary
            op, f = rng.choice(_bin_table(bits))
            ca, va = self.gen(bits, depth - 1)
            cb, vb = self.gen(bits, depth - 1)
            if va is TRAP or vb is TRAP:
                return ca + cb + bytes([op]), TRAP
            return ca + cb + bytes([op]), f(va, vb)
        if kind < 0.5:  # comparison -> i32, then widen if needed
            op, f = rng.choice(_cmp_table(bits))
            ca, va = self.gen(bits, depth - 1)
            cb, vb = self.gen(bits, depth - 1)
            code = ca + cb + bytes([op])
            v = TRAP if (va is TRAP or vb is TRAP) else f(va, vb)
            if bits == 64:  # comparisons yield i32; extend back
                code += b"\xad"
            return code, v
        if kind < 0.62:  # unary
            op, f = rng.choice(_un_table(bits))
            ca, va = self.gen(bits, depth - 1)
            return ca + bytes([op]), TRAP if va is TRAP else f(va)
        if kind < 0.72:  # eqz
            ca, va = self.gen(bits, depth - 1)
            code = ca + (b"\x45" if bits == 32 else b"\x50")
            v = TRAP if va is TRAP else int(va == 0)
            if bits == 64:
                code += b"\xad"
            return code, v
        if kind < 0.82:  # conversion from the other width
            ob = 64 if bits == 32 else 32
            ca, va = self.gen(ob, depth - 1)
            if bits == 32:  # i32.wrap_i64
                return ca + b"\xa7", TRAP if va is TRAP else va & M32
            if rng.random() < 0.5:  # i64.extend_i32_s
                return ca + b"\xac", TRAP if va is TRAP else _s(va, 32) & M64
            return ca + b"\xad", TRAP if va is TRAP else va  # extend_u
        if kind < 0.92:  # select / typed select
            ca, va = self.gen(bits, depth - 1)
            cb, vb = self.gen(bits, depth - 1)
            cc, vc = self.gen(32, depth - 1)
            if rng.random() < 0.5:
                sel = b"\x1b"
            else:  # typed select with explicit valtype vector
                sel = b"\x1c" + leb_u(1) + bytes([I32 if bits == 32 else I64])
            if va is TRAP or vb is TRAP or vc is TRAP:
                v = TRAP
            else:
                v = va if vc else vb
            return ca + cb + cc + sel, v
        # local.tee round-trip
        idx = rng.randrange(4) + (0 if bits == 32 else 4)
        ca, va = self.gen(bits, depth - 1)
        return ca + b"\x22" + leb_u(idx), va


def build_expr_module(exprs):
    """Module exporting f{i}: () -> (i32|i64) for each (code, bits) expr."""
    types = [functype([], [I32]), functype([], [I64])]
    func_types, bodies, exports = [], [], []
    for i, (code, bits) in enumerate(exprs):
        func_types.append(0 if bits == 32 else 1)
        bodies.append(func([(4, I32), (4, I64)], code))
        name = f"f{i}".encode()
        exports.append(leb_u(len(name)) + name + b"\x00" + leb_u(i))
    return (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(3, vec([leb_u(t) for t in func_types]))
        + sec(7, leb_u(len(exports)) + b"".join(exports))
        + sec(10, vec(bodies))
    )


def test_numeric_differential_fuzz():
    rng = random.Random(0xC0FFEE)
    gen = ExprGen(rng)
    exprs, expected = [], []
    for i in range(400):
        bits = 32 if i % 2 == 0 else 64
        code, val = gen.gen(bits, rng.randint(2, 6))
        exprs.append((code, bits))
        expected.append(val)
    inst = wasm_backend.WasmInstance(build_expr_module(exprs))
    n_traps = 0
    for i, val in enumerate(expected):
        if val is TRAP:
            n_traps += 1
            with pytest.raises(wasm_backend.WasmTrap):
                inst.call(f"f{i}")
        else:
            got = inst.call(f"f{i}")
            assert got == [val], f"f{i}: got {got}, want {val}"
    # the generator must actually exercise trap paths
    assert 0 < n_traps < len(expected)


def _mem_module(body, results=(I32,), params=()):
    types = [functype(list(params), list(results))]
    name = b"go"
    return (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(3, vec([leb_u(0)]))
        + sec(5, vec([b"\x00" + leb_u(1)]))  # 1 page
        + sec(7, leb_u(1) + leb_u(len(name)) + name + b"\x00" + leb_u(0))
        + sec(10, vec([func([], body)]))
    )


STORES = {  # opcode -> (width bytes, is64)
    0x36: (4, False), 0x37: (8, True), 0x3A: (1, False),
    0x3B: (2, False), 0x3C: (1, True), 0x3D: (2, True), 0x3E: (4, True),
}
LOADS = {  # opcode -> (width, signed, is64)
    0x28: (4, False, False), 0x29: (8, False, True),
    0x2C: (1, True, False), 0x2D: (1, False, False),
    0x2E: (2, True, False), 0x2F: (2, False, False),
    0x30: (1, True, True), 0x31: (1, False, True),
    0x32: (2, True, True), 0x33: (2, False, True),
    0x34: (4, True, True), 0x35: (4, False, True),
}


def test_memory_differential_fuzz():
    rng = random.Random(1234)
    mem = bytearray(65536)
    body = b""
    # random stores mirrored into the Python model
    for _ in range(60):
        op, (w, is64) = rng.choice(list(STORES.items()))
        addr = rng.randrange(0, 65536 - 8)
        v = rng.getrandbits(64 if is64 else 32)
        body += i32c(addr)
        body += (i64c(_s(v, 64)) if is64 else i32c(_s(v & M32, 32)))
        body += bytes([op]) + leb_u(0) + leb_u(0)  # align=1(2^0), offset=0
        mem[addr:addr + w] = (v & ((1 << (8 * w)) - 1)).to_bytes(w, "little")
    # checksum phase: xor-fold a batch of random loads (as i64)
    acc = 0
    body += i64c(0)
    for _ in range(60):
        op, (w, signed, is64) = rng.choice(list(LOADS.items()))
        addr = rng.randrange(0, 65536 - 8)
        off = rng.randrange(0, 64)
        raw = int.from_bytes(mem[addr + off:addr + off + w], "little")
        if signed:
            raw = _s(raw, 8 * w) & (M64 if is64 else M32)
        body += i32c(addr) + bytes([op]) + leb_u(0) + leb_u(off)
        if not is64:
            body += b"\xad"  # extend_u to i64
        body += b"\x85"  # i64.xor
        acc ^= raw
    inst = wasm_backend.WasmInstance(_mem_module(body, results=(I64,)))
    assert inst.call("go") == [acc]


def test_memory_oob_load_traps():
    body = i32c(65536 - 3) + b"\x28" + leb_u(2) + leb_u(0)  # 4-byte load
    inst = wasm_backend.WasmInstance(_mem_module(body))
    with pytest.raises(wasm_backend.WasmTrap):
        inst.call("go")


def test_memory_oob_store_traps():
    body = i32c(65533) + i64c(1) + b"\x37" + leb_u(3) + leb_u(0) + i32c(0)
    inst = wasm_backend.WasmInstance(_mem_module(body))
    with pytest.raises(wasm_backend.WasmTrap):
        inst.call("go")


def test_typed_select_prescan_sync():
    """Typed select immediates inside an if-block must not desync the
    prescan's end/else offset tables (advisor finding, wasmvm.cpp:217)."""
    # f(c) = (select_t c ? 10 : 20) + 5, computed inside an if for control flow
    body = (
        i32c(10) + i32c(20) + lget(0)
        + b"\x1c" + leb_u(1) + bytes([I32])  # typed select [i32]
        + i32c(5) + b"\x6a"
    )
    types = [functype([I32], [I32])]
    name = b"go"
    mod = (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(3, vec([leb_u(0)]))
        + sec(7, leb_u(1) + leb_u(len(name)) + name + b"\x00" + leb_u(0))
        + sec(10, vec([func([], body)]))
    )
    inst = wasm_backend.WasmInstance(mod)
    assert inst.call("go", 1) == [15]
    assert inst.call("go", 0) == [25]


def test_ref_null_in_dead_code_prescan():
    """ref.null's type immediate must be skipped by the prescan even though
    the runtime would trap executing it (advisor finding)."""
    body = (
        b"\x02\x40"          # block
        + b"\x0c" + leb_u(0)  # br 0 (skip the dead tail)
        + b"\xd0\x70"         # ref.null funcref (dead)
        + b"\x1a"             # drop (dead)
        + END
        + i32c(42)
    )
    inst = wasm_backend.WasmInstance(_mem_module(body))
    assert inst.call("go") == [42]


def test_unknown_import_traps_not_nops():
    """A non-circom host import must trap when called — silently pushing
    zeros would compute a wrong witness (advisor finding, wasmvm.cpp:247)."""
    imp = (
        leb_u(1)
        + leb_u(3) + b"env" + leb_u(6) + b"mystic"
        + b"\x00" + leb_u(1)  # func import of type 1: () -> i32
    )
    types = [functype([], [I32]), functype([], [I32])]
    body = b"\x10" + leb_u(0)  # call import
    name = b"go"
    mod = (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(2, imp)
        + sec(3, vec([leb_u(0)]))
        + sec(7, leb_u(1) + leb_u(len(name)) + name + b"\x00" + leb_u(1))
        + sec(10, vec([func([], body)]))
    )
    inst = wasm_backend.WasmInstance(mod)
    with pytest.raises(wasm_backend.WasmTrap, match="unsupported host import"):
        inst.call("go")


def test_runtime_log_imports_still_nop():
    """The circom runtime log hooks stay no-ops (witness_calculator.rs:78-82)."""
    imp = (
        leb_u(1)
        + leb_u(7) + b"runtime" + leb_u(12) + b"logSetSignal"
        + b"\x00" + leb_u(1)  # (i32,i32)->()
    )
    types = [functype([], [I32]), functype([I32, I32], [])]
    body = i32c(1) + i32c(2) + b"\x10" + leb_u(0) + i32c(7)
    name = b"go"
    mod = (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(2, imp)
        + sec(3, vec([leb_u(0)]))
        + sec(7, leb_u(1) + leb_u(len(name)) + name + b"\x00" + leb_u(1))
        + sec(10, vec([func([], body)]))
    )
    inst = wasm_backend.WasmInstance(mod)
    assert inst.call("go") == [7]


def test_wide_result_type_rejected_at_parse():
    """Function types with >8 results could overflow the fixed result
    buffers; they must be rejected at load (advisor finding, wasmvm.cpp:588)."""
    types = [functype([], [I32] * 9)]
    mod = (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
    )
    with pytest.raises(wasm_backend.WasmTrap, match="results"):
        wasm_backend.WasmInstance(mod)


def test_truncated_modules_rejected():
    toy = build_circom_toy()
    # (a header-only prefix of 8 bytes is a valid empty module, so every cut
    # here lands mid-header or mid-section)
    for cut in [3, 20, len(toy) // 2, len(toy) - 1]:
        with pytest.raises(wasm_backend.WasmTrap):
            wasm_backend.WasmInstance(toy[:cut])


def test_mutated_modules_never_crash():
    """Random single-byte mutations: load either succeeds or reports an
    error; executing a successfully-loaded mutant either runs or traps.
    Nothing may bring the process down (exceptions escaping the C ABI)."""
    toy = build_circom_toy()
    rng = random.Random(42)
    loaded = trapped = rejected = 0
    for _ in range(300):
        mut = bytearray(toy)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(8, len(mut))] = rng.getrandbits(8)
        try:
            inst = wasm_backend.WasmInstance(bytes(mut))
        except wasm_backend.WasmTrap:
            rejected += 1
            continue
        loaded += 1
        # a mutated branch target can loop forever; bound execution
        inst.set_fuel(5_000_000)
        try:
            inst.call("getVersion")
            inst.call("sumRange", 17)
        except wasm_backend.WasmTrap:
            trapped += 1
    # mutation space must hit all three outcomes for this to mean anything
    assert loaded > 0 and rejected > 0
