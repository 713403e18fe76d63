"""Hand-assembled WASM fixtures for the native interpreter tests.

No wasm toolchain exists in this image (and the reference checks in no
.wasm artifacts — circom builds them at setup time), so these tests encode
modules directly from the binary spec.  `build_circom_toy()` implements the
circom 2.x witness-calculator ABI (getVersion/getFieldNumLen32/getRawPrime/
read+writeSharedRWMemory/setInputSignal/getWitnessSize/getWitness — the
surface driven by forks/circom-compat/src/witness/witness_calculator.rs)
for the toy circuit  witness = [1, a*b mod p, a, b],  p = 2^31 - 1.
"""

import struct


def leb_u(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def leb_s(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not (b & 0x40)) or (n == -1 and (b & 0x40)):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def sec(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + leb_u(len(payload)) + payload


def vec(items: list[bytes]) -> bytes:
    return leb_u(len(items)) + b"".join(items)


I32, I64 = 0x7F, 0x7E


def functype(params: list[int], results: list[int]) -> bytes:
    return bytes([0x60]) + vec([bytes([p]) for p in params]) + vec(
        [bytes([r]) for r in results]
    )


# -- opcode helpers ---------------------------------------------------------
def i32c(v: int) -> bytes:
    return b"\x41" + leb_s(v)


def i64c(v: int) -> bytes:
    return b"\x42" + leb_s(v)


def lget(i: int) -> bytes:
    return b"\x20" + leb_u(i)


def lset(i: int) -> bytes:
    return b"\x21" + leb_u(i)


LOAD32 = b"\x28\x02\x00"       # i32.load align=4 offset=0
STORE32 = b"\x36\x02\x00"
END = b"\x0b"


def load32_off(off: int) -> bytes:
    return b"\x28\x02" + leb_u(off)


def store32_off(off: int) -> bytes:
    return b"\x36\x02" + leb_u(off)


def func(local_decls: list[tuple[int, int]], body: bytes) -> bytes:
    locs = vec([leb_u(cnt) + bytes([t]) for cnt, t in local_decls])
    payload = locs + body + END
    return leb_u(len(payload)) + payload


def fnv1a_64(name: str) -> int:
    h = 0xCBF29CE484222325
    for b in name.encode():
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


P = (1 << 31) - 1
# memory layout (module-owned, 1 page)
SHARED = 0      # 4-byte shared RW buffer (n32 = 1)
WIT0 = 16       # witness[0] == 1
SIG_A = 24      # input signal a
SIG_B = 28      # input signal b


def build_circom_toy() -> bytes:
    """Toy circom-2-ABI witness module; witness = [1, a*b mod p, a, b]."""
    types = [
        functype([], [I32]),            # 0: () -> i32
        functype([I32], []),            # 1: (i32) -> ()
        functype([I32], [I32]),         # 2: (i32) -> i32
        functype([I32, I32], []),       # 3: (i32,i32) -> ()
        functype([I32, I32, I32], []),  # 4: (i32,i32,i32) -> ()
        functype([], []),               # 5: () -> ()
    ]
    # imports: runtime.exceptionHandler : (i32) -> ()   => function index 0
    imports = [
        vec([b"runtime"])[1:] and b""  # placeholder, built below
    ]
    imp = (
        leb_u(1)
        + leb_u(7) + b"runtime"
        + leb_u(16) + b"exceptionHandler"
        + b"\x00" + leb_u(1)
    )

    # function indices: 0 = import; defined funcs start at 1
    GET_VERSION, GET_N32, GET_RAW_PRIME, READ_SH, WRITE_SH = 1, 2, 3, 4, 5
    SET_INPUT, INIT, GET_WSIZE, GET_WITNESS, SUM_RANGE = 6, 7, 8, 9, 10
    func_types = [0, 0, 5, 2, 3, 4, 1, 0, 1, 2]

    bodies = []
    # getVersion: 2
    bodies.append(func([], i32c(2)))
    # getFieldNumLen32: 1
    bodies.append(func([], i32c(1)))
    # getRawPrime: mem[SHARED] = P
    bodies.append(func([], i32c(SHARED) + i32c(P) + STORE32))
    # readSharedRWMemory(i): load(SHARED + 4*i)
    bodies.append(
        func([], lget(0) + i32c(2) + b"\x74" + i32c(SHARED) + b"\x6a" + LOAD32)
    )  # (i << 2) + SHARED
    # writeSharedRWMemory(i, v): store(SHARED + 4*i, v)
    bodies.append(
        func(
            [],
            lget(0) + i32c(2) + b"\x74" + i32c(SHARED) + b"\x6a" + lget(1) + STORE32,
        )
    )
    # setInputSignal(msb, lsb, pos): h = msb<<32 | lsb (as i64)
    #   if h == fnv("a"): mem[SIG_A] = mem[SHARED]
    #   elif h == fnv("b"): mem[SIG_B] = mem[SHARED]
    #   else: exceptionHandler(6)
    h64 = (
        lget(0) + b"\xad" + i64c(32) + b"\x86"      # extend_u(msb) << 32
        + lget(1) + b"\xad" + b"\x84"               # | extend_u(lsb)
    )
    set_input = (
        h64 + i64c(fnv1a_64("a")) + b"\x51"         # i64.eq
        + b"\x04\x40"                               # if (empty)
        + i32c(SIG_A) + i32c(SHARED) + LOAD32 + STORE32
        + b"\x05"                                   # else
        + h64 + i64c(fnv1a_64("b")) + b"\x51"
        + b"\x04\x40"
        + i32c(SIG_B) + i32c(SHARED) + LOAD32 + STORE32
        + b"\x05"
        + i32c(6) + b"\x10" + leb_u(0)              # call exceptionHandler
        + END                                       # inner if end
        + END                                       # outer if end
    )
    bodies.append(func([], set_input))
    # init(sanity): mem[WIT0] = 1
    bodies.append(func([], i32c(WIT0) + i32c(1) + STORE32))
    # getWitnessSize: 4
    bodies.append(func([], i32c(4)))
    # getWitness(i): block dispatch; result -> mem[SHARED]
    #   w1 = wrap_i64(extend_u(a) * extend_u(b) rem_u extend_u(P))
    w1 = (
        i32c(SIG_A) + LOAD32 + b"\xad"
        + i32c(SIG_B) + LOAD32 + b"\xad"
        + b"\x7e"                      # i64.mul
        + i64c(P) + b"\x82"            # i64.rem_u
        + b"\xa7"                      # i32.wrap_i64
    )

    def store_shared(val_code: bytes) -> bytes:
        return i32c(SHARED) + val_code + STORE32

    get_witness = (
        # br_table over i within nested blocks
        b"\x02\x40"                       # block $done
        + b"\x02\x40" + b"\x02\x40" + b"\x02\x40" + b"\x02\x40"
        + lget(0)
        + b"\x0e" + leb_u(4) + leb_u(0) + leb_u(1) + leb_u(2) + leb_u(3) + leb_u(3)
        + END                             # target 0: witness[0]
        + store_shared(i32c(WIT0) + LOAD32)
        + b"\x0c" + leb_u(3)              # br $done
        + END                             # target 1: a*b mod p
        + store_shared(w1)
        + b"\x0c" + leb_u(2)
        + END                             # target 2: a
        + store_shared(i32c(SIG_A) + LOAD32)
        + b"\x0c" + leb_u(1)
        + END                             # target 3 (and default): b
        + store_shared(i32c(SIG_B) + LOAD32)
        + END                             # $done
    )
    bodies.append(func([], get_witness))
    # sumRange(n): loop accumulator, exercises loop/br_if/locals
    #   s = 0; i = 0; while (i != n) { i += 1; s += i; } return s
    sum_range = (
        b"\x02\x40"                        # block
        + b"\x03\x40"                      # loop
        + lget(0) + lget(1) + b"\x46"      # i32.eq (n == i)
        + b"\x0d" + leb_u(1)               # br_if block (exit)
        + lget(1) + i32c(1) + b"\x6a" + lset(1)
        + lget(2) + lget(1) + b"\x6a" + lset(2)
        + b"\x0c" + leb_u(0)               # br loop
        + END + END
        + lget(2)
    )
    bodies.append(func([(2, I32)], sum_range))

    exports = [
        (b"getVersion", GET_VERSION), (b"getFieldNumLen32", GET_N32),
        (b"getRawPrime", GET_RAW_PRIME), (b"readSharedRWMemory", READ_SH),
        (b"writeSharedRWMemory", WRITE_SH), (b"setInputSignal", SET_INPUT),
        (b"init", INIT), (b"getWitnessSize", GET_WSIZE),
        (b"getWitness", GET_WITNESS), (b"sumRange", SUM_RANGE),
    ]
    exp = vec(
        [leb_u(len(n)) + n + b"\x00" + leb_u(i) for n, i in exports]
    )

    module = (
        b"\x00asm" + struct.pack("<I", 1)
        + sec(1, vec(types))
        + sec(2, imp)
        + sec(3, vec([leb_u(t) for t in func_types]))
        + sec(5, vec([b"\x00" + leb_u(1)]))       # memory: min 1 page
        + sec(7, exp)
        + sec(10, vec(bodies))
    )
    return module
