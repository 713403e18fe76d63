"""circom WASM witness calculator (circom 2.x ABI) on the native interpreter.

Mirrors the reference's wasmer-backed calculator byte-for-byte at the
protocol level (forks/circom-compat/src/witness/witness_calculator.rs:155
`calculate_witness`, circom-2 path :220-250):

  init(sanity) -> for each input signal: write the value into the shared RW
  buffer 32 bits at a time (big-word first) + setInputSignal(fnv_msb,
  fnv_lsb, index) -> getWitnessSize() -> for each witness index:
  getWitness(i) + readSharedRWMemory(j) reassembly.

Signal names hash with 64-bit FNV-1a exactly as the reference's `fnv`
(witness/mod.rs:18).  circom 1 modules (getVersion absent/1) are rejected —
all four reference parameter sets compile with circom 2.1.6
(circuit_setup/scripts/run_setup.sh:155).
"""

from __future__ import annotations

from ..native.wasm_backend import WasmInstance, WasmTrap, available

__all__ = ["WasmWitnessCalculator", "WasmTrap", "available", "fnv1a_64"]


def fnv1a_64(name: str) -> tuple[int, int]:
    """(msb32, lsb32) of the 64-bit FNV-1a hash of `name` (fnv crate default)."""
    h = 0xCBF29CE484222325
    for b in name.encode():
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF


def _to_array32(value: int, n32: int) -> list[int]:
    """Little-endian-last split (witness_calculator.rs:41 to_array32):
    res[n32-1] holds the least-significant 32 bits."""
    res = [0] * n32
    rem = int(value)
    c = n32
    while rem:
        c -= 1
        res[c] = rem & 0xFFFFFFFF
        rem >>= 32
    return res


class WasmWitnessCalculator:
    """Executes a circom-produced main.wasm to compute circuit witnesses."""

    def __init__(self, wasm_bytes: bytes):
        self.instance = WasmInstance(wasm_bytes)
        version = 1
        try:
            version = self.instance.call("getVersion")[0]
        except WasmTrap:
            pass
        if version < 2:
            raise WasmTrap(
                f"circom wasm runtime version {version} unsupported (need 2)"
            )
        self.circom_version = version
        self.n32 = self.instance.call("getFieldNumLen32")[0]
        # prime: getRawPrime fills the shared buffer; words come back
        # least-significant first and are reassembled reversed
        # (witness_calculator.rs:100-107)
        self.instance.call("getRawPrime")
        words = [
            self.instance.call("readSharedRWMemory", i)[0] for i in range(self.n32)
        ]
        self.prime = 0
        for w in reversed(words):
            self.prime = (self.prime << 32) | w

    @classmethod
    def from_file(cls, path: str) -> "WasmWitnessCalculator":
        with open(path, "rb") as f:
            return cls(f.read())

    def calculate_witness(self, inputs, sanity_check: bool = False) -> list[int]:
        """inputs: {signal_name: int | list[int]} -> full witness vector
        (ints reduced mod prime by the module itself)."""
        inst = self.instance
        inst.call("init", 1 if sanity_check else 0)
        for name, values in dict(inputs).items():
            msb, lsb = fnv1a_64(name)
            if not isinstance(values, (list, tuple)):
                values = [values]
            for i, value in enumerate(values):
                arr = _to_array32(int(value) % self.prime, self.n32)
                for j in range(self.n32):
                    inst.call("writeSharedRWMemory", j, arr[self.n32 - 1 - j])
                inst.call("setInputSignal", msb, lsb, i)
        size = inst.call("getWitnessSize")[0]
        out = []
        for i in range(size):
            inst.call("getWitness", i)
            v = 0
            for j in reversed(range(self.n32)):
                v = (v << 32) | inst.call("readSharedRWMemory", j)[0]
            out.append(v)
        return out
