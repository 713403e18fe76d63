"""circom artifact front door: CircomConfig / CircomBuilder.

Mirrors forks/circom-compat/src/circom/builder.rs:13-27 (CircomConfig loads
the witness generator + .r1cs pair; CircomBuilder collects named inputs,
`setup()` yields the witness-less circuit for parameter generation and
`build()` computes the witness and sanity-checks satisfaction).  The wasmer
runtime is replaced by the native interpreter (r1cs/wasm_witness.py);
everything downstream (Groth16 setup/prove) consumes the same
models.groth16.R1CS container the rest of the framework uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .reader import R1CSFile, read_r1cs
from .wasm_witness import WasmWitnessCalculator


@dataclass
class CircomCircuit:
    """R1CS + optional witness (circom/circuit.rs:28 CircomCircuit)."""

    r1cs: R1CSFile
    witness: list[int] | None = None

    def to_r1cs(self):
        return self.r1cs.to_r1cs()

    def is_satisfied(self) -> bool:
        assert self.witness is not None, "no witness set (use build())"
        p = self.r1cs.prime
        w = self.witness

        def ev(lc):
            return sum(c * w[i] for i, c in lc) % p

        return all(
            ev(A) * ev(B) % p == ev(C) for A, B, C in self.r1cs.constraints
        )


class CircomConfig:
    """Loads a circom-produced (main.wasm, main_c.r1cs) artifact pair
    (builder.rs:27 CircomConfig::new)."""

    def __init__(self, wasm_path: str, r1cs_path: str, sanity_check: bool = False):
        self.wtns = WasmWitnessCalculator.from_file(wasm_path)
        self.r1cs = read_r1cs(r1cs_path)
        self.sanity_check = sanity_check
        assert self.wtns.prime == self.r1cs.prime, (
            "witness generator and r1cs disagree on the field prime"
        )


@dataclass
class CircomBuilder:
    """Collects named inputs and produces the witness-populated circuit
    (builder.rs:40-100)."""

    cfg: CircomConfig
    inputs: dict = field(default_factory=dict)

    def push_input(self, name: str, value) -> None:
        self.inputs.setdefault(name, []).append(int(value))

    def push_inputs(self, inputs: dict) -> None:
        for name, value in inputs.items():
            if isinstance(value, (list, tuple)):
                for v in value:
                    self.push_input(name, v)
            else:
                self.push_input(name, value)

    def setup(self) -> CircomCircuit:
        return CircomCircuit(r1cs=self.cfg.r1cs)

    def build(self) -> CircomCircuit:
        circuit = self.setup()
        circuit.witness = self.cfg.wtns.calculate_witness(
            self.inputs, self.cfg.sanity_check
        )
        assert circuit.is_satisfied(), "witness does not satisfy the R1CS"
        return circuit
