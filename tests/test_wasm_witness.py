"""Native WASM interpreter + circom-2 witness protocol tests.

The interpreter (native/wasmvm.cpp) stands in for wasmer 2.3
(forks/circom-compat/src/witness/witness_calculator.rs:56); the fixture
module is hand-assembled (tests/wasm_fixture.py) because no circom-built
artifacts exist in-image.
"""

import pytest

from crescent_tpu.native import wasm_backend
from wasm_fixture import P, build_circom_toy

pytestmark = pytest.mark.skipif(
    not wasm_backend.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def toy():
    return build_circom_toy()


def test_interpreter_basics(toy):
    inst = wasm_backend.WasmInstance(toy)
    assert inst.call("getVersion") == [2]
    assert inst.call("getFieldNumLen32") == [1]
    # loop/br_if: sum 1..n
    assert inst.call("sumRange", 10) == [55]
    assert inst.call("sumRange", 0) == [0]
    assert inst.call("sumRange", 1000) == [500500]


def test_shared_rw_memory(toy):
    inst = wasm_backend.WasmInstance(toy)
    inst.call("writeSharedRWMemory", 0, 0xDEADBEEF)
    assert inst.call("readSharedRWMemory", 0) == [0xDEADBEEF]
    inst.call("getRawPrime")
    assert inst.call("readSharedRWMemory", 0) == [P]


def test_exception_handler_import(toy):
    from crescent_tpu.r1cs.wasm_witness import fnv1a_64

    inst = wasm_backend.WasmInstance(toy)
    msb, lsb = fnv1a_64("nonexistent")
    with pytest.raises(wasm_backend.WasmTrap) as e:
        inst.call("setInputSignal", msb, lsb, 0)
    assert e.value.exception_code == 6


def test_witness_calculator_protocol(toy):
    from crescent_tpu.r1cs.wasm_witness import WasmWitnessCalculator

    calc = WasmWitnessCalculator(toy)
    assert calc.prime == P
    assert calc.n32 == 1
    a, b = 123456789, 987654321
    w = calc.calculate_witness({"a": a, "b": b})
    assert w == [1, a * b % P, a, b]
    # values reduce mod prime on the way in
    w = calc.calculate_witness({"a": P + 5, "b": 2})
    assert w == [1, 10, 5, 2]


def test_witness_calculator_rejects_unknown_signal(toy):
    from crescent_tpu.r1cs.wasm_witness import WasmWitnessCalculator

    calc = WasmWitnessCalculator(toy)
    with pytest.raises(wasm_backend.WasmTrap):
        calc.calculate_witness({"zzz": 1})


def test_circom_config_builder(toy, tmp_path):
    """Full circom-artifact front door: (main.wasm, .r1cs) pair -> witness
    -> satisfied circuit (builder.rs:71 build + debug_assert)."""
    from crescent_tpu.r1cs.circom import CircomBuilder, CircomConfig
    from crescent_tpu.r1cs.reader import write_r1cs

    wasm_path = tmp_path / "main.wasm"
    wasm_path.write_bytes(toy)
    r1cs_path = tmp_path / "main.r1cs"
    # toy circuit over p = 2^31-1: wires [1, out, a, b]; constraint a*b = out
    write_r1cs(
        str(r1cs_path),
        [([(2, 1)], [(3, 1)], [(1, 1)])],
        n_wires=4, n_pub_out=1, n_pub_in=0, n_prv_in=2, prime=P,
    )
    cfg = CircomConfig(str(wasm_path), str(r1cs_path))
    builder = CircomBuilder(cfg)
    builder.push_inputs({"a": 1234, "b": 5678})
    circuit = builder.build()
    assert circuit.witness == [1, 1234 * 5678 % P, 1234, 5678]
    assert circuit.is_satisfied()
    r = circuit.to_r1cs()
    assert r.field == P and r.num_instance == 2 and r.num_witness == 2

    # unsatisfiable witness rejected: tamper the constraint system
    write_r1cs(
        str(r1cs_path),
        [([(2, 1)], [(3, 1)], [(1, 2)])],
        n_wires=4, n_pub_out=1, n_pub_in=0, n_prv_in=2, prime=P,
    )
    cfg2 = CircomConfig(str(wasm_path), str(r1cs_path))
    b2 = CircomBuilder(cfg2)
    b2.push_inputs({"a": 3, "b": 5})
    with pytest.raises(AssertionError):
        b2.build()
