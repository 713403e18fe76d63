"""ctypes binding + build driver for the native WASM interpreter.

Compiles crescent_tpu/native/wasmvm.cpp on first use (cached by source hash,
same scheme as backend.py) and exposes a minimal instance API used by
r1cs/wasm_witness.py to execute circom-generated witness modules — the role
wasmer 2.3 plays in the reference
(forks/circom-compat/src/witness/witness_calculator.rs:56).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wasmvm.cpp")
_lock = threading.Lock()


@functools.lru_cache(maxsize=1)
def _lib():
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "crescent_tpu_native"
        )
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"libwasmvm-{tag}.so")
        with _lock:
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-o", tmp, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.wvm_load.restype = ctypes.c_void_p
        lib.wvm_load.argtypes = [u8p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64]
        lib.wvm_free.argtypes = [ctypes.c_void_p]
        lib.wvm_call.restype = ctypes.c_int32
        lib.wvm_call.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, u64p, ctypes.c_int32,
            u64p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.wvm_exception.restype = ctypes.c_int64
        lib.wvm_exception.argtypes = [ctypes.c_void_p]
        lib.wvm_mem_size.restype = ctypes.c_uint64
        lib.wvm_mem_size.argtypes = [ctypes.c_void_p]
        lib.wvm_mem_read.restype = ctypes.c_int32
        lib.wvm_mem_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64, u8p, ctypes.c_uint64]
        lib.wvm_set_fuel.restype = None
        lib.wvm_set_fuel.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        return lib
    except Exception:
        return None


def available() -> bool:
    return _lib() is not None


class WasmTrap(RuntimeError):
    def __init__(self, msg: str, exception_code: int = -1):
        super().__init__(msg)
        self.exception_code = exception_code


class WasmInstance:
    """One loaded wasm module instance (memory + globals are per-instance)."""

    def __init__(self, module_bytes: bytes):
        lib = _lib()
        if lib is None:
            raise RuntimeError("no C++ toolchain for the wasm interpreter")
        self._lib = lib
        err = ctypes.create_string_buffer(512)
        buf = (ctypes.c_uint8 * len(module_bytes)).from_buffer_copy(module_bytes)
        self._h = lib.wvm_load(buf, len(module_bytes), err, len(err))
        if not self._h:
            raise WasmTrap(f"wasm load failed: {err.value.decode()}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.wvm_free(self._h)
            self._h = None

    def call(self, name: str, *args: int) -> list[int]:
        """Call an exported function; ints in, ints out (i32 zero-extended)."""
        lib = self._lib
        n = len(args)
        a = (ctypes.c_uint64 * max(n, 1))(*[v & 0xFFFFFFFFFFFFFFFF for v in args])
        out = (ctypes.c_uint64 * 8)()
        err = ctypes.create_string_buffer(512)
        rc = lib.wvm_call(self._h, name.encode(), a, n, out, 8, err, len(err))
        if rc < 0:
            raise WasmTrap(
                err.value.decode(), exception_code=int(lib.wvm_exception(self._h))
            )
        return [int(out[i]) for i in range(rc)]

    def set_fuel(self, fuel: int) -> None:
        """Bound the instruction budget per call (0 = unlimited); a call
        exceeding it traps instead of looping forever on hostile modules."""
        self._lib.wvm_set_fuel(self._h, fuel)

    def mem_read(self, addr: int, n: int) -> bytes:
        dst = (ctypes.c_uint8 * n)()
        if self._lib.wvm_mem_read(self._h, addr, dst, n) != 0:
            raise WasmTrap("memory read out of bounds")
        return bytes(dst)
