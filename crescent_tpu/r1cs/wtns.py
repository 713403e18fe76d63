"""circom .wtns (witness) binary format reader/writer.

Format per iden3's wtns spec (what `snarkjs wtns` and the reference's
witness calculator emit — forks/circom-compat/src/witness/witness_calculator.rs
produces the same vector this file serializes): little-endian,
  magic "wtns" | version u32 (2) | n_sections u32 (2)
  section 1 (header): type u32 = 1, size u64, then
      field_size u32, prime (field_size bytes LE), n_witness u32
  section 2 (data): type u32 = 2, size u64, then n_witness values of
      field_size bytes each (LE), wire 0 (the constant one) first.
"""

from __future__ import annotations

import io
import struct

from ..core.fields import BN254_FR

MAGIC = b"wtns"


def read_wtns(path_or_bytes) -> tuple[int, list[int]]:
    """Returns (prime, witness values [wire0=1, publics..., privates...])."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        f = io.BytesIO(path_or_bytes)
    else:
        f = open(path_or_bytes, "rb")
    with f:
        assert f.read(4) == MAGIC, "not a wtns file"
        (version,) = struct.unpack("<I", f.read(4))
        assert version in (1, 2), f"unsupported wtns version {version}"
        (n_sections,) = struct.unpack("<I", f.read(4))
        sections = {}
        for _ in range(n_sections):
            (stype,) = struct.unpack("<I", f.read(4))
            (size,) = struct.unpack("<Q", f.read(8))
            sections[stype] = f.read(size)
        hdr = io.BytesIO(sections[1])
        (field_size,) = struct.unpack("<I", hdr.read(4))
        prime = int.from_bytes(hdr.read(field_size), "little")
        (n_wit,) = struct.unpack("<I", hdr.read(4))
        data = io.BytesIO(sections[2])
        out = [
            int.from_bytes(data.read(field_size), "little") for _ in range(n_wit)
        ]
    return prime, out


def write_wtns(path: str, witness: list[int], prime: int = BN254_FR) -> None:
    field_size = 32
    hdr = struct.pack("<I", field_size)
    hdr += prime.to_bytes(field_size, "little")
    hdr += struct.pack("<I", len(witness))
    data = b"".join(int(w % prime).to_bytes(field_size, "little") for w in witness)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<I", 2))
        for stype, payload in ((1, hdr), (2, data)):
            f.write(struct.pack("<I", stype))
            f.write(struct.pack("<Q", len(payload)))
            f.write(payload)
