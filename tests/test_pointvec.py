"""ArrayPointVec: byte-exact ser/deser + conversion fast paths.

The vectorized layouts must be indistinguishable from the per-point
Python paths (utils/serialize.py, native/backend.py conversions) — the
ark byte schema is API surface (creds/src/utils.rs:140-197)."""

import random

import numpy as np
import pytest

from crescent_tpu.utils.pointvec import ArrayPointVec
from crescent_tpu.utils import ark
from crescent_tpu.utils.serialize import (
    ser_g1_uncompressed,
    ser_g2_uncompressed,
)


def _g1_points(rng, n):
    from crescent_tpu.models.groth16 import G1

    g = G1.generator
    pts = [G1.mul(rng.randrange(1, G1.n), g) for _ in range(n - 2)]
    return [None, g] + pts


def _g2_points(rng, n):
    from crescent_tpu.core.curves import BN254G2

    g = BN254G2.generator()
    pts = [BN254G2.mul(rng.randrange(1, BN254G2.n), g) for _ in range(n - 2)]
    return [g, None] + pts


@pytest.mark.parametrize("g2", [False, True])
def test_ser_deser_roundtrip_byte_exact(g2):
    rng = random.Random(7)
    pts = _g2_points(rng, 9) if g2 else _g1_points(rng, 9)
    vec = ArrayPointVec.from_points(pts, g2=g2)
    item = ser_g2_uncompressed if g2 else ser_g1_uncompressed
    ref_bytes = b"".join(item(p) for p in pts)
    assert vec.ser_items_uncompressed() == ref_bytes
    # ser_list fast path == per-item path
    assert ark.ser_list(vec, item) == ark.ser_list(pts, item)
    # bulk reader == per-item reader
    back, nread = ArrayPointVec.deser_uncompressed(ref_bytes, len(pts), g2=g2)
    assert nread == len(ref_bytes)
    assert list(back) == pts
    # item access / slicing
    assert back[0] == pts[0] and back[-1] == pts[-1]
    assert list(back[2:5]) == pts[2:5]
    assert len(back[2:5]) == 3


def test_native_u64_layouts_match():
    from crescent_tpu.native import backend as nb

    rng = random.Random(8)
    g1 = _g1_points(rng, 7)
    vec = ArrayPointVec.from_points(g1)
    ref = nb.points_to_u64(list(g1))
    np.testing.assert_array_equal(vec.to_u64(), ref)

    g2 = _g2_points(rng, 6)
    vec2 = ArrayPointVec.from_points(g2, g2=True)
    ref2 = nb.g2_to_u64(list(g2))
    np.testing.assert_array_equal(vec2.to_u64(), ref2)


@pytest.mark.parametrize("g2", [False, True])
def test_points_to_device_fast_path(g2):
    from crescent_tpu.models.groth16 import G1
    from crescent_tpu.ops.ec import get_curve_ctx, get_g2_ctx

    rng = random.Random(9)
    pts = _g2_points(rng, 8) if g2 else _g1_points(rng, 8)
    ctx = get_g2_ctx() if g2 else get_curve_ctx(G1)
    vec = ArrayPointVec.from_points(pts, g2=g2)
    P = ctx.points_to_device(vec)
    assert ctx.points_to_host(P) == pts


def test_reader_point_vec_in_proving_key_layout():
    """deser_proving_key's point_vec fields round-trip through ser_list."""
    rng = random.Random(10)
    pts = _g1_points(rng, 5)
    buf = ark.ser_list(pts, ser_g1_uncompressed)
    r = ark.Reader(buf)
    vec = r.point_vec()
    r.done()
    assert list(vec) == pts
