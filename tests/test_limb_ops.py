"""Bit-exact validation of the TPU limb arithmetic against the host oracle."""

import random

import numpy as np
import pytest

from crescent_tpu.core.fields import BN254_FQ, BN254_FR, P256_FP, T256_FP
from crescent_tpu.ops import limb

rng = random.Random(1234)

MODULI = [BN254_FR, BN254_FQ, P256_FP, T256_FP]


def rand_elems(m, n):
    return [rng.randrange(m) for _ in range(n)]


def test_limb_roundtrip():
    x = rng.randrange(1 << 256)
    assert limb.limbs_to_int(limb.int_to_limbs(x)) == x


def test_mul_wide_exact():
    xs = [rng.randrange(1 << 256) for _ in range(32)]
    ys = [rng.randrange(1 << 256) for _ in range(32)]
    xa = limb.ints_to_limbs(xs)
    ya = limb.ints_to_limbs(ys)
    prod = np.asarray(limb.mul_wide(xa, ya))
    for i in range(32):
        assert limb.limbs_to_int(prod[i]) == xs[i] * ys[i]


def test_mul_low_exact():
    xs = [rng.randrange(1 << 256) for _ in range(16)]
    ys = [rng.randrange(1 << 256) for _ in range(16)]
    out = np.asarray(limb.mul_low(limb.ints_to_limbs(xs), limb.ints_to_limbs(ys)))
    for i in range(16):
        assert limb.limbs_to_int(out[i]) == (xs[i] * ys[i]) % (1 << 256)


def test_sub_raw_borrow():
    a, b = 123456789, 999999999999
    xa = limb.ints_to_limbs([a, b])
    ya = limb.ints_to_limbs([b, a])
    diff, borrow = limb.sub_raw(xa, ya)
    assert int(borrow[0]) == 1 and int(borrow[1]) == 0
    assert limb.limbs_to_int(np.asarray(diff)[1]) == b - a
    assert limb.limbs_to_int(np.asarray(diff)[0]) == (a - b) % (1 << 256)


@pytest.mark.parametrize("m", MODULI)
def test_mont_mul_matches_host(m):
    ctx = limb.get_ctx(m)
    n = 64
    xs, ys = rand_elems(m, n), rand_elems(m, n)
    xm = ctx.to_mont_host(xs)
    ym = ctx.to_mont_host(ys)
    zm = ctx.mont_mul(xm, ym)
    zs = ctx.from_mont_host(np.asarray(zm))
    for i in range(n):
        assert zs[i] == xs[i] * ys[i] % m


@pytest.mark.parametrize("m", MODULI)
def test_add_sub_neg(m):
    ctx = limb.get_ctx(m)
    n = 32
    xs, ys = rand_elems(m, n), rand_elems(m, n)
    xm, ym = ctx.to_mont_host(xs), ctx.to_mont_host(ys)
    add = ctx.from_mont_host(np.asarray(ctx.add_mod(xm, ym)))
    sub = ctx.from_mont_host(np.asarray(ctx.sub_mod(xm, ym)))
    neg = ctx.from_mont_host(np.asarray(ctx.neg_mod(xm)))
    for i in range(n):
        assert add[i] == (xs[i] + ys[i]) % m
        assert sub[i] == (xs[i] - ys[i]) % m
        assert neg[i] == (-xs[i]) % m


def test_mont_conversions_on_device():
    ctx = limb.get_ctx(BN254_FR)
    xs = rand_elems(BN254_FR, 8)
    raw = limb.ints_to_limbs(xs)
    mont = ctx.to_mont(raw)
    back = ctx.from_mont(mont)
    assert limb.limbs_to_ints(np.asarray(back)) == xs


def test_pow_and_inv():
    ctx = limb.get_ctx(BN254_FR)
    xs = rand_elems(BN254_FR, 8)
    xm = ctx.to_mont_host(xs)
    inv = ctx.from_mont_host(np.asarray(ctx.inv_mod(xm)))
    for i in range(8):
        assert inv[i] * xs[i] % BN254_FR == 1
    cube = ctx.from_mont_host(np.asarray(ctx.mont_pow(xm, 3)))
    for i in range(8):
        assert cube[i] == pow(xs[i], 3, BN254_FR)


def test_batch_inv():
    ctx = limb.get_ctx(P256_FP)
    xs = rand_elems(P256_FP, 10)
    xm = ctx.to_mont_host(xs)
    inv = ctx.from_mont_host(np.asarray(ctx.batch_inv(xm)))
    for i in range(10):
        assert inv[i] * xs[i] % P256_FP == 1


def test_edge_values():
    """0, 1, N-1, and values straddling the conditional-subtract boundary."""
    m = BN254_FR
    ctx = limb.get_ctx(m)
    xs = [0, 1, m - 1, m - 2, 2]
    ys = [0, m - 1, m - 1, 1, m - 2]
    xm, ym = ctx.to_mont_host(xs), ctx.to_mont_host(ys)
    prod = ctx.from_mont_host(np.asarray(ctx.mont_mul(xm, ym)))
    add = ctx.from_mont_host(np.asarray(ctx.add_mod(xm, ym)))
    for i in range(len(xs)):
        assert prod[i] == xs[i] * ys[i] % m
        assert add[i] == (xs[i] + ys[i]) % m
