"""Fused limb-major EC point-add kernels in Pallas (TPU).

The XLA limb path (ops/limb.py + ops/ec.py) keeps field elements batch-major
(..., 16) and materializes every intermediate of every Montgomery multiply in
HBM — ~6-8 KB of traffic per element per multiply, ~40x the essential bytes
(PERF.md "root cause").  These kernels flip the layout to limb-major
(16, batch) tiles — limbs on sublanes, batch on the 128-wide lane axis — and
fuse an entire Jacobian point operation (~18-26 Montgomery multiplies plus
the complete-addition case analysis) into ONE Pallas kernel: inputs/outputs
are the only HBM traffic (512 B/element for a mixed add), all intermediates
live in VMEM/registers.

This is the TPU-native replacement for the reference's x86-asm field backend
(forks/halo2curves derive/src/field/asm/limb4.rs) on the Pippenger hot path
(forks/halo2curves/src/msm.rs:336-464); formulas match ops/ec.py
(dbl-2007-bl / add-2007-bl / madd-2007-bl, complete via branchless selects)
and are validated bit-exactly against it in tests/test_pallas_ec.py.

Layout contract: a batch of field elements is (16, B) uint32, 16-bit limbs
little-endian on the SUBLANE axis, B a multiple of the lane tile.  All
arithmetic is u32 vector ops; partial products are split into lo/hi 16-bit
planes (<= 16 terms of < 2^16 each, no overflow) and carries resolved with a
Kogge-Stone sweep along sublanes — identical math to ops/limb.py, different
axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import limb as limb_mod
from .limb import LIMB_BITS, LIMB_MASK, NLIMB, U32

L = NLIMB  # 16 limbs


# ---------------------------------------------------------------------------
# In-kernel field primitives on (nlimb, B) u32 planes
# ---------------------------------------------------------------------------

def _shift_up(a, s):
    """Limb k -> k+s along the sublane axis (zeros in at the bottom)."""
    return jnp.pad(a[: a.shape[0] - s], ((s, 0), (0, 0)))


def _ks_carry(v):
    """Kogge-Stone carry resolve for limbs v <= 2^17-1.
    Returns (digits < 2^16, carry-out (1, B))."""
    M = v.shape[0]
    g = v >> LIMB_BITS
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(U32)
    s = 1
    while s < M:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s *= 2
    out = (v + _shift_up(g, 1)) & LIMB_MASK
    return out, g[M - 1 : M]


def _carry(acc, out_len):
    """Normalize (M, B) accumulator limbs (< 2^31) to < 2^16, width out_len."""
    M, B = acc.shape
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS
    z = jnp.zeros((1, B), U32)
    v = jnp.concatenate([d, z], 0) + jnp.concatenate([z, c], 0)  # <= 2^17-1
    out, _ = _ks_carry(v)
    if out_len <= M + 1:
        return out[:out_len]
    return jnp.pad(out, ((0, out_len - M - 1), (0, 0)))


def _mul_acc(x, y, out_len):
    """Schoolbook product planes: (16,B) x (16,B) -> (out_len,B) limbs < 2^21.

    Each row-product is shifted into place with a static pad and summed —
    pure vector adds (jnp .at[].add lowers to scatter-add, which Mosaic TPU
    has no lowering for).  Accumulates the full 2L width (<= 32 terms of
    < 2^16 each, no u32 overflow), then truncates."""
    B = x.shape[1]
    width = 2 * L + 1
    acc = jnp.zeros((width, B), U32)
    for i in range(L):
        p = x[i : i + 1] * y  # (L, B) exact u32 products
        lo = jnp.pad(p & LIMB_MASK, ((i, width - L - i), (0, 0)))
        hi = jnp.pad(p >> LIMB_BITS, ((i + 1, width - L - i - 1), (0, 0)))
        acc = acc + lo + hi
    return acc[:out_len]


def _sub_raw(x, y):
    """x - y with borrow: ((M,B) limbs, (1,B) borrow). Two's-complement."""
    M, B = x.shape
    v = x + (LIMB_MASK - y)
    # +1 at limb 0 (a scatter-free form: .at[].add captures constant
    # scatter-index arrays, which Pallas kernels cannot close over)
    v = v + jnp.pad(jnp.ones((1, B), U32), ((0, M - 1), (0, 0)))
    out, carry = _ks_carry(v)
    return out, 1 - carry


class _F:
    """Field ops over (16, B) planes for one modulus.  Constants (modulus,
    -N^-1 mod R, R mod N) arrive as (16, 1) traced slices of the kernel's
    consts operand — Pallas kernels cannot capture array constants."""

    def __init__(self, n, ninv, one_mont):
        self.n = n
        self.ninv = ninv
        self.one_mont = one_mont

    def cond_sub(self, x17):
        n17 = jnp.pad(jnp.broadcast_to(self.n, (L, x17.shape[1])), ((0, 1), (0, 0)))
        diff, borrow = _sub_raw(x17, n17)
        return jnp.where(borrow.astype(bool), x17, diff)[:L]

    def mont_mul(self, x, y):
        t = _carry(_mul_acc(x, y, 2 * L), 2 * L)
        m = _carry(_mul_acc(t[:L], jnp.broadcast_to(self.ninv, x.shape), L), L)
        s = _mul_acc(m, jnp.broadcast_to(self.n, x.shape), 2 * L)  # < 2^21
        u = _carry(t + s, 2 * L + 1)  # t+s < 2^22
        return self.cond_sub(u[L : 2 * L + 1])

    def sqr(self, x):
        return self.mont_mul(x, x)

    def add(self, x, y):
        return self.cond_sub(_carry(x + y, L + 1))

    def sub(self, x, y):
        diff, borrow = _sub_raw(x, y)
        plus = _carry(diff + jnp.broadcast_to(self.n, x.shape), L)
        return jnp.where(borrow.astype(bool), plus, diff)

    def neg(self, x):
        return self.sub(jnp.zeros_like(x), x)

    def dbl(self, x):
        return self.add(x, x)

    def is_zero(self, x):
        return jnp.all(x == 0, axis=0, keepdims=True)  # (1, B) bool

    @staticmethod
    def sel(mask, a, b):
        """mask (1,B) bool/int: mask ? a : b."""
        return jnp.where(mask.astype(bool), a, b)


# ---------------------------------------------------------------------------
# Point formulas (mirror ops/ec.py exactly; Jacobian, identity Z == 0)
# ---------------------------------------------------------------------------

def _double(f: _F, a_mont, a_is_zero, X1, Y1, Z1):
    XX = f.sqr(X1)
    YY = f.sqr(Y1)
    YYYY = f.sqr(YY)
    ZZ = f.sqr(Z1)
    S = f.sqr(f.add(X1, YY))
    S = f.sub(f.sub(S, XX), YYYY)
    S = f.add(S, S)
    M = f.add(f.add(XX, XX), XX)
    if not a_is_zero:
        M = f.add(M, f.mont_mul(jnp.broadcast_to(a_mont, ZZ.shape), f.sqr(ZZ)))
    T = f.sub(f.sqr(M), f.add(S, S))
    e8 = f.dbl(f.dbl(f.dbl(YYYY)))
    Y3 = f.sub(f.mont_mul(M, f.sub(S, T)), e8)
    Z3 = f.sub(f.sub(f.sqr(f.add(Y1, Z1)), YY), ZZ)
    return T, Y3, Z3


def _madd_body(f: _F, a_mont, a_is_zero, X1, Y1, Z1, qx, qy, valid, sign):
    """Mixed add P + (sign ? -Q : Q), passthrough when valid == 0."""
    qy = f.sel(sign, f.neg(qy), qy)
    Z1Z1 = f.sqr(Z1)
    U2 = f.mont_mul(qx, Z1Z1)
    S2 = f.mont_mul(f.mont_mul(qy, Z1), Z1Z1)
    H = f.sub(U2, X1)
    r = f.sub(S2, Y1)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(r)
    p_inf = f.is_zero(Z1)

    HH = f.sqr(H)
    I = f.add(f.add(HH, HH), f.add(HH, HH))
    J = f.mont_mul(H, I)
    rr = f.add(r, r)
    V = f.mont_mul(X1, I)
    X3 = f.sub(f.sub(f.sqr(rr), J), f.add(V, V))
    YJ = f.mont_mul(Y1, J)
    Y3 = f.sub(f.mont_mul(rr, f.sub(V, X3)), f.add(YJ, YJ))
    Z3 = f.sub(f.sub(f.sqr(f.add(Z1, H)), Z1Z1), HH)

    dX, dY, dZ = _double(f, a_mont, a_is_zero, X1, Y1, Z1)

    same = h_zero & r_zero & ~p_inf
    negs = h_zero & ~r_zero & ~p_inf

    one = jnp.broadcast_to(f.one_mont, Z1.shape)
    x = f.sel(p_inf, qx, f.sel(same, dX, X3))
    y = f.sel(p_inf, qy, f.sel(same, dY, Y3))
    z = f.sel(p_inf, one, f.sel(same, dZ, Z3))
    z = f.sel(negs, jnp.zeros_like(z), z)
    x = f.sel(valid, x, X1)
    y = f.sel(valid, y, Y1)
    z = f.sel(valid, z, Z1)
    return x, y, z


def _jadd_body(f: _F, a_mont, a_is_zero, X1, Y1, Z1, X2, Y2, Z2):
    """Complete Jacobian + Jacobian addition."""
    Z1Z1 = f.sqr(Z1)
    Z2Z2 = f.sqr(Z2)
    U1 = f.mont_mul(X1, Z2Z2)
    U2 = f.mont_mul(X2, Z1Z1)
    S1 = f.mont_mul(f.mont_mul(Y1, Z2), Z2Z2)
    S2 = f.mont_mul(f.mont_mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    r = f.sub(S2, S1)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(r)
    p_inf = f.is_zero(Z1)
    q_inf = f.is_zero(Z2)

    I = f.sqr(f.add(H, H))
    J = f.mont_mul(H, I)
    rr = f.add(r, r)
    V = f.mont_mul(U1, I)
    X3 = f.sub(f.sub(f.sqr(rr), J), f.add(V, V))
    SJ = f.mont_mul(S1, J)
    Y3 = f.sub(f.mont_mul(rr, f.sub(V, X3)), f.add(SJ, SJ))
    Z3 = f.mont_mul(f.sub(f.sub(f.sqr(f.add(Z1, Z2)), Z1Z1), Z2Z2), H)

    dX, dY, dZ = _double(f, a_mont, a_is_zero, X1, Y1, Z1)

    same = h_zero & r_zero & ~p_inf & ~q_inf
    negs = h_zero & ~r_zero & ~p_inf & ~q_inf

    x = f.sel(p_inf, X2, f.sel(q_inf, X1, f.sel(same, dX, X3)))
    y = f.sel(p_inf, Y2, f.sel(q_inf, Y1, f.sel(same, dY, Y3)))
    z = f.sel(p_inf, Z2, f.sel(q_inf, Z1, f.sel(same, dZ, Z3)))
    z = f.sel(negs, jnp.zeros_like(z), z)
    return x, y, z


# ---------------------------------------------------------------------------
# Pallas kernels + host-callable wrappers
# ---------------------------------------------------------------------------

def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


class PallasEC:
    """Fused limb-major point ops for one prime-field curve.

    Arrays are (16, N) uint32 Montgomery-form planes, N a multiple of
    `block`.  `madd`: mixed add with per-lane valid/sign flags.  `jadd`:
    complete Jacobian add.
    """

    def __init__(self, modulus: int, a_host: int, block: int = 512):
        self.modulus = modulus
        self.block = block
        self.a_is_zero = a_host == 0
        R = 1 << (LIMB_BITS * NLIMB)
        # consts operand: columns [N, -N^-1 mod R, R mod N (mont 1), a*R mod N].
        # Built in numpy, NOT jnp: get_pallas_ec is lru-cached and may first
        # fire inside a jit trace, where jnp ops return tracers that would be
        # cached and leak into later traces (UnexpectedTracerError).
        self.consts = np.stack(
            [
                np.asarray(limb_mod.int_to_limbs(modulus), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs((-pow(modulus, -1, R)) % R), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs(R % modulus), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs(a_host * R % modulus), dtype=np.uint32),
            ],
            axis=1,
        )  # (16, 4)
        self._madd_call = {}
        self._jadd_call = {}

    # -- kernels ------------------------------------------------------------
    def _madd_kernel(self, consts, x1, y1, z1, qx, qy, flags, ox, oy, oz):
        cc = consts[:]
        f = _F(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3])
        valid = flags[0:1] != 0
        sign = flags[1:2] != 0
        x, y, z = _madd_body(
            f, cc[:, 3:4], self.a_is_zero,
            x1[:], y1[:], z1[:], qx[:], qy[:], valid, sign,
        )
        ox[:], oy[:], oz[:] = x, y, z

    def _jadd_kernel(self, consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        cc = consts[:]
        f = _F(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3])
        x, y, z = _jadd_body(
            f, cc[:, 3:4], self.a_is_zero,
            x1[:], y1[:], z1[:], x2[:], y2[:], z2[:],
        )
        ox[:], oy[:], oz[:] = x, y, z

    def _get_call(self, cache, kernel, n_elem, n_in, flag_rows=0):
        bt = min(self.block, n_elem)
        assert n_elem % bt == 0, (n_elem, bt)
        key = n_elem
        if key not in cache:
            eb = pl.BlockSpec((L, bt), lambda i: (0, i))
            specs = [pl.BlockSpec((L, 4), lambda i: (0, 0))] + [eb] * n_in
            if flag_rows:
                specs.append(pl.BlockSpec((flag_rows, bt), lambda i: (0, i)))
            out_shape = jax.ShapeDtypeStruct((L, n_elem), U32)
            cache[key] = pl.pallas_call(
                kernel,
                grid=(n_elem // bt,),
                in_specs=specs,
                out_specs=[eb, eb, eb],
                out_shape=[out_shape] * 3,
                interpret=_use_interpret(),
            )
        return cache[key]

    # -- public ops ---------------------------------------------------------
    @staticmethod
    def _pad(arrs, n, npad):
        if npad == n:
            return arrs
        return [jnp.pad(a, ((0, 0), (0, npad - n))) for a in arrs]

    def madd(self, x1, y1, z1, qx, qy, valid, sign):
        """(16,N) planes + flags (N,) -> (16,N) x3,y3,z3.

        N is padded internally to a multiple of the lane block; padded lanes
        carry valid==0 (passthrough of zero planes), then sliced away."""
        n = x1.shape[1]
        npad = -n % self.block + n
        flags = jnp.stack([valid.astype(U32), sign.astype(U32)], axis=0)
        x1, y1, z1, qx, qy, flags = self._pad([x1, y1, z1, qx, qy, flags], n, npad)
        call = self._get_call(self._madd_call, self._madd_kernel, npad, 5, flag_rows=2)
        ox, oy, oz = call(self.consts, x1, y1, z1, qx, qy, flags)
        return ox[:, :n], oy[:, :n], oz[:, :n]

    def jadd(self, x1, y1, z1, x2, y2, z2):
        """Complete Jacobian add on (16,N) planes (padded lanes are all-zero
        = identity + identity, discarded on slice-back)."""
        n = x1.shape[1]
        npad = -n % self.block + n
        ins = self._pad([x1, y1, z1, x2, y2, z2], n, npad)
        call = self._get_call(self._jadd_call, self._jadd_kernel, npad, 6)
        ox, oy, oz = call(self.consts, *ins)
        return ox[:, :n], oy[:, :n], oz[:, :n]


@functools.lru_cache(maxsize=None)
def get_pallas_ec(modulus: int, a_host_mod: int, block: int = 512) -> PallasEC:
    return PallasEC(modulus, a_host_mod, block)
