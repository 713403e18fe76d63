"""Fused limb-major EC point kernels in Pallas (TPU).

The XLA limb path (ops/limb.py + ops/ec.py) keeps field elements batch-major
(..., 16) and materializes every intermediate of every Montgomery multiply in
HBM.  These kernels flip the layout to limb-major (16, batch) tiles — limbs
on sublanes, batch on the 128-wide lane axis — and fuse whole point
operations into ONE Pallas kernel: inputs/outputs are the only HBM traffic,
all intermediates live in VMEM/registers.

Field-op design (measured on TPU v5e, profile_montmul.py):

* all intermediate shapes are sublane-aligned (16/32 rows); the earlier
  33/17-row pad/concat formulation forced Mosaic relayouts (58M -> 71M
  montmul/s just from alignment);
* the two by-constant products of Montgomery REDC (m = t*N' mod R, s = m*N)
  run on the MXU as byte-plane Toeplitz matmuls: inputs split to 8-bit
  planes (exact in bf16), constant matrices carry byte_{k-i}(const), f32
  accumulation of <= 32 terms < 2^16 stays < 2^22 (exact).  71M -> 83M
  montmul/s, and it frees VPU issue slots for the surrounding point math;
* only the variable*variable product x*y stays on the VPU (schoolbook with
  slice-accumulate; a batched outer product has no MXU formulation).

This replaces the reference's x86-asm field backend (forks/halo2curves
derive/src/field/asm/limb4.rs) on the Pippenger hot path
(forks/halo2curves/src/msm.rs:336-464); formulas match ops/ec.py
(dbl-2007-bl / add-2007-bl / madd-2007-bl, complete via branchless selects)
and are validated bit-exactly against it in tests/test_pallas_ec.py.

Layout contract: a batch of field elements is (16, B) uint32, 16-bit limbs
little-endian on the SUBLANE axis, B a multiple of the lane tile.
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


def _slice_add(acc, i, val):
    """acc[i:i+rows] += val via static slices + concat (no scatter — Mosaic
    TPU has no scatter-add lowering; static concat keeps rows aligned)."""
    rows = val.shape[0]
    parts = []
    if i > 0:
        parts.append(acc[:i])
    parts.append(acc[i:i + rows] + val)
    if i + rows < acc.shape[0]:
        parts.append(acc[i + rows:])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


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


def _mul_acc32(x, y):
    """Schoolbook product: (16,B) x (16,B) -> (32,B) limb accum (< 2^22).

    Slice-accumulate keeps every shape at 16/32 aligned rows; the top hi
    term lands on row 31 (i+j+1 <= 31), so 32 rows suffice exactly."""
    Bn = x.shape[1]
    acc = jnp.zeros((2 * L, Bn), U32)
    for i in range(L):
        p = x[i : i + 1] * y              # (16, B) exact u32 products
        acc = _slice_add(acc, i, p & LIMB_MASK)
        acc = _slice_add(acc, i + 1, p >> LIMB_BITS)
    return acc


def _carry32(acc):
    """Normalize (M,B) accumulator (< 2^31) to 16-bit limbs.
    Returns ((M,B) digits, (1,B) carry-out)."""
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS
    v = _slice_add(d, 1, c[:-1])          # <= 2^17 - 1
    out, ks = _ks_carry(v)
    return out, c[-1:] + ks


def _sub_raw(x, y):
    """x - y with borrow: ((M,B) limbs, (1,B) borrow). Two's-complement."""
    M, B = x.shape
    v = x + (LIMB_MASK - y)
    v = _slice_add(v, 0, jnp.ones((1, B), U32))
    out, carry = _ks_carry(v)
    return out, 1 - carry


def _to_byte_planes(x16):
    """(16,B) 16-bit limbs -> (32,B) byte planes (byte 2i=lo_i, 2i+1=hi_i)."""
    lo = x16 & 0xFF
    hi = x16 >> 8
    return jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(
        32, x16.shape[1]
    )


def _carry_bytes(acc):
    """(32,B) byte-significance accumulator (< 2^22) -> normalized bytes,
    mod 2^256 (carries beyond byte 31 dropped)."""
    d = acc & 0xFF
    c = acc >> 8
    v = _slice_add(d, 1, c[:-1])          # < 2^15
    d2 = v & 0xFF
    c2 = v >> 8
    v2 = _slice_add(d2, 1, c2[:-1])       # < 2^8 + 2^7
    g = v2 >> 8
    p = ((v2 & 0xFF) == 0xFF).astype(U32)
    s = 1
    M = v2.shape[0]
    while s < M:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s *= 2
    return (v2 + _shift_up(g, 1)) & 0xFF


def build_toeplitz_bytes(const: int, nbytes_in: int, nbytes_out: int) -> np.ndarray:
    """Byte-plane multiply-by-constant as a matmul: M[i,k] = byte_{k-i}(const).
    x (bytes) @ M accumulates sum_{i+j=k} x_i * c_j — schoolbook product in
    byte significance.  Entries < 2^8 are exact in bf16; <= 32 terms of
    < 2^16 keep the f32 accumulator exact (< 2^22)."""
    cb = [(const >> (8 * j)) & 0xFF for j in range(32)]
    M = np.zeros((nbytes_in, nbytes_out), np.float32)
    for i in range(nbytes_in):
        for j in range(32):
            if i + j < nbytes_out:
                M[i, i + j] = cb[j]
    return M


def _matmul_bytes(xb, M):
    """(32,B) byte planes x (32,Mout) constant -> (Mout,B) u32 accum (<2^22).
    Contracts the byte axis on the MXU; bf16 inputs are exact for values
    < 2^8 and the f32 accumulator is exact below 2^24."""
    acc = jax.lax.dot_general(
        M,
        xb.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc.astype(jnp.int32).astype(U32)


class _F:
    """Field ops over (16, B) planes for one modulus.  Constants (modulus,
    -N^-1 mod R, R mod N) arrive as (16, 1) traced slices of the kernel's
    consts operand; the REDC Toeplitz matrices as (32,32)/(32,64) operands —
    Pallas kernels cannot capture array constants."""

    def __init__(self, n, ninv, one_mont, m_ninv=None, m_n=None):
        self.n = n
        self.ninv = ninv
        self.one_mont = one_mont
        self.m_ninv = m_ninv
        self.m_n = m_n

    def _cond_sub_top(self, x16, xtop):
        """Value X = x16 + xtop*2^256 < 2N -> X mod N as (16,B)."""
        nb = jnp.broadcast_to(self.n, x16.shape)
        diff, borrow = _sub_raw(x16, nb)
        use_diff = (borrow - xtop) == 0      # x16>=N, or the top bit covers it
        return jnp.where(use_diff, diff, x16)

    def mont_reduce(self, t):
        """(32,B) t (16-bit limbs, t < N*R) -> t*R^-1 mod N."""
        if self.m_ninv is not None:
            tb = _to_byte_planes(t[:L])
            mb = _carry_bytes(_matmul_bytes(tb, self.m_ninv))   # bytes of m
            s_acc = _matmul_bytes(mb, self.m_n)                  # (64,B) bytes
            v = s_acc.reshape(32, 2, -1)
            s = v[:, 0] + (v[:, 1] << 8)                         # (32,B) < 2^30
        else:
            m, _ = _carry32(_mul_acc32(t[:L], jnp.broadcast_to(self.ninv, (L, t.shape[1]))))
            s = _mul_acc32(m[:L], jnp.broadcast_to(self.n, (L, t.shape[1])))
        out, top = _carry32(t + s)           # low L limbs == 0 by construction
        return self._cond_sub_top(out[L:], top)

    def mont_mul(self, x, y):
        t, _ = _carry32(_mul_acc32(x, y))    # carry-out of full product is 0
        return self.mont_reduce(t)

    def sqr(self, x):
        return self.mont_mul(x, x)

    def add(self, x, y):
        out, top = _carry32(x + y)
        return self._cond_sub_top(out, top)

    def sub(self, x, y):
        diff, borrow = _sub_raw(x, y)
        plus, _ = _carry32(diff + jnp.broadcast_to(self.n, x.shape))
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


class _F2:
    """Fq2 = Fq[u]/(u^2 + 1) over a base _F, on stacked planes (32, B):
    rows 0:16 the real component, rows 16:32 the imaginary one.

    Duck-types _F's method set, so every point-formula body in this file
    (_double, _madd_body, _jadd_body, _affine_*) compiles unchanged into a
    single fused Fq2 pallas kernel — the TPU-native analog of arkworks'
    generic `SWCurveConfig<Fp2>` (forks/halo2curves src/bn256/fq2.rs
    semantics; nonresidue -1, Karatsuba: 3 base muls per Fq2 mul)."""

    def __init__(self, base: "_F", one_base=None):
        self.b = base
        # base.one_mont is a lane-offset slice of the consts operand
        # (cc[:, 2:3] -> vreg offset {0,2}); Mosaic refuses to concatenate
        # operands whose non-concat-dim offsets differ, and elementwise +0
        # just propagates the offset.  A lane rotate (tpu.dynamic_rotate)
        # materializes a fresh offset-0 value, so callers pass
        # one_base = roll(cc, -2, axis=1)[:, 0:1].
        om = base.one_mont if one_base is None else one_base
        self.one_mont = jnp.concatenate([om, jnp.zeros((L, 1), U32)], axis=0)

    @staticmethod
    def _split(x):
        return x[:L], x[L:]

    def mont_mul(self, x, y):
        b = self.b
        x0, x1 = self._split(x)
        y0, y1 = self._split(y)
        t0 = b.mont_mul(x0, y0)
        t1 = b.mont_mul(x1, y1)
        t2 = b.mont_mul(b.add(x0, x1), b.add(y0, y1))
        return jnp.concatenate(
            [b.sub(t0, t1), b.sub(b.sub(t2, t0), t1)], axis=0
        )

    def sqr(self, x):
        b = self.b
        x0, x1 = self._split(x)
        c0 = b.mont_mul(b.add(x0, x1), b.sub(x0, x1))
        t = b.mont_mul(x0, x1)
        return jnp.concatenate([c0, b.add(t, t)], axis=0)

    def _map2(self, op, x, y):
        x0, x1 = self._split(x)
        y0, y1 = self._split(y)
        return jnp.concatenate([op(x0, y0), op(x1, y1)], axis=0)

    def add(self, x, y):
        return self._map2(self.b.add, x, y)

    def sub(self, x, y):
        return self._map2(self.b.sub, x, y)

    def neg(self, x):
        x0, x1 = self._split(x)
        return jnp.concatenate([self.b.neg(x0), self.b.neg(x1)], axis=0)

    def dbl(self, x):
        return self.add(x, x)

    def is_zero(self, x):
        return jnp.all(x == 0, axis=0, keepdims=True)  # (1, B) bool

    sel = staticmethod(_F.sel)


# ---------------------------------------------------------------------------
# Affine pair formulas (for the sorted-segment MSM accumulator, ops/msm_affine)
# ---------------------------------------------------------------------------

def _affine_denom_body(f: _F, lx, ly, lv, rx, ry, rv):
    """Denominator of the affine addition L + R for batch inversion:
    2*ly when L == R (doubling), 1 when the pair needs no division
    (either side invalid, or L == -R giving infinity), else rx - lx."""
    both = lv & rv
    same_x = f.is_zero(f.sub(rx, lx))
    same_y = f.is_zero(f.sub(ry, ly))
    one = jnp.broadcast_to(f.one_mont, lx.shape)
    d = f.sel(same_x & same_y, f.dbl(ly), f.sub(rx, lx))
    d = f.sel(both & ~(same_x & ~same_y), d, one)
    return d


def _affine_add_body(f: _F, a_mont, a_is_zero, lx, ly, lv, rx, ry, rv, inv):
    """Affine L + R given inv = 1/denominator (Montgomery form).

    Returns (x3, y3, valid3).  Cases: both valid & L==R -> double
    (lambda = (3*lx^2 + a) * inv, inv = 1/(2*ly)); both valid & L==-R ->
    infinity (valid 0); both valid else -> chord add; one valid ->
    passthrough; none -> invalid."""
    both = lv & rv
    same_x = f.is_zero(f.sub(rx, lx))
    same_y = f.is_zero(f.sub(ry, ly))
    dbl_case = same_x & same_y
    inf_case = same_x & ~same_y

    xx = f.sqr(lx)
    num_dbl = f.add(f.add(xx, xx), xx)
    if not a_is_zero:
        num_dbl = f.add(num_dbl, jnp.broadcast_to(a_mont, xx.shape))
    num = f.sel(dbl_case, num_dbl, f.sub(ry, ly))
    lam = f.mont_mul(num, inv)
    x3 = f.sub(f.sub(f.sqr(lam), lx), rx)
    y3 = f.sub(f.mont_mul(lam, f.sub(lx, x3)), ly)

    x = f.sel(both, x3, f.sel(lv, lx, rx))
    y = f.sel(both, y3, f.sel(lv, ly, ry))
    v = (lv | rv) & ~(both & inf_case)
    return x, y, v


# ---------------------------------------------------------------------------
# Pallas kernels + host-callable wrappers
# ---------------------------------------------------------------------------

def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


class PallasEC:
    """Fused limb-major point ops for one prime-field curve.

    Arrays are (16, N) uint32 Montgomery-form planes, N padded internally to
    a multiple of `block`.  `madd`: mixed add with per-lane valid/sign flags.
    `jadd`: complete Jacobian add.
    """

    ROWS = L  # u32 planes per field element (32 for the Fq2 subclass)

    def __init__(self, modulus: int, a_host: int, block: int = 512):
        self.modulus = modulus
        self.block = block
        self.a_is_zero = a_host == 0
        R = 1 << (LIMB_BITS * NLIMB)
        # consts operand: columns [N, -N^-1 mod R, R mod N (mont 1), a*R mod N].
        # Built in numpy, NOT jnp: get_pallas_ec is lru-cached and may first
        # fire inside a jit trace, where jnp ops return tracers that would be
        # cached and leak into later traces (UnexpectedTracerError).
        ninv_int = (-pow(modulus, -1, R)) % R
        self.consts = np.stack(
            [
                np.asarray(limb_mod.int_to_limbs(modulus), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs(ninv_int), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs(R % modulus), dtype=np.uint32),
                np.asarray(limb_mod.int_to_limbs(a_host * R % modulus), dtype=np.uint32),
            ],
            axis=1,
        )  # (16, 4)
        self.m_ninv = build_toeplitz_bytes(ninv_int, 32, 32)
        self.m_n = build_toeplitz_bytes(modulus, 32, 64)
        self._calls = {}

    def _field(self, consts_ref, mninv_ref, mn_ref):
        cc = consts_ref[:]
        return _F(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3], mninv_ref[:], mn_ref[:]), cc[:, 3:4]

    # -- kernels ------------------------------------------------------------
    def _madd_kernel(self, consts, mninv, mn, x1, y1, z1, qx, qy, flags, ox, oy, oz):
        f, a_mont = self._field(consts, mninv, mn)
        valid = flags[0:1] != 0
        sign = flags[1:2] != 0
        x, y, z = _madd_body(
            f, a_mont, self.a_is_zero,
            x1[:], y1[:], z1[:], qx[:], qy[:], valid, sign,
        )
        ox[:], oy[:], oz[:] = x, y, z

    def _jadd_kernel(self, consts, mninv, mn, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        f, a_mont = self._field(consts, mninv, mn)
        x, y, z = _jadd_body(
            f, a_mont, self.a_is_zero,
            x1[:], y1[:], z1[:], x2[:], y2[:], z2[:],
        )
        ox[:], oy[:], oz[:] = x, y, z

    def _mul_kernel(self, consts, mninv, mn, x, y, o):
        f, _ = self._field(consts, mninv, mn)
        o[:] = f.mont_mul(x[:], y[:])

    def _bfly_kernel(self, consts, mninv, mn, a, b, tw, o0, o1):
        """NTT butterfly: (a, b, tw) -> (a + b*tw, a - b*tw), fused so the
        twiddle product's intermediates never touch HBM (the XLA batch-major
        formulation streamed ~GBs of routing-matmul scratch per stage)."""
        f, _ = self._field(consts, mninv, mn)
        t = f.mont_mul(b[:], tw[:])
        aa = a[:]
        o0[:] = f.add(aa, t)
        o1[:] = f.sub(aa, t)

    def _inv_kernel(self, consts, mninv, mn, ebits, x, o):
        """Batched Fermat inversion x^(N-2) with an in-kernel fori_loop over
        the exponent bits (MSB first; one launch, ~512 in-VMEM muls/lane)."""
        f, _ = self._field(consts, mninv, mn)
        o[:] = self._inv_core(f, ebits, x[:])

    def _inv_core(self, f, ebits, v):
        """In-kernel batched inversion of (ROWS, w) nonzero values; base
        field = 256-bit Fermat loop (overridden for Fq2's norm map)."""
        one = jnp.broadcast_to(f.one_mont, v.shape)

        def body(i, acc):
            acc = f.sqr(acc)
            mul = f.mont_mul(acc, v)
            return jnp.where(ebits[i] != 0, mul, acc)

        return jax.lax.fori_loop(0, 256, body, one)

    def _dbl_kernel(self, consts, mninv, mn, x1, y1, z1, ox, oy, oz):
        f, a_mont = self._field(consts, mninv, mn)
        x, y, z = _double(f, a_mont, self.a_is_zero, x1[:], y1[:], z1[:])
        ox[:], oy[:], oz[:] = x, y, z

    def _dbln_kernel(self, count, consts, mninv, mn, x1, y1, z1, ox, oy, oz):
        """count chained doublings with an in-kernel fori_loop (one launch)."""
        f, a_mont = self._field(consts, mninv, mn)

        def body(_, st):
            return _double(f, a_mont, self.a_is_zero, *st)

        x, y, z = jax.lax.fori_loop(0, count, body, (x1[:], y1[:], z1[:]))
        ox[:], oy[:], oz[:] = x, y, z

    def _adenom_kernel(self, consts, mninv, mn, lx, ly, rx, ry, flags, od):
        f, _ = self._field(consts, mninv, mn)
        od[:] = _affine_denom_body(
            f, lx[:], ly[:], flags[0:1] != 0, rx[:], ry[:], flags[1:2] != 0
        )

    def _aadd_kernel(self, consts, mninv, mn, lx, ly, rx, ry, inv, flags, ox, oy, ov):
        f, a_mont = self._field(consts, mninv, mn)
        x, y, v = _affine_add_body(
            f, a_mont, self.a_is_zero,
            lx[:], ly[:], flags[0:1] != 0, rx[:], ry[:], flags[1:2] != 0, inv[:],
        )
        ox[:], oy[:] = x, y
        ov[:] = jnp.broadcast_to(v.astype(U32), (1, x.shape[1]))

    def _bucket_reduce_kernel(self, B, ow, consts, mninv, mn, x, y, z, ox, oy, oz):
        """Per-window Pippenger bucket reduction ENTIRELY in VMEM (one grid
        step per window; one launch for the whole table): suffix sums
        running_b = sum_{b'>=b} S_b' as log2(B-1) shift-adds, then the
        weighted total sum_{b>=1} b*S_b = sum_{d>=1} running_d as a halving
        add tree.  Replaces ~20 separate jadd launches over the dense
        (R, W*B) table whose intermediates each round-tripped HBM.
        x/y/z: (R, Bp) block, columns >= B are zero pad (= identity, Z==0);
        result lands in column 0 of the (R, ow) output block."""
        f, a_mont = self._field(consts, mninv, mn)
        X, Y, Z = x[:], y[:], z[:]
        R, Bp = X.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, Bp), 1)

        # All shifts/extractions are lane ROTATES + iota masks, never
        # offset slices: Mosaic propagates a misaligned slice's lane
        # offset into the field ops and then refuses the sublane concats
        # inside mont_mul ("offset mismatch on non-concat dimension");
        # tpu.dynamic_rotate materializes offset-0 values.
        def lshift(v, j):
            return jnp.where(lane < Bp - j, jnp.roll(v, -j, axis=1), U32(0))

        j = 1
        while j < B:
            X, Y, Z = _jadd_body(
                f, a_mont, self.a_is_zero, X, Y, Z,
                lshift(X, j), lshift(Y, j), lshift(Z, j),
            )
            j *= 2
        # weight tree over running_1..running_{B-1}: drop column 0, then
        # repeatedly add the rotated-down upper half onto the lower half
        # (columns >= n are garbage but masked off by construction: every
        # level only reads columns < n of the previous level)
        ax, ay, az = lshift(X, 1), lshift(Y, 1), lshift(Z, 1)
        n = B - 1
        while n > 1:
            h = n // 2
            ax, ay, az = _jadd_body(
                f, a_mont, self.a_is_zero,
                ax, ay, az,
                jnp.roll(ax, -h, axis=1),
                jnp.roll(ay, -h, axis=1),
                jnp.roll(az, -h, axis=1),
            )
            n = h
        keep = lane < 1
        ox[:] = jnp.where(keep, ax, U32(0))[:, :ow]
        oy[:] = jnp.where(keep, ay, U32(0))[:, :ow]
        oz[:] = jnp.where(keep, az, U32(0))[:, :ow]

    def _get_call(self, kind, kernel, n_elem, n_in, flag_rows=0, out_rows=None):
        if out_rows is None:
            out_rows = (self.ROWS,) * 3
        bt = min(self.block, n_elem)
        assert n_elem % bt == 0, (n_elem, bt)
        key = (kind, n_elem)
        if key not in self._calls:
            eb = pl.BlockSpec((self.ROWS, bt), lambda i: (0, i))
            specs = [
                pl.BlockSpec((L, 4), lambda i: (0, 0)),
                pl.BlockSpec((32, 32), lambda i: (0, 0)),
                pl.BlockSpec((32, 64), lambda i: (0, 0)),
            ] + [eb] * n_in
            if flag_rows:
                specs.append(pl.BlockSpec((flag_rows, bt), lambda i: (0, i)))
            self._calls[key] = pl.pallas_call(
                kernel,
                grid=(n_elem // bt,),
                in_specs=specs,
                out_specs=[pl.BlockSpec((r, bt), lambda i: (0, i)) for r in out_rows],
                out_shape=[jax.ShapeDtypeStruct((r, n_elem), U32) for r in out_rows],
                interpret=_use_interpret(),
            )
        return self._calls[key]

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
        call = self._get_call("madd", self._madd_kernel, npad, 5, flag_rows=2)
        ox, oy, oz = call(self.consts, self.m_ninv, self.m_n, x1, y1, z1, qx, qy, flags)
        return ox[:, :n], oy[:, :n], oz[:, :n]

    def jadd(self, x1, y1, z1, x2, y2, z2):
        """Complete Jacobian add on (16,N) planes (padded lanes are all-zero
        = identity + identity, discarded on slice-back)."""
        n = x1.shape[1]
        npad = -n % self.block + n
        ins = self._pad([x1, y1, z1, x2, y2, z2], n, npad)
        call = self._get_call("jadd", self._jadd_kernel, npad, 6)
        ox, oy, oz = call(self.consts, self.m_ninv, self.m_n, *ins)
        return ox[:, :n], oy[:, :n], oz[:, :n]

    def mul(self, x, y):
        """Bulk Montgomery multiply on (16,N) planes."""
        n = x.shape[1]
        npad = -n % self.block + n
        x, y = self._pad([x, y], n, npad)
        call = self._get_call("mul", self._mul_kernel, npad, 2, out_rows=(self.ROWS,))
        (o,) = call(self.consts, self.m_ninv, self.m_n, x, y)
        return o[:, :n]

    def butterfly(self, a, b, tw):
        """Radix-2 NTT butterfly on (16,N) planes: (a+b*tw, a-b*tw)."""
        n = a.shape[1]
        npad = -n % self.block + n
        a, b, tw = self._pad([a, b, tw], n, npad)
        call = self._get_call("bfly", self._bfly_kernel, npad, 3, out_rows=(self.ROWS, self.ROWS))
        o0, o1 = call(self.consts, self.m_ninv, self.m_n, a, b, tw)
        return o0[:, :n], o1[:, :n]

    def inv(self, x):
        """Batched Fermat inversion on (16,N) planes; x must be nonzero
        (padded lanes invert one_mont harmlessly... padded with 0 -> 0^(N-2)
        = 0, also harmless)."""
        n = x.shape[1]
        npad = -n % self.block + n
        (x,) = self._pad([x], n, npad)
        # single block up to 8192 lanes: TPU grid steps run sequentially and
        # the 256-iteration exponent loop dominates, so one wide block beats
        # npad/block sequential reruns of it (VMEM: (16, 8192) u32 = 512 KB)
        bt = npad if npad <= 8192 else self.block
        key = ("inv", npad)
        if key not in self._calls:
            from jax.experimental.pallas import tpu as pltpu

            eb = pl.BlockSpec((self.ROWS, bt), lambda i: (0, i))
            self._calls[key] = pl.pallas_call(
                self._inv_kernel,
                grid=(npad // bt,),
                in_specs=[
                    pl.BlockSpec((L, 4), lambda i: (0, 0)),
                    pl.BlockSpec((32, 32), lambda i: (0, 0)),
                    pl.BlockSpec((32, 64), lambda i: (0, 0)),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    eb,
                ],
                out_specs=[eb],
                out_shape=[jax.ShapeDtypeStruct((self.ROWS, npad), U32)],
                interpret=_use_interpret(),
            )
        e = self.modulus - 2
        ebits = np.array(
            [(e >> (255 - i)) & 1 for i in range(256)], dtype=np.int32
        )
        (o,) = self._calls[key](self.consts, self.m_ninv, self.m_n, ebits, x)
        return o[:, :n]

    def jdbl(self, x1, y1, z1):
        """Jacobian doubling on (16,N) planes."""
        n = x1.shape[1]
        npad = -n % self.block + n
        ins = self._pad([x1, y1, z1], n, npad)
        call = self._get_call("dbl", self._dbl_kernel, npad, 3)
        ox, oy, oz = call(self.consts, self.m_ninv, self.m_n, *ins)
        return ox[:, :n], oy[:, :n], oz[:, :n]

    def jdbl_n(self, x1, y1, z1, count: int):
        """count chained Jacobian doublings in ONE kernel launch."""
        import functools as _ft

        n = x1.shape[1]
        npad = -n % self.block + n
        ins = self._pad([x1, y1, z1], n, npad)
        call = self._get_call(
            ("dbln", count), _ft.partial(self._dbln_kernel, count), npad, 3
        )
        ox, oy, oz = call(self.consts, self.m_ninv, self.m_n, *ins)
        return ox[:, :n], oy[:, :n], oz[:, :n]

    def affine_denom(self, lx, ly, lv, rx, ry, rv):
        """Pair denominators for batched affine addition; (16,N) planes and
        (N,) 0/1 validity flags.  Invalid / infinity pairs get 1 so the
        batch inversion stays well-defined."""
        n = lx.shape[1]
        npad = -n % self.block + n
        flags = jnp.stack([lv.astype(U32), rv.astype(U32)], axis=0)
        lx, ly, rx, ry, flags = self._pad([lx, ly, rx, ry, flags], n, npad)
        call = self._get_call(
            "adenom", self._adenom_kernel, npad, 4, flag_rows=2, out_rows=(self.ROWS,)
        )
        (d,) = call(self.consts, self.m_ninv, self.m_n, lx, ly, rx, ry, flags)
        return d[:, :n]

    def affine_add(self, lx, ly, lv, rx, ry, rv, inv):
        """Affine pair add with precomputed inverse denominators.
        Returns (x3, y3, valid3) with valid3 a (N,) 0/1 vector."""
        n = lx.shape[1]
        npad = -n % self.block + n
        flags = jnp.stack([lv.astype(U32), rv.astype(U32)], axis=0)
        lx, ly, rx, ry, inv, flags = self._pad([lx, ly, rx, ry, inv, flags], n, npad)
        call = self._get_call(
            "aadd", self._aadd_kernel, npad, 5, flag_rows=2, out_rows=(self.ROWS, self.ROWS, 1)
        )
        ox, oy, ov = call(self.consts, self.m_ninv, self.m_n, lx, ly, rx, ry, inv, flags)
        return ox[:, :n], oy[:, :n], ov[0, :n]

    @staticmethod
    def bucket_stride(B: int) -> int:
        """Lane-padded per-window stride: Pallas TPU block widths must be
        multiples of 128."""
        return -(-B // 128) * 128

    def bucket_reduce(self, x, y, z, W: int, B: int):
        """Dense (R, W*Bp) Jacobian bucket tables (Bp = bucket_stride(B);
        window w occupies columns w*Bp .. w*Bp+B, rest zero) -> (R, W)
        per-window weighted sums (sum_{b>=1} b * S_{w,b}), ONE kernel
        launch gridded over windows.  Requires B - 1 a power of two."""
        import functools as _ft

        assert (B - 1) & (B - 2) == 0, B
        R = self.ROWS
        Bp = self.bucket_stride(B)
        ow = 128  # output block width (result in column 0 of each block)
        key = ("bred", W, B)
        if key not in self._calls:
            eb = pl.BlockSpec((R, Bp), lambda i: (0, i))
            ob = pl.BlockSpec((R, ow), lambda i: (0, i))
            self._calls[key] = pl.pallas_call(
                _ft.partial(self._bucket_reduce_kernel, B, ow),
                grid=(W,),
                in_specs=[
                    pl.BlockSpec((L, 4), lambda i: (0, 0)),
                    pl.BlockSpec((32, 32), lambda i: (0, 0)),
                    pl.BlockSpec((32, 64), lambda i: (0, 0)),
                    eb, eb, eb,
                ],
                out_specs=[ob, ob, ob],
                out_shape=[jax.ShapeDtypeStruct((R, W * ow), U32)] * 3,
                interpret=_use_interpret(),
            )
        ax, ay, az = self._calls[key](self.consts, self.m_ninv, self.m_n, x, y, z)
        return ax[:, ::ow], ay[:, ::ow], az[:, ::ow]


@functools.lru_cache(maxsize=None)
def get_pallas_ec(modulus: int, a_host_mod: int, block: int = 512) -> PallasEC:
    return PallasEC(modulus, a_host_mod, block)


# ---------------------------------------------------------------------------
# Fq2 (BN254 G2) kernels: same bodies, _F2 field, 32-row planes
# ---------------------------------------------------------------------------

class QuadPallasEC(PallasEC):
    """Fused Fq2 point kernels for BN254 G2 on stacked (32, B) planes.

    Every kernel body is shared with the base-field class — `_field` swaps
    in `_F2`, so a G2 jadd/affine-add is still ONE pallas launch with all
    Karatsuba intermediates in VMEM.  Replaces the reference's curve-generic
    parallel Pippenger over G2Affine (forks/halo2curves/src/msm.rs:432-464 +
    ark-ec Fp2 arithmetic) with the same segmented-affine accumulator the G1
    path uses (ops/msm_affine.py runs unmodified at rows=32).

    Inversion: 1/(a+bu) = (a - bu)/(a^2+b^2) — ONE kernel computing the
    norm, a 256-bit base-field Fermat loop on it, and the two component
    muls, so `inv`'s single-launch contract holds for the Fq2 tree too.
    """

    ROWS = 2 * L

    def __init__(self, modulus: int, a_host: int = 0, block: int = 512):
        assert a_host == 0, "QuadPallasEC supports a == 0 curves (BN254 G2)"
        super().__init__(modulus, a_host, block)

    def _field(self, consts_ref, mninv_ref, mn_ref):
        base, _ = super()._field(consts_ref, mninv_ref, mn_ref)
        cc = consts_ref[:]
        one0 = jnp.roll(cc, -2, axis=1)[:, 0:1]  # offset-0 copy of mont 1
        return _F2(base, one0), None

    def _inv_core(self, f2, ebits, v):
        """Batched Fq2 inversion via the norm map: 1/(a+bu) =
        (a - bu) / (a^2 + b^2), one base-field Fermat loop."""
        base = f2.b
        x0, x1 = v[:L], v[L:]
        nrm = base.add(base.sqr(x0), base.sqr(x1))
        one = jnp.broadcast_to(base.one_mont, nrm.shape)

        def body(i, acc):
            acc = base.sqr(acc)
            mul = base.mont_mul(acc, nrm)
            return jnp.where(ebits[i] != 0, mul, acc)

        ninv = jax.lax.fori_loop(0, 256, body, one)
        return jnp.concatenate(
            [
                base.mont_mul(x0, ninv),
                base.mont_mul(base.neg(x1), ninv),
            ],
            axis=0,
        )


@functools.lru_cache(maxsize=None)
def get_quad_pallas_ec(modulus: int, block: int = 512) -> QuadPallasEC:
    return QuadPallasEC(modulus, 0, block)
