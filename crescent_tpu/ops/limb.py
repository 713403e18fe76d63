"""Limb-decomposed 256-bit modular arithmetic for TPU (JAX/XLA).

TPUs have no native wide-integer units, so every field element is a vector of
16-bit limbs held in ``uint32`` lanes, batched along leading axes so the VPU
(8x128) processes thousands of field ops per instruction.  This single layer
replaces the reference's x86 asm field backend (forks/halo2curves
derive/src/field/asm/limb4.rs) and ark-ff for all prover-side work
(SURVEY.md §7.1).

Design rules (all shapes static, carries data-independent — XLA-friendly):

* A field element is ``(..., L)`` uint32 with each limb < 2^16 (normalized),
  little-endian limb order.  L = 16 for all supported 254/256-bit moduli.
* ``(2^16-1)^2 < 2^32`` so a single limb product is exact in uint32; partial
  products are split into lo/hi 16-bit halves and accumulated in separate
  uint32 planes (max 16 terms of < 2^16 each => < 2^20, no overflow), followed
  by one data-independent carry sweep.
* Montgomery arithmetic with R = 2^256 in "full-width REDC" form:
  ``m = (T mod R) * N' mod R;  t = (T + m*N) / R`` — one low-mul, one wide-mul
  and one add per reduction, which keeps everything in big batched primitives
  instead of 16 dependent scalar iterations (the CIOS form the reference's asm
  uses is latency-optimal on CPUs but serializes on a vector machine).

Validated bit-exactly against ``crescent_tpu.core.fields`` in
tests/test_limb_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
NLIMB = 16  # 256-bit elements
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host <-> limb conversion (numpy; exact)
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, nlimb: int = NLIMB) -> np.ndarray:
    out = np.zeros(nlimb, dtype=np.uint32)
    for i in range(nlimb):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    assert x >> (LIMB_BITS * nlimb) == 0, "value too wide"
    return out

def limbs_to_int(a) -> int:
    a = np.asarray(a)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a.reshape(-1)))

def ints_to_limbs(xs, nlimb: int = NLIMB) -> np.ndarray:
    """Batch convert: list/array of ints -> (n, nlimb) uint32."""
    out = np.zeros((len(xs), nlimb), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[j] = int_to_limbs(int(x), nlimb)
    return out

def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a)
    return [limbs_to_int(row) for row in a.reshape(-1, a.shape[-1])]


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------

def carry_sweep(acc: jax.Array, drop_final: bool = False) -> jax.Array:
    """Normalize accumulator limbs (< 2^32) to < 2^16 with a sequential sweep.

    acc: (..., L) uint32.  Returns (..., L) if drop_final else (..., L+1)
    with the final carry appended (carry < 2^16 guaranteed for our sizes).

    Implemented as a lax.scan over the limb axis: the chain is inherently
    sequential, and a one-body loop keeps the HLO graph small (an unrolled
    chain made XLA compile time explode on deep expressions).
    """
    moved = jnp.moveaxis(acc, -1, 0)  # (L, ...)

    def body(c, v):
        v = v + c
        return v >> LIMB_BITS, v & LIMB_MASK

    c, out = jax.lax.scan(body, jnp.zeros(moved.shape[1:], dtype=U32), moved)
    out = jnp.moveaxis(out, 0, -1)
    if drop_final:
        return out
    return jnp.concatenate([out, c[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Schoolbook wide multiply with split accumulation
# ---------------------------------------------------------------------------

def mul_wide(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L) x (..., L) -> (..., 2L) exact product limbs."""
    L = x.shape[-1]
    z = x[..., :, None] * y[..., None, :]          # (..., L, L) exact in u32
    lo = z & LIMB_MASK
    hi = z >> LIMB_BITS
    width = 2 * L
    acc_lo = jnp.zeros(x.shape[:-1] + (width,), dtype=U32)
    acc_hi = jnp.zeros(x.shape[:-1] + (width,), dtype=U32)
    for i in range(L):
        pad_lo = [(0, 0)] * (x.ndim - 1) + [(i, width - L - i)]
        acc_lo = acc_lo + jnp.pad(lo[..., i, :], pad_lo)
        pad_hi = [(0, 0)] * (x.ndim - 1) + [(i + 1, width - L - i - 1)]
        acc_hi = acc_hi + jnp.pad(hi[..., i, :], pad_hi)
    swept = carry_sweep(acc_lo + acc_hi)            # (..., 2L+1); final carry 0
    return swept[..., :width]

def mul_low(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L) x (..., L) -> (..., L): product mod 2^(16L)."""
    L = x.shape[-1]
    z = x[..., :, None] * y[..., None, :]
    lo = z & LIMB_MASK
    hi = z >> LIMB_BITS
    acc = jnp.zeros(x.shape[:-1] + (L,), dtype=U32)
    for i in range(L):
        # row i contributes lo at positions i.. and hi at positions i+1..
        lo_row = lo[..., i, : L - i]
        hi_row = hi[..., i, : L - i - 1] if i + 1 < L else None
        pad = [(0, 0)] * (x.ndim - 1)
        acc = acc + jnp.pad(lo_row, pad + [(i, 0)])
        if hi_row is not None:
            acc = acc + jnp.pad(hi_row, pad + [(i + 1, 0)])
    return carry_sweep(acc, drop_final=True)


# ---------------------------------------------------------------------------
# Add / sub / compare
# ---------------------------------------------------------------------------

def add_raw(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L)+(..., L) -> (..., L+1) with carry limb."""
    return carry_sweep(x + y)

def sub_raw(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x - y with borrow chain. Returns ((..., L) limbs, (...,) borrow 0/1)."""
    xm = jnp.moveaxis(x, -1, 0)
    ym = jnp.moveaxis(y, -1, 0)

    def body(borrow, xy):
        xv, yv = xy
        v = xv + (1 << LIMB_BITS) - yv - borrow
        return 1 - (v >> LIMB_BITS), v & LIMB_MASK

    borrow, out = jax.lax.scan(
        body, jnp.zeros(xm.shape[1:], dtype=U32), (xm, ym)
    )
    return jnp.moveaxis(out, 0, -1), borrow

def geq(x: jax.Array, y: jax.Array) -> jax.Array:
    """x >= y as (...,) uint32 0/1."""
    _, borrow = sub_raw(x, y)
    return 1 - borrow

def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask ? a : b, mask shape (...,) broadcast over limb axis."""
    return jnp.where(mask[..., None].astype(bool), a, b)


# ---------------------------------------------------------------------------
# Montgomery context per modulus
# ---------------------------------------------------------------------------

class ModCtx:
    """Precomputed Montgomery constants for a fixed odd modulus N < 2^256.

    All methods operate on Montgomery-form limb arrays (..., 16) uint32 and
    are shape-polymorphic over leading batch dims; everything jits cleanly.
    """

    def __init__(self, modulus: int, name: str = "mod"):
        assert modulus % 2 == 1 and modulus.bit_length() <= LIMB_BITS * NLIMB
        self.modulus = modulus
        self.name = name
        R = 1 << (LIMB_BITS * NLIMB)
        self.R = R
        self.n_limbs = jnp.asarray(int_to_limbs(modulus))
        # N' = -N^{-1} mod R  (full width)
        ninv = (-pow(modulus, -1, R)) % R
        self.ninv_limbs = jnp.asarray(int_to_limbs(ninv))
        self.r_mod_n = R % modulus                     # == to_mont(1)
        self.r2_limbs = jnp.asarray(int_to_limbs(R * R % modulus))
        self.one_mont = jnp.asarray(int_to_limbs(self.r_mod_n))
        self.zero = jnp.asarray(int_to_limbs(0))
        # jit the hot entry points (shapes are polymorphic; retraces per shape)
        self.mont_mul = jax.jit(self.mont_mul)
        self.mont_sqr = jax.jit(self.mont_sqr)
        self.add_mod = jax.jit(self.add_mod)
        self.sub_mod = jax.jit(self.sub_mod)
        self.neg_mod = jax.jit(self.neg_mod)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.inv_mod = jax.jit(self.inv_mod)
        self.mont_pow = jax.jit(self.mont_pow, static_argnums=1)

    # -- host conversions ---------------------------------------------------
    def to_mont_host(self, xs) -> np.ndarray:
        """ints -> Montgomery-form limbs (n, 16) on host."""
        return ints_to_limbs([int(x) * self.R % self.modulus for x in xs])

    def from_mont_host(self, a) -> list[int]:
        rinv = pow(self.R, -1, self.modulus)
        return [v * rinv % self.modulus for v in limbs_to_ints(a)]

    # -- device ops ---------------------------------------------------------
    def cond_sub(self, x17: jax.Array) -> jax.Array:
        """(..., 17) value < 2N -> (..., 16) value mod N."""
        n17 = jnp.pad(self.n_limbs, (0, 1))
        n17 = jnp.broadcast_to(n17, x17.shape)
        diff, borrow = sub_raw(x17, n17)
        return select(1 - borrow, diff, x17)[..., :NLIMB]

    def mont_reduce(self, t: jax.Array) -> jax.Array:
        """(..., 32) T < N*2^256 -> (..., 16) T * 2^-256 mod N (Montgomery)."""
        t_lo = t[..., :NLIMB]
        m = mul_low(t_lo, jnp.broadcast_to(self.ninv_limbs, t_lo.shape))
        s = mul_wide(m, jnp.broadcast_to(self.n_limbs, m.shape))   # (..., 32)
        # u = t + s; low 16 limbs are zero by construction; keep high part.
        u = carry_sweep(t + s)                                     # (..., 33)
        return self.cond_sub(u[..., NLIMB : 2 * NLIMB + 1])

    def mont_mul(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return self.mont_reduce(mul_wide(x, y))

    def mont_sqr(self, x: jax.Array) -> jax.Array:
        return self.mont_reduce(mul_wide(x, x))

    def add_mod(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return self.cond_sub(add_raw(x, y))

    def sub_mod(self, x: jax.Array, y: jax.Array) -> jax.Array:
        diff, borrow = sub_raw(x, y)
        n = jnp.broadcast_to(self.n_limbs, diff.shape)
        plus = add_raw(diff, n)[..., :NLIMB]
        return select(borrow, plus, diff)

    def neg_mod(self, x: jax.Array) -> jax.Array:
        z = jnp.broadcast_to(self.zero, x.shape)
        return self.sub_mod(z, x)

    def to_mont(self, x: jax.Array) -> jax.Array:
        return self.mont_mul(x, jnp.broadcast_to(self.r2_limbs, x.shape))

    def from_mont(self, x: jax.Array) -> jax.Array:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, NLIMB)]
        return self.mont_reduce(jnp.pad(x, pad))

    def is_zero(self, x: jax.Array) -> jax.Array:
        return jnp.all(x == 0, axis=-1).astype(U32)

    def eq(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return jnp.all(x == y, axis=-1).astype(U32)

    def mont_pow(self, x: jax.Array, e: int) -> jax.Array:
        """x^e for a host-known exponent via lax.scan over the bit vector.

        One traced square+select+multiply body regardless of exponent size,
        so compile time stays flat (the unrolled form blows up XLA HLO).
        """
        if e == 0:
            return jnp.broadcast_to(self.one_mont, x.shape)
        nbits = e.bit_length()
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=U32)

        def body(carry, bit):
            acc, base = carry
            acc2 = self.mont_mul(acc, base)
            acc = select(jnp.broadcast_to(bit, acc.shape[:-1]), acc2, acc)
            base = self.mont_sqr(base)
            return (acc, base), None

        acc0 = jnp.broadcast_to(self.one_mont, x.shape)
        (acc, _), _ = jax.lax.scan(body, (acc0, x), bits)
        return acc

    def inv_mod(self, x: jax.Array) -> jax.Array:
        """Batched inversion via Fermat (x^(N-2)); x must be nonzero."""
        return self.mont_pow(x, self.modulus - 2)

    def batch_inv(self, x: jax.Array) -> jax.Array:
        """Montgomery's batch-inversion trick along the leading axis.

        x: (n, ..., 16) all nonzero.  ~3 muls/element + one inversion.
        """
        n = x.shape[0]
        prefix = [x[0]]
        for i in range(1, n):
            prefix.append(self.mont_mul(prefix[-1], x[i]))
        total_inv = self.inv_mod(prefix[-1])
        out = [None] * n
        for i in range(n - 1, 0, -1):
            out[i] = self.mont_mul(total_inv, prefix[i - 1])
            total_inv = self.mont_mul(total_inv, x[i])
        out[0] = total_inv
        return jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=None)
def get_ctx(modulus: int, name: str = "mod") -> ModCtx:
    return ModCtx(modulus, name)


# jit the module-level primitives: eager per-op dispatch compiles hundreds of
# micro-executables; one fused program per shape is both faster and cached.
mul_wide = jax.jit(mul_wide)
mul_low = jax.jit(mul_low)
add_raw = jax.jit(add_raw)
sub_raw = jax.jit(sub_raw)
geq = jax.jit(geq)
