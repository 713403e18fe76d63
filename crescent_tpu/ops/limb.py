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
    """Batch convert: list/array of ints -> (n, nlimb) uint32.

    One C-level to_bytes per int + a bulk frombuffer: ~20x faster than a
    per-limb Python loop, which dominated QAP-scale prove (8.8M SRS points
    -> 140M Python shift/mask ops)."""
    if len(xs) == 0:
        return np.zeros((0, nlimb), dtype=np.uint32)
    nbytes = 2 * nlimb  # LIMB_BITS == 16: limbs are little-endian u16 words
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    a = np.frombuffer(buf, dtype="<u2").reshape(len(xs), nlimb)
    return a.astype(np.uint32)

def u64_to_limbs(a: np.ndarray) -> np.ndarray:
    """(n, 4) little-endian uint64 words (native backend layout) ->
    (n, 16) uint16-valued limb planes.  Pure byte reinterpretation: 4 LE
    u64 words ARE 16 LE u16 limbs — no bigint round-trip (the round-4
    prove path bounced native matvec output through millions of Python
    ints just to re-split them into these limbs)."""
    a = np.ascontiguousarray(a, dtype="<u8")
    return a.view("<u2").reshape(a.shape[0], 4 * a.shape[1])


def limbs_to_u64(a: np.ndarray) -> np.ndarray:
    """(n, 16) sub-2^16 limb planes -> (n, 4) LE uint64 words (native
    backend layout).  Inverse of u64_to_limbs."""
    a = np.asarray(a)
    assert not (a >> LIMB_BITS).any(), "limbs_to_u64: limbs must be < 2^16"
    a16 = np.ascontiguousarray(a.astype("<u2"))
    return a16.view("<u8").reshape(a.shape[0], a.shape[1] // 4)


def upload_limbs(a: np.ndarray) -> jax.Array:
    """Upload 16-bit limb planes at half the wire cost: the u32 arrays only
    carry sub-2^16 values, so ship u16 and widen on device (an eager cast,
    so downstream jit signatures stay u32 — no recompiles).  Matters on the
    axon TPU tunnel, where QAP-scale SRS uploads are minutes of transfer."""
    a = np.asarray(a)
    assert not (a >> LIMB_BITS).any(), "upload_limbs: limbs must be < 2^16"
    return jnp.asarray(a.astype(np.uint16)).astype(U32)


def limbs_to_ints(a) -> list[int]:
    """(n, nlimb) limbs -> list of ints (one C-level from_bytes per row)."""
    a = np.asarray(a)
    a = a.reshape(-1, a.shape[-1])
    if (a >> LIMB_BITS).any():  # unnormalized accumulator limbs: exact path
        return [limbs_to_int(row) for row in a]
    nbytes = 2 * a.shape[-1]
    buf = a.astype("<u2").tobytes()  # LIMB_BITS == 16: little-endian words
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(a.shape[0])
    ]


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------

def _shift_up(a: jax.Array, s: int) -> jax.Array:
    """Move limb k to position k+s (zeros shifted in at the bottom)."""
    pad = [(0, 0)] * (a.ndim - 1) + [(s, 0)]
    return jnp.pad(a[..., : a.shape[-1] - s], pad)


def _ks_carry(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Kogge–Stone carry-lookahead resolve for limbs v <= 2^17 - 1.

    Returns (normalized digits < 2^16, carry-out of the top limb).  The whole
    carry chain is log2(L) unrolled vector steps — no serial loop, which is
    what the VPU and the XLA compiler both want (an explicit 33-step ripple
    chain dominated both compile and run time).
    """
    L = v.shape[-1]
    g = (v >> LIMB_BITS).astype(U32)                      # generate (0/1)
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(U32)        # propagate
    s = 1
    while s < L:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s *= 2
    carry_in = _shift_up(g, 1)
    out = (v + carry_in) & LIMB_MASK
    return out, g[..., -1]


def carry_sweep(acc: jax.Array, drop_final: bool = False) -> jax.Array:
    """Normalize accumulator limbs (< 2^32) to < 2^16.

    acc: (..., L) uint32.  Returns (..., L) if drop_final else (..., L+1)
    with the final carry appended.  Two steps: (1) split every limb into
    digit + multi-bit carry and add the shifted carries (residual carries are
    then at most 1), (2) resolve the 1-bit ripple with carry-lookahead.
    """
    L = acc.shape[-1]
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS
    zeros = jnp.zeros(acc.shape[:-1] + (1,), dtype=U32)
    v = jnp.concatenate([d, zeros], axis=-1) + jnp.concatenate([zeros, c], axis=-1)
    out, _ = _ks_carry(v)
    return out[..., :L] if drop_final else out


# ---------------------------------------------------------------------------
# Schoolbook wide multiply with split accumulation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _routing_matrix(L: int, out_width: int) -> "np.ndarray":
    """(2*L*L, out_width) f32 0/1 matrix routing flattened lo/hi partial
    products to their output limb: lo(i,j) -> i+j, hi(i,j) -> i+j+1.

    Turning the partial-product accumulation into one matmul (a) collapses
    ~64 pad/add HLO ops per multiply into a single dot (XLA CPU compile time
    was superlinear in flat graph size), and (b) runs on the TPU MXU: values
    are < 2^21 so f32 accumulation is exact (< 2^24).
    """
    T = np.zeros((2 * L * L, out_width), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            if i + j < out_width:
                T[i * L + j, i + j] = 1.0
            if i + j + 1 < out_width:
                T[L * L + i * L + j, i + j + 1] = 1.0
    return T


def _mul_acc(x: jax.Array, y: jax.Array, out_width: int) -> jax.Array:
    """Unnormalized product limbs (each < 2^21) of width out_width."""
    L = x.shape[-1]
    z = x[..., :, None] * y[..., None, :]          # (..., L, L) exact in u32
    lo = (z & LIMB_MASK).astype(jnp.float32)
    hi = (z >> LIMB_BITS).astype(jnp.float32)
    flat = jnp.concatenate(
        [lo.reshape(x.shape[:-1] + (L * L,)), hi.reshape(x.shape[:-1] + (L * L,))],
        axis=-1,
    )
    T = jnp.asarray(_routing_matrix(L, out_width))
    # precision=HIGHEST is load-bearing on TPU: the MXU's default f32 matmul
    # truncates inputs to bf16 (8 mantissa bits), silently corrupting the
    # 16-bit partial products.  HIGHEST selects the exact multi-pass bf16
    # decomposition, keeping f32 arithmetic bit-exact (values < 2^21 < 2^24).
    acc = jax.lax.dot_general(
        flat, T, (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return acc.astype(U32)


def mul_wide(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L) x (..., L) -> (..., 2L) exact product limbs."""
    L = x.shape[-1]
    swept = carry_sweep(_mul_acc(x, y, 2 * L))      # (..., 2L+1); final carry 0
    return swept[..., : 2 * L]

def mul_low(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L) x (..., L) -> (..., L): product mod 2^(16L)."""
    L = x.shape[-1]
    return carry_sweep(_mul_acc(x, y, L), drop_final=True)


# ---------------------------------------------------------------------------
# Add / sub / compare
# ---------------------------------------------------------------------------

def add_raw(x: jax.Array, y: jax.Array) -> jax.Array:
    """(..., L)+(..., L) -> (..., L+1) with carry limb."""
    return carry_sweep(x + y)

def sub_raw(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x - y with borrow. Returns ((..., L) limbs, (...,) borrow 0/1).

    Two's-complement form: x + (2^256 - 1 - y) + 1, then carry-lookahead;
    no carry-out of the top limb <=> the subtraction borrowed.
    """
    v = x + (LIMB_MASK - y)
    one_hot = jnp.zeros_like(v).at[..., 0].set(1)
    out, carry_out = _ks_carry(v + one_hot)
    return out, 1 - carry_out

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

    # -- field-adapter interface (shared with ops.quadratic.QuadCtx) -------
    host_zero = 0
    host_one = 1

    def select(self, mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.where(mask[..., None].astype(bool), a, b)

    def broadcast_elem(self, e: jax.Array, batch_shape) -> jax.Array:
        return jnp.broadcast_to(e, tuple(batch_shape) + (NLIMB,))

    @property
    def elem_shape(self):
        return (NLIMB,)

    def host_mul(self, a, b):
        return a * b % self.modulus

    def host_inv(self, a):
        return pow(a, -1, self.modulus)

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
