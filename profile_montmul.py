"""Microbenchmark: Montgomery-mul kernel formulations on TPU.

Measures mont_muls/s for a chain of K muls over a (16, B) limb-major batch,
inside one Pallas kernel (mimicking the fused madd kernel's usage).

Variants:
  v0  current pallas_ec._F.mont_mul (pad/concat schoolbook, KS carries)
  v1  sublane-aligned schoolbook: (32,B) accumulator via static-slice adds,
      carries on aligned widths only
  v2  v1 + MXU by-constant REDC (Toeplitz byte matmuls for m=t*N', s=m*N)
"""
import functools
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from crescent_tpu.ops import pallas_ec as pe
from crescent_tpu.ops import limb as limb_mod
from crescent_tpu.ops.limb import LIMB_BITS, LIMB_MASK, NLIMB, U32
from crescent_tpu.core.curves import BN254_FQ

L = NLIMB
B = 1024
K = 16          # chained muls per kernel invocation
GRID = 8        # blocks
REPS = 20

MOD = BN254_FQ


# ---------------------------------------------------------------------------
# v1: aligned schoolbook
# ---------------------------------------------------------------------------

def _ks_carry(v):
    M = v.shape[0]
    g = v >> LIMB_BITS
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(U32)
    s = 1
    while s < M:
        g = g | (p & pe._shift_up(g, s))
        p = p & pe._shift_up(p, s)
        s *= 2
    out = (v + pe._shift_up(g, 1)) & LIMB_MASK
    return out, g[M - 1: M]



def slice_add(acc, i, val):
    """acc[i:i+rows(val)] += val via static slices + concat (Mosaic-friendly)."""
    rows = val.shape[0]
    parts = []
    if i > 0:
        parts.append(acc[:i])
    parts.append(acc[i:i + rows] + val)
    if i + rows < acc.shape[0]:
        parts.append(acc[i + rows:])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

def mul_acc32(x, y):
    """(16,B)x(16,B) -> (32,B) unnormalized product limbs (< 2^22)."""
    Bn = x.shape[1]
    acc = jnp.zeros((2 * L, Bn), U32)
    for i in range(L):
        p = x[i:i + 1] * y
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        acc = slice_add(acc, i, lo)
        acc = slice_add(acc, i + 1, hi)
    return acc


def carry32(acc):
    """Normalize (32,B) acc (<2^31) to 16-bit limbs; drops final carry (known 0
    for full products)."""
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS
    v = slice_add(d, 1, c[:-1])  # shift carries up one row; top carry dropped
    # v <= 2^17 - 1; resolve 1-bit ripple
    out, _ = _ks_carry(v)
    return out


class F1:
    def __init__(self, n, ninv, one_mont):
        self.n, self.ninv, self.one_mont = n, ninv, one_mont

    def mont_mul(self, x, y):
        t = carry32(mul_acc32(x, y))                    # (32,B)
        m = carry32(mul_acc32(t[:L], jnp.broadcast_to(self.ninv, x.shape)))[:L]
        s = mul_acc32(m, jnp.broadcast_to(self.n, x.shape))
        u = carry32(t + s)                              # low L limbs == 0
        hi = u[L:]                                      # (16,B); top carry
        # final carry out of limb 31 when t+s overflows 2^512: t+s < 2N*R so
        # u_hi < 2N fits 17 "limbs"; track the bit via a second carry pass:
        # recompute exactly: u = t + s may carry out of row 31.
        # do a 33-wide exact version instead for correctness check below.
        return self.cond_sub17(hi, self.topbit(t, s))

    def topbit(self, t, s):
        # carry out of the 32-limb sum (t+s)/2^512 — recompute cheaply:
        v = t + s
        d = v & LIMB_MASK
        c = v >> LIMB_BITS
        w = slice_add(d, 1, c[:-1])
        _, carry = _ks_carry(w)
        top = (c[-1:] + carry)  # (1,B) carry into limb 32
        return top

    def cond_sub17(self, x16, xtop):
        """(16,B)+top row (1,B) value < 2N -> x mod N."""
        nb = jnp.broadcast_to(self.n, x16.shape)
        v = x16 + (LIMB_MASK - nb)
        v = slice_add(v, 0, jnp.ones((1, v.shape[1]), U32))
        diff, carry = _ks_carry(v)
        borrow = (1 - carry) - xtop  # 0 => x>=N (use diff), else keep x
        return jnp.where((borrow == 0), diff, x16)


# single exact carry formulation (used by both v1/v2): fold topbit into carry32
class F1b(F1):
    def mont_mul(self, x, y):
        t = carry32(mul_acc32(x, y))
        m = carry32(mul_acc32(t[:L], jnp.broadcast_to(self.ninv, x.shape)))[:L]
        s = mul_acc32(m, jnp.broadcast_to(self.n, x.shape))
        v = t + s
        d = v & LIMB_MASK
        c = v >> LIMB_BITS
        w = slice_add(d, 1, c[:-1])
        out, carry = _ks_carry(w)       # (32,B), carry (1,B) into limb 32
        top = c[-1:] + carry            # < 2 (since t+s < 2^512 * 2 roughly)
        return self.cond_sub17(out[L:], top)


# ---------------------------------------------------------------------------
# v2: MXU by-constant REDC
# ---------------------------------------------------------------------------

def build_toeplitz_bytes(const: int, nbytes_in: int, nbytes_out: int) -> np.ndarray:
    """M[i,k] = byte_{k-i}(const) for 0 <= k-i < 32; (nbytes_in, nbytes_out) f32."""
    cb = [(const >> (8 * j)) & 0xFF for j in range(32)]
    M = np.zeros((nbytes_in, nbytes_out), np.float32)
    for i in range(nbytes_in):
        for j in range(32):
            k = i + j
            if k < nbytes_out:
                M[i, k] = cb[j]
    return M


def to_bytes_planes(x16):
    """(16,B) 16-bit limbs -> (32,B) byte planes."""
    lo = x16 & 0xFF
    hi = x16 >> 8
    # interleave: byte 2i = lo_i, 2i+1 = hi_i
    return jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(32, x16.shape[1])


def bytes_to_limbs16(b32):
    """(32,B) byte planes (each < 2^8) -> (16,B) 16-bit limbs exactly."""
    v = b32.reshape(16, 2, -1)
    return v[:, 0] + (v[:, 1] << 8)


class F2(F1b):
    def __init__(self, n, ninv, one_mont, Mninv, Mn):
        super().__init__(n, ninv, one_mont)
        self.Mninv = Mninv  # (32,32) f32: x byte planes -> m bytes (mod 2^256)
        self.Mn = Mn        # (32,64) f32: m byte planes -> s bytes (full)

    @staticmethod
    def matmul_bytes(xb, M):
        """(32,B) byte planes x (32,Mout) -> (Mout,B) u32 accum (<2^22)."""
        acc = jax.lax.dot_general(
            M, xb.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mout, B) -- contract byte axis; M entries < 2^8 exact in bf16
        return acc.astype(jnp.int32).astype(U32)

    def mont_mul(self, x, y):
        t = carry32(mul_acc32(x, y))                     # (32,B) 16-bit limbs
        tb = to_bytes_planes(t[:L])                      # (32,B) bytes
        m_acc = self.matmul_bytes(tb, self.Mninv)        # (32,B) < 2^22 (byte sig)
        # normalize byte-significance accumulator to bytes
        mb = carry_bytes(m_acc)                          # (32,B) bytes, mod 2^256
        s_acc = self.matmul_bytes(mb, self.Mn)           # (64,B) byte sig < 2^22
        s = bytesig_to_limb16(s_acc)                     # (32,B) <2^23 limb sig
        v = t + s
        d = v & LIMB_MASK
        c = v >> LIMB_BITS
        w = slice_add(d, 1, c[:-1])
        out, carry = _ks_carry(w)
        top = c[-1:] + carry
        return self.cond_sub17(out[L:], top)


def carry_bytes(acc):
    """(32,B) byte-significance accumulator (<2^22) -> normalized bytes,
    dropping carries beyond byte 31 (mod 2^256)."""
    d = acc & 0xFF
    c = acc >> 8
    v = slice_add(d, 1, c[:-1])          # < 2^15
    # second pass
    d2 = v & 0xFF
    c2 = v >> 8
    v2 = slice_add(d2, 1, c2[:-1])       # < 2^8 + small
    # third quick ripple via KS on byte domain
    g = v2 >> 8
    p = ((v2 & 0xFF) == 0xFF).astype(U32)
    s = 1
    M = v2.shape[0]
    while s < M:
        g = g | (p & pe._shift_up(g, s))
        p = p & pe._shift_up(p, s)
        s *= 2
    return (v2 + pe._shift_up(g, 1)) & 0xFF


def bytesig_to_limb16(acc):
    """(64,B) byte-significance accum -> (32,B) 16-bit-limb-significance accum."""
    v = acc.reshape(32, 2, -1)
    return v[:, 0] + (v[:, 1] << 8)   # < 2^22 + 2^30 fine in u32


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def make_kernel(variant):
    R = 1 << 256
    ninv_int = (-pow(MOD, -1, R)) % R
    consts = np.stack([
        limb_mod.int_to_limbs(MOD),
        limb_mod.int_to_limbs(ninv_int),
        limb_mod.int_to_limbs(R % MOD),
        limb_mod.int_to_limbs(0),
    ], axis=1).astype(np.uint32)
    Mninv = build_toeplitz_bytes(ninv_int, 32, 32)
    Mn = build_toeplitz_bytes(MOD, 32, 64)

    def kern(consts_ref, mninv_ref, mn_ref, x_ref, y_ref, o_ref):
        cc = consts_ref[:]
        if variant == "v0":
            f = pe._F(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3])
        elif variant == "v1":
            f = F1b(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3])
        elif variant == "v2":
            f = F2(cc[:, 0:1], cc[:, 1:2], cc[:, 2:3], mninv_ref[:], mn_ref[:])
        x = x_ref[:]
        y = y_ref[:]
        for _ in range(K):
            x = f.mont_mul(x, y)
        o_ref[:] = x

    eb = pl.BlockSpec((L, B), lambda i: (0, i))
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((L, 4), lambda i: (0, 0)),
            pl.BlockSpec((32, 32), lambda i: (0, 0)),
            pl.BlockSpec((32, 64), lambda i: (0, 0)),
            eb, eb,
        ],
        out_specs=eb,
        out_shape=jax.ShapeDtypeStruct((L, B * GRID), U32),
        interpret=jax.default_backend() != "tpu",
    )
    return functools.partial(call, consts, Mninv, Mn)


def main():
    rng = np.random.default_rng(0)
    xs = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % MOD
          for _ in range(B * GRID)]
    ys = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % MOD
          for _ in range(B * GRID)]
    Rm = 1 << 256
    x = jnp.asarray(limb_mod.ints_to_limbs([v * Rm % MOD for v in xs]).T)
    y = jnp.asarray(limb_mod.ints_to_limbs([v * Rm % MOD for v in ys]).T)

    # expected: K chained muls (values stay in Montgomery form)
    exp = [v * Rm % MOD for v in xs]
    ys = [v * Rm % MOD for v in ys]
    rinv = pow(Rm, -1, MOD)
    for _ in range(K):
        exp = [a * b * rinv % MOD for a, b in zip(exp, ys)]

    which = sys.argv[1:] or ["v0", "v1", "v2"]
    for name in which:
        fn = jax.jit(make_kernel(name))
        t0 = time.time()
        out = np.asarray(jax.block_until_ready(fn(x, y)))
        tc = time.time() - t0
        got = limb_mod.limbs_to_ints(out.T)
        ok = got == exp
        t0 = time.time()
        for _ in range(REPS):
            r = fn(x, y)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / REPS
        rate = B * GRID * K / dt
        print(f"{name}: correct={ok} compile={tc:.1f}s run={dt*1e3:.2f}ms "
              f"rate={rate/1e6:.1f}M montmul/s")


if __name__ == "__main__":
    main()
