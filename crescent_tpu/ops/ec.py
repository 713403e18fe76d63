"""Batched short-Weierstrass point arithmetic on TPU (Jacobian coordinates).

Field layer: crescent_tpu.ops.limb (16x16-bit Montgomery limbs in uint32).
A batch of points is a tuple (X, Y, Z) of (..., 16) limb arrays in Montgomery
form; the identity is encoded as Z == 0.  All case analysis (identity inputs,
P == Q, P == -Q) is handled with branchless selects so the same compiled
program serves every lane — the TPU-native replacement for the reference's
scalar Rust point loops (forks/halo2curves/src/msm.rs, ark-ec).

Formulas: dbl-2007-bl / add-2007-bl / madd-2007-bl (EFD), valid for any a;
the curve constant `a` is folded in per-curve (a=0 for BN254, a=-3 for
P-256/T-256 — no special-casing needed for correctness).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.curves import Curve
from . import limb
from .limb import NLIMB, U32, ModCtx


class JPoints(NamedTuple):
    """Batch of Jacobian points; each field (..., NLIMB) uint32 Montgomery."""

    x: jax.Array
    y: jax.Array
    z: jax.Array


class CurveCtx:
    """Batched group law for one curve over its base-field ModCtx."""

    def __init__(self, curve: Curve):
        self.curve = curve
        self.fp: ModCtx = limb.get_ctx(curve.p, f"{curve.name}.fp")
        self.fr: ModCtx = limb.get_ctx(curve.n, f"{curve.name}.fr")
        self.a_mont = jnp.asarray(self.fp.to_mont_host([curve.a])[0])
        self.a_is_zero = curve.a == 0
        self.add = jax.jit(self.add)
        self.double = jax.jit(self.double)
        self.add_mixed = jax.jit(self.add_mixed)
        self.scalar_mul = jax.jit(self.scalar_mul)

    # -- host conversion ----------------------------------------------------
    def points_to_device(self, pts) -> JPoints:
        """Affine host points [(x,y) | None, ...] -> batched Jacobian arrays."""
        xs, ys, zs = [], [], []
        for p in pts:
            if p is None:
                xs.append(0)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(p[0])
                ys.append(p[1])
                zs.append(1)
        f = self.fp
        return JPoints(
            jnp.asarray(f.to_mont_host(xs)),
            jnp.asarray(f.to_mont_host(ys)),
            jnp.asarray(f.to_mont_host(zs)),
        )

    def points_to_host(self, P: JPoints) -> list:
        """Batched Jacobian -> affine host points (None for identity)."""
        f = self.fp
        xs = f.from_mont_host(np.asarray(P.x).reshape(-1, NLIMB))
        ys = f.from_mont_host(np.asarray(P.y).reshape(-1, NLIMB))
        zs = f.from_mont_host(np.asarray(P.z).reshape(-1, NLIMB))
        out = []
        p = self.curve.p
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
            else:
                zi = pow(z, -1, p)
                out.append((x * zi * zi % p, y * zi * zi * zi % p))
        return out

    def identity(self, shape=()) -> JPoints:
        f = self.fp
        return JPoints(
            jnp.broadcast_to(f.zero, shape + (NLIMB,)),
            jnp.broadcast_to(f.one_mont, shape + (NLIMB,)),
            jnp.broadcast_to(f.zero, shape + (NLIMB,)),
        )

    # -- group law ----------------------------------------------------------
    def double(self, P: JPoints) -> JPoints:
        f = self.fp
        X1, Y1, Z1 = P
        XX = f.mont_sqr(X1)
        YY = f.mont_sqr(Y1)
        YYYY = f.mont_sqr(YY)
        ZZ = f.mont_sqr(Z1)
        # S = 2*((X1+YY)^2 - XX - YYYY)
        S = f.mont_sqr(f.add_mod(X1, YY))
        S = f.sub_mod(f.sub_mod(S, XX), YYYY)
        S = f.add_mod(S, S)
        # M = 3*XX + a*ZZ^2
        M = f.add_mod(f.add_mod(XX, XX), XX)
        if not self.a_is_zero:
            aZZ2 = f.mont_mul(jnp.broadcast_to(self.a_mont, ZZ.shape), f.mont_sqr(ZZ))
            M = f.add_mod(M, aZZ2)
        T = f.sub_mod(f.mont_sqr(M), f.add_mod(S, S))
        X3 = T
        # Y3 = M*(S-T) - 8*YYYY
        e8 = f.add_mod(YYYY, YYYY)
        e8 = f.add_mod(e8, e8)
        e8 = f.add_mod(e8, e8)
        Y3 = f.sub_mod(f.mont_mul(M, f.sub_mod(S, T)), e8)
        # Z3 = (Y1+Z1)^2 - YY - ZZ
        Z3 = f.sub_mod(f.sub_mod(f.mont_sqr(f.add_mod(Y1, Z1)), YY), ZZ)
        # doubling a 2-torsion point (Y==0) or identity yields identity (Z3==0
        # automatically in both cases).
        return JPoints(X3, Y3, Z3)

    def add(self, P: JPoints, Q: JPoints) -> JPoints:
        """Complete batched addition: handles identity, P==Q, P==-Q."""
        f = self.fp
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = f.mont_sqr(Z1)
        Z2Z2 = f.mont_sqr(Z2)
        U1 = f.mont_mul(X1, Z2Z2)
        U2 = f.mont_mul(X2, Z1Z1)
        S1 = f.mont_mul(f.mont_mul(Y1, Z2), Z2Z2)
        S2 = f.mont_mul(f.mont_mul(Y2, Z1), Z1Z1)
        H = f.sub_mod(U2, U1)
        r = f.sub_mod(S2, S1)

        h_zero = f.is_zero(H)
        r_zero = f.is_zero(r)
        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)

        I = f.mont_sqr(f.add_mod(H, H))
        J = f.mont_mul(H, I)
        rr = f.add_mod(r, r)
        V = f.mont_mul(U1, I)
        X3 = f.sub_mod(f.sub_mod(f.mont_sqr(rr), J), f.add_mod(V, V))
        SJ = f.mont_mul(S1, J)
        Y3 = f.sub_mod(f.mont_mul(rr, f.sub_mod(V, X3)), f.add_mod(SJ, SJ))
        Z3 = f.mont_mul(
            f.sub_mod(f.sub_mod(f.mont_sqr(f.add_mod(Z1, Z2)), Z1Z1), Z2Z2), H
        )
        add_res = JPoints(X3, Y3, Z3)

        dbl_res = self.double(P)

        # case select (per lane):
        #   p_inf -> Q;  q_inf -> P;
        #   H==0 & r==0 (same point) -> double;  H==0 & r!=0 (negatives) -> inf
        same = h_zero * r_zero * (1 - p_inf) * (1 - q_inf)
        negs = h_zero * (1 - r_zero) * (1 - p_inf) * (1 - q_inf)

        def sel(c, a, b):
            return limb.select(c, a, b)

        x = sel(p_inf, X2, sel(q_inf, X1, sel(same, dbl_res.x, add_res.x)))
        y = sel(p_inf, Y2, sel(q_inf, Y1, sel(same, dbl_res.y, add_res.y)))
        z = sel(p_inf, Z2, sel(q_inf, Z1, sel(same, dbl_res.z, add_res.z)))
        z = sel(negs, jnp.zeros_like(z), z)
        return JPoints(x, y, z)

    def add_mixed(self, P: JPoints, qx: jax.Array, qy: jax.Array, q_valid: jax.Array) -> JPoints:
        """P (Jacobian) + Q (affine, Montgomery).  q_valid: (...,) 0/1 mask;
        lanes with q_valid==0 return P unchanged.  Complete w.r.t. identity
        and doubling cases (madd-2007-bl fast path + select fallbacks)."""
        f = self.fp
        X1, Y1, Z1 = P
        Z1Z1 = f.mont_sqr(Z1)
        U2 = f.mont_mul(qx, Z1Z1)
        S2 = f.mont_mul(f.mont_mul(qy, Z1), Z1Z1)
        H = f.sub_mod(U2, X1)
        r = f.sub_mod(S2, Y1)

        h_zero = f.is_zero(H)
        r_zero = f.is_zero(r)
        p_inf = f.is_zero(Z1)

        HH = f.mont_sqr(H)
        I = f.add_mod(f.add_mod(HH, HH), f.add_mod(HH, HH))
        J = f.mont_mul(H, I)
        rr = f.add_mod(r, r)
        V = f.mont_mul(X1, I)
        X3 = f.sub_mod(f.sub_mod(f.mont_sqr(rr), J), f.add_mod(V, V))
        YJ = f.mont_mul(Y1, J)
        Y3 = f.sub_mod(f.mont_mul(rr, f.sub_mod(V, X3)), f.add_mod(YJ, YJ))
        Z3 = f.sub_mod(f.sub_mod(f.mont_sqr(f.add_mod(Z1, H)), Z1Z1), HH)
        add_res = JPoints(X3, Y3, Z3)

        dbl_res = self.double(P)

        same = h_zero * r_zero * (1 - p_inf)
        negs = h_zero * (1 - r_zero) * (1 - p_inf)

        one = jnp.broadcast_to(f.one_mont, X1.shape)
        x = limb.select(p_inf, qx, limb.select(same, dbl_res.x, add_res.x))
        y = limb.select(p_inf, qy, limb.select(same, dbl_res.y, add_res.y))
        z = limb.select(p_inf, one, limb.select(same, dbl_res.z, add_res.z))
        z = limb.select(negs, jnp.zeros_like(z), z)
        # q_valid==0: passthrough
        x = limb.select(q_valid, x, X1)
        y = limb.select(q_valid, y, Y1)
        z = limb.select(q_valid, z, Z1)
        return JPoints(x, y, z)

    def scalar_mul(self, k_limbs: jax.Array, P: JPoints) -> JPoints:
        """Batched double-and-add: k (..., 16) standard-form limbs, P batch."""
        nbits = NLIMB * limb.LIMB_BITS

        def body(carry, i):
            acc, base = carry
            bit = (k_limbs[..., i // limb.LIMB_BITS] >> (i % limb.LIMB_BITS)) & 1
            added = self.add(acc, base)
            acc = JPoints(
                limb.select(bit, added.x, acc.x),
                limb.select(bit, added.y, acc.y),
                limb.select(bit, added.z, acc.z),
            )
            base = self.double(base)
            return (acc, base), None

        acc0 = self.identity(P.x.shape[:-1])
        (acc, _), _ = jax.lax.scan(body, (acc0, P), jnp.arange(nbits))
        return acc

    def reduce_sum(self, P: JPoints) -> JPoints:
        """Tree-reduce a batch of points (leading axis) to a single point."""
        n = P.x.shape[0]
        while n > 1:
            half = n // 2
            even = JPoints(P.x[: 2 * half : 2], P.y[: 2 * half : 2], P.z[: 2 * half : 2])
            odd = JPoints(P.x[1 : 2 * half : 2], P.y[1 : 2 * half : 2], P.z[1 : 2 * half : 2])
            red = self.add(even, odd)
            if n % 2:
                red = JPoints(
                    jnp.concatenate([red.x, P.x[-1:]], axis=0),
                    jnp.concatenate([red.y, P.y[-1:]], axis=0),
                    jnp.concatenate([red.z, P.z[-1:]], axis=0),
                )
            P = red
            n = (n + 1) // 2
        return JPoints(P.x[0], P.y[0], P.z[0])


@functools.lru_cache(maxsize=None)
def get_curve_ctx(curve: Curve) -> CurveCtx:
    return CurveCtx(curve)
