"""Batched short-Weierstrass point arithmetic on TPU (Jacobian coordinates).

Generic over a *field adapter* — either ops.limb.ModCtx (prime fields:
BN254 G1, P-256, T-256) or ops.quadratic.QuadCtx (BN254 G2 over Fq2) — so a
single group-law/Pippenger implementation serves every curve in the stack
(SURVEY.md §1/L0; the reference needs separate halo2curves + ark-ec code per
curve family).

A batch of points is a JPoints(X, Y, Z) of (..., *elem) limb arrays in
Montgomery form; the identity is Z == 0.  All case analysis (identity
inputs, P == Q, P == -Q) is branchless selects so one compiled program
serves every lane.

Formulas: dbl-2007-bl / add-2007-bl / madd-2007-bl (EFD), valid for any a.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.curves import BN254G2, Curve
from ..core.fields import BN254_FR
from . import limb
from .limb import NLIMB


class JPoints(NamedTuple):
    """Batch of Jacobian points; each field (..., *elem_shape) Montgomery."""

    x: jax.Array
    y: jax.Array
    z: jax.Array


class CurveCtx:
    """Batched group law for one curve over a field-adapter context."""

    def __init__(self, fctx, a_host, order: int, name: str):
        self.fctx = fctx
        self.name = name
        self.n = order
        self.fr = limb.get_ctx(order, f"{name}.fr")
        self.a_host = a_host
        self.a_mont = jnp.asarray(fctx.to_mont_host([a_host])[0])
        self.a_is_zero = a_host == fctx.host_zero
        self.add = jax.jit(self.add)
        self.double = jax.jit(self.double)
        self.add_mixed = jax.jit(self.add_mixed)
        self.scalar_mul = jax.jit(self.scalar_mul)

    # backward-compat alias: prime-curve field context
    @property
    def fp(self):
        return self.fctx

    # -- host conversion ----------------------------------------------------
    def points_to_device(self, pts) -> JPoints:
        """Affine host points [(x,y) | None, ...] -> batched Jacobian arrays."""
        f = self.fctx
        from ..utils.pointvec import ArrayPointVec

        if isinstance(pts, ArrayPointVec):
            # array fast path: limbs are already the wire format — upload
            # u16 planes, Montgomery-convert per base-field component on
            # device, build Z from the infinity mask (no per-point Python)
            from . import limb as limb_mod

            n = len(pts)
            base = getattr(f, "base", f)
            es = f.elem_shape
            dx = base.to_mont(
                limb_mod.upload_limbs(pts.xs).reshape((n,) + es)
            )
            dy = base.to_mont(
                limb_mod.upload_limbs(pts.ys).reshape((n,) + es)
            )
            v = jnp.asarray(~pts.inf).astype(jnp.uint32)
            one = jnp.asarray(f.to_mont_host([f.host_one])[0])
            vb = v.reshape((n,) + (1,) * len(es))
            dz = jnp.where(
                vb != 0, jnp.broadcast_to(one, dx.shape), jnp.uint32(0)
            )
            return JPoints(dx, dy, dz)
        if not hasattr(f, "base") and jax.default_backend() == "tpu":
            # TPU fast path: ship standard-form u16 limb planes (half the
            # tunnel bytes, no host bigint mulmods) and Montgomery-convert
            # on device; Z built on device from the validity vector.
            from . import limb as limb_mod

            xs = [0 if p is None else p[0] for p in pts]
            ys = [f.host_one if p is None else p[1] for p in pts]
            ok = np.asarray([0 if p is None else 1 for p in pts], dtype=np.uint16)
            dx = f.to_mont(limb_mod.upload_limbs(limb_mod.ints_to_limbs(xs)))
            dy = f.to_mont(limb_mod.upload_limbs(limb_mod.ints_to_limbs(ys)))
            v = jnp.asarray(ok).astype(jnp.uint32)
            one = jnp.asarray(f.to_mont_host([f.host_one])[0])
            dz = jnp.where(
                v[:, None] != 0, jnp.broadcast_to(one, dx.shape), jnp.uint32(0)
            )
            return JPoints(dx, dy, dz)
        xs = [f.host_zero if p is None else p[0] for p in pts]
        ys = [f.host_one if p is None else p[1] for p in pts]
        zs = [f.host_zero if p is None else f.host_one for p in pts]
        return JPoints(
            jnp.asarray(f.to_mont_host(xs)),
            jnp.asarray(f.to_mont_host(ys)),
            jnp.asarray(f.to_mont_host(zs)),
        )

    def points_to_host(self, P: JPoints) -> list:
        """Batched Jacobian -> affine host points (None for identity)."""
        f = self.fctx
        es = f.elem_shape
        xs = f.from_mont_host(np.asarray(P.x).reshape((-1,) + es))
        ys = f.from_mont_host(np.asarray(P.y).reshape((-1,) + es))
        zs = f.from_mont_host(np.asarray(P.z).reshape((-1,) + es))
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == f.host_zero:
                out.append(None)
            else:
                zi = f.host_inv(z)
                zi2 = f.host_mul(zi, zi)
                out.append((f.host_mul(x, zi2), f.host_mul(y, f.host_mul(zi2, zi))))
        return out

    def identity(self, shape=()) -> JPoints:
        f = self.fctx
        zero = f.broadcast_elem(jnp.asarray(f.to_mont_host([f.host_zero])[0]), shape)
        one = f.broadcast_elem(jnp.asarray(f.to_mont_host([f.host_one])[0]), shape)
        return JPoints(zero, one, zero)

    # -- group law ----------------------------------------------------------
    def double(self, P: JPoints) -> JPoints:
        f = self.fctx
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
            aZZ2 = f.mont_mul(
                f.broadcast_elem(self.a_mont, ZZ.shape[: ZZ.ndim - len(f.elem_shape)]),
                f.mont_sqr(ZZ),
            )
            M = f.add_mod(M, aZZ2)
        T = f.sub_mod(f.mont_sqr(M), f.add_mod(S, S))
        X3 = T
        # Y3 = M*(S-T) - 8*YYYY
        e8 = f.add_mod(YYYY, YYYY)
        e8 = f.add_mod(e8, e8)
        e8 = f.add_mod(e8, e8)
        Y3 = f.sub_mod(f.mont_mul(M, f.sub_mod(S, T)), e8)
        # Z3 = (Y1+Z1)^2 - YY - ZZ  (identity/2-torsion fall out as Z3 == 0)
        Z3 = f.sub_mod(f.sub_mod(f.mont_sqr(f.add_mod(Y1, Z1)), YY), ZZ)
        return JPoints(X3, Y3, Z3)

    def add(self, P: JPoints, Q: JPoints) -> JPoints:
        """Complete batched addition: handles identity, P==Q, P==-Q."""
        f = self.fctx
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

        x = f.select(p_inf, X2, f.select(q_inf, X1, f.select(same, dbl_res.x, add_res.x)))
        y = f.select(p_inf, Y2, f.select(q_inf, Y1, f.select(same, dbl_res.y, add_res.y)))
        z = f.select(p_inf, Z2, f.select(q_inf, Z1, f.select(same, dbl_res.z, add_res.z)))
        z = f.select(negs, jnp.zeros_like(z), z)
        return JPoints(x, y, z)

    def add_mixed(self, P: JPoints, qx: jax.Array, qy: jax.Array, q_valid: jax.Array) -> JPoints:
        """P (Jacobian) + Q (affine, Montgomery).  q_valid: (...,) 0/1 mask;
        lanes with q_valid==0 return P unchanged.  Complete w.r.t. identity
        and doubling cases (madd-2007-bl fast path + select fallbacks)."""
        f = self.fctx
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

        batch = X1.shape[: X1.ndim - len(f.elem_shape)]
        one = f.broadcast_elem(jnp.asarray(f.to_mont_host([f.host_one])[0]), batch)
        x = f.select(p_inf, qx, f.select(same, dbl_res.x, add_res.x))
        y = f.select(p_inf, qy, f.select(same, dbl_res.y, add_res.y))
        z = f.select(p_inf, one, f.select(same, dbl_res.z, add_res.z))
        z = f.select(negs, jnp.zeros_like(z), z)
        # q_valid==0: passthrough
        x = f.select(q_valid, x, X1)
        y = f.select(q_valid, y, Y1)
        z = f.select(q_valid, z, Z1)
        return JPoints(x, y, z)

    def scalar_mul(self, k_limbs: jax.Array, P: JPoints) -> JPoints:
        """Batched double-and-add: k (..., 16) standard-form limbs, P batch."""
        nbits = NLIMB * limb.LIMB_BITS
        batch = k_limbs.shape[:-1]

        def body(carry, i):
            acc, base = carry
            bit = (k_limbs[..., i // limb.LIMB_BITS] >> (i % limb.LIMB_BITS)) & 1
            added = self.add(acc, base)
            f = self.fctx
            acc = JPoints(
                f.select(bit, added.x, acc.x),
                f.select(bit, added.y, acc.y),
                f.select(bit, added.z, acc.z),
            )
            base = self.double(base)
            return (acc, base), None

        acc0 = self.identity(batch)
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
    fctx = limb.get_ctx(curve.p, f"{curve.name}.fp")
    ctx = CurveCtx(fctx, curve.a, curve.n, curve.name)
    ctx.curve = curve
    return ctx


@functools.lru_cache(maxsize=None)
def get_g2_ctx() -> CurveCtx:
    """BN254 G2 over Fq2 (a = 0, order = Fr modulus)."""
    from ..core.curves import G2_B
    from .quadratic import get_fq2_ctx

    fctx = get_fq2_ctx()
    ctx = CurveCtx(fctx, fctx.host_zero, BN254_FR, "bn254_g2")
    ctx.curve = BN254G2
    return ctx
