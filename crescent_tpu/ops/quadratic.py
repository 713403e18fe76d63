"""Batched Fq2 (quadratic extension) arithmetic on TPU.

Gives the EC/MSM layer a second field backend so BN254 G2 points run through
the *same* Pippenger/group-law code as G1 — the TPU-native replacement for
arkworks' generic `Fp2` + G2 msm (used by Groth16 setup's b_g2_query and the
prover's B-in-G2 MSM, forks/groth16/src/prover.rs).

Elements are (..., 2, NLIMB) uint32: component 0 is the real part, both in
Montgomery form over the base ModCtx.  u^2 = -1 (BN254's Fq2), i.e. the
nonresidue is -1; Karatsuba: 3 base muls per Fq2 mul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.fields import Fq2
from . import limb
from .limb import NLIMB, U32, ModCtx


class QuadCtx:
    """Fq2 = Fq[u]/(u^2+1) over a base ModCtx, ModCtx-compatible interface."""

    def __init__(self, base: ModCtx, name: str = "fq2"):
        self.base = base
        self.name = name
        self.modulus = base.modulus  # base characteristic (for NTT gating etc.)
        self.zero = jnp.zeros((2, NLIMB), dtype=U32)
        self.one_mont = jnp.stack([base.one_mont, base.zero])
        self.mont_mul = jax.jit(self.mont_mul)
        self.mont_sqr = jax.jit(self.mont_sqr)
        self.add_mod = jax.jit(self.add_mod)
        self.sub_mod = jax.jit(self.sub_mod)
        self.neg_mod = jax.jit(self.neg_mod)

    # -- host conversion: values are core.fields.Fq2 -----------------------
    def to_mont_host(self, xs) -> np.ndarray:
        re = self.base.to_mont_host([x.c0 for x in xs])
        im = self.base.to_mont_host([x.c1 for x in xs])
        return np.stack([re, im], axis=1)  # (n, 2, NLIMB)

    def from_mont_host(self, a) -> list[Fq2]:
        a = np.asarray(a).reshape(-1, 2, NLIMB)
        re = self.base.from_mont_host(a[:, 0])
        im = self.base.from_mont_host(a[:, 1])
        return [Fq2(r, i) for r, i in zip(re, im)]

    # -- device ops ---------------------------------------------------------
    def mont_mul(self, x: jax.Array, y: jax.Array) -> jax.Array:
        b = self.base
        x0, x1 = x[..., 0, :], x[..., 1, :]
        y0, y1 = y[..., 0, :], y[..., 1, :]
        t0 = b.mont_mul(x0, y0)
        t1 = b.mont_mul(x1, y1)
        t2 = b.mont_mul(b.add_mod(x0, x1), b.add_mod(y0, y1))
        c0 = b.sub_mod(t0, t1)
        c1 = b.sub_mod(b.sub_mod(t2, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    def mont_sqr(self, x: jax.Array) -> jax.Array:
        b = self.base
        x0, x1 = x[..., 0, :], x[..., 1, :]
        c0 = b.mont_mul(b.add_mod(x0, x1), b.sub_mod(x0, x1))
        t = b.mont_mul(x0, x1)
        c1 = b.add_mod(t, t)
        return jnp.stack([c0, c1], axis=-2)

    def add_mod(self, x, y):
        b = self.base
        return jnp.stack(
            [b.add_mod(x[..., 0, :], y[..., 0, :]), b.add_mod(x[..., 1, :], y[..., 1, :])],
            axis=-2,
        )

    def sub_mod(self, x, y):
        b = self.base
        return jnp.stack(
            [b.sub_mod(x[..., 0, :], y[..., 0, :]), b.sub_mod(x[..., 1, :], y[..., 1, :])],
            axis=-2,
        )

    def neg_mod(self, x):
        b = self.base
        return jnp.stack(
            [b.neg_mod(x[..., 0, :]), b.neg_mod(x[..., 1, :])], axis=-2
        )

    def is_zero(self, x) -> jax.Array:
        return jnp.all(x == 0, axis=(-1, -2)).astype(U32)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None].astype(bool), a, b)

    def broadcast_elem(self, e: jax.Array, batch_shape) -> jax.Array:
        return jnp.broadcast_to(e, tuple(batch_shape) + (2, NLIMB))

    @property
    def elem_shape(self):
        return (2, NLIMB)

    # host-value helpers (values are core.fields.Fq2)
    host_zero = Fq2(0, 0)
    host_one = Fq2(1, 0)

    def host_mul(self, a: Fq2, b: Fq2) -> Fq2:
        return a * b

    def host_inv(self, a: Fq2) -> Fq2:
        return a.inv()


@functools.lru_cache(maxsize=None)
def get_fq2_ctx() -> QuadCtx:
    from ..core.fields import BN254_FQ

    return QuadCtx(limb.get_ctx(BN254_FQ), "bn254.fq2")
