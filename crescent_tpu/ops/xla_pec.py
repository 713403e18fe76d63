"""XLA-only adapter with the PallasEC interface (no Mosaic kernels).

Reuses the SAME field core (`pallas_ec._F`, scalar-reduction path) and the
SAME point-formula bodies (`_double`, `_madd_body`, `_jadd_body`,
`_affine_*`) as the TPU kernels, but as plain jnp ops — so the
segmented-affine MSM formulation (ops/msm_affine.py) runs anywhere XLA
does.  Two uses:

  * the multi-chip CPU mesh (tests / driver dryrun): Mosaic interpret mode
    compiles the big pipelines for minutes; this adapter compiles like any
    XLA program, so the sharded-affine MSM (parallel/sharded_msm.py) is
    exercised with the exact same math on 8 virtual devices.
  * an independent correctness oracle for the pallas kernels themselves
    (same bodies, different lowering).

Everything operates on (ROWS, N) u32 Montgomery limb planes, exactly like
PallasEC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as limb_mod
from .limb import LIMB_BITS, NLIMB, U32
from .pallas_ec import (
    _F,
    _affine_add_body,
    _affine_denom_body,
    _double,
    _jadd_body,
    _madd_body,
)


class XlaPEC:
    ROWS = NLIMB
    block = 1  # no lane-padding constraints

    def __init__(self, modulus: int, a_host: int = 0):
        self.modulus = modulus
        self.a_is_zero = a_host % modulus == 0
        R = 1 << (LIMB_BITS * NLIMB)
        ninv_int = (-pow(modulus, -1, R)) % R
        col = lambda x: np.asarray(limb_mod.int_to_limbs(x), dtype=np.uint32)[:, None]
        self._n = col(modulus)
        self._ninv = col(ninv_int)
        self._one = col(R % modulus)
        self._a_mont = col(a_host * R % modulus)
        e = modulus - 2
        self._ebits = np.array([(e >> (255 - i)) & 1 for i in range(256)],
                               dtype=np.int32)

    @property
    def _f(self) -> _F:
        return _F(self._n, self._ninv, self._one)

    # -- point ops (PallasEC surface) ---------------------------------------
    def madd(self, x1, y1, z1, qx, qy, valid, sign):
        f = self._f
        return _madd_body(
            f, self._a_mont, self.a_is_zero, x1, y1, z1, qx, qy,
            valid[None, :] != 0, sign[None, :] != 0,
        )

    def jadd(self, x1, y1, z1, x2, y2, z2):
        return _jadd_body(self._f, self._a_mont, self.a_is_zero,
                          x1, y1, z1, x2, y2, z2)

    def jdbl(self, x1, y1, z1):
        return _double(self._f, self._a_mont, self.a_is_zero, x1, y1, z1)

    def jdbl_n(self, x1, y1, z1, count: int):
        f = self._f

        def body(_, st):
            return _double(f, self._a_mont, self.a_is_zero, *st)

        return jax.lax.fori_loop(0, count, body, (x1, y1, z1))

    def mul(self, x, y):
        return self._f.mont_mul(x, y)

    def butterfly(self, a, b, tw):
        f = self._f
        t = f.mont_mul(b, tw)
        return f.add(a, t), f.sub(a, t)

    def inv(self, x):
        f = self._f
        ebits = jnp.asarray(self._ebits)
        one = jnp.broadcast_to(f.one_mont, x.shape)

        def body(i, acc):
            acc = f.sqr(acc)
            mul = f.mont_mul(acc, x)
            return jnp.where(ebits[i] != 0, mul, acc)

        return jax.lax.fori_loop(0, 256, body, one)

    def affine_denom(self, lx, ly, lv, rx, ry, rv):
        return _affine_denom_body(
            self._f, lx, ly, lv[None, :] != 0, rx, ry, rv[None, :] != 0
        )

    def affine_add(self, lx, ly, lv, rx, ry, rv, inv):
        x, y, v = _affine_add_body(
            self._f, self._a_mont, self.a_is_zero,
            lx, ly, lv[None, :] != 0, rx, ry, rv[None, :] != 0, inv,
        )
        return x, y, v[0].astype(U32)

    @staticmethod
    def bucket_stride(B: int) -> int:
        raise NotImplementedError("fused aggregate is pallas-only")

    def bucket_reduce(self, *a, **kw):
        raise NotImplementedError("fused aggregate is pallas-only")


class QuadXlaPEC(XlaPEC):
    """Fq2 (G2) variant on stacked (32, N) planes — the XLA analog of
    pallas_ec.QuadPallasEC, sharing `_F2` and the point-formula bodies."""

    ROWS = 2 * NLIMB

    def __init__(self, modulus: int):
        super().__init__(modulus, 0)

    @property
    def _f(self):
        from .pallas_ec import _F2

        return _F2(_F(self._n, self._ninv, self._one))

    def inv(self, x):
        """Batched Fq2 inversion via the norm map: 1/(a+bu) =
        (a - bu) / (a^2 + b^2) — one base-field Fermat loop
        (pallas_ec.QuadPallasEC._inv_core semantics)."""
        f2 = self._f
        base = f2.b
        x0, x1 = x[:NLIMB], x[NLIMB:]
        nrm = base.add(base.sqr(x0), base.sqr(x1))
        ebits = jnp.asarray(self._ebits)
        one = jnp.broadcast_to(base.one_mont, nrm.shape)

        def body(i, acc):
            acc = base.sqr(acc)
            mul = base.mont_mul(acc, nrm)
            return jnp.where(ebits[i] != 0, mul, acc)

        ninv = jax.lax.fori_loop(0, 256, body, one)
        return jnp.concatenate(
            [base.mont_mul(x0, ninv), base.mont_mul(base.neg(x1), ninv)],
            axis=0,
        )


@functools.lru_cache(maxsize=None)
def get_xla_pec(modulus: int, a_host_mod: int = 0) -> XlaPEC:
    return XlaPEC(modulus, a_host_mod)


@functools.lru_cache(maxsize=None)
def get_quad_xla_pec(modulus: int) -> QuadXlaPEC:
    return QuadXlaPEC(modulus)
