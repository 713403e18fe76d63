"""Device windowed fixed-base MSM — the SRS generator's hot loop on TPU.

The reference generator computes every proving-key table as k_i * G for a
single base per group (forks/groth16/src/generator.rs via ark-ec
FixedBase::msm: one shared window table, per-scalar windowed lookups on a
rayon pool).  At rs256@2048 that is 6.4M G1 + 1.4M G2 muls — ~61% of
zksetup on this host's 2-core native backend (PERF.md round 5).

TPU formulation: the shared table IS the ideal gather workload —
  * one (rows, 32*256) Montgomery-affine table of d * 2^(8w) * G multiples
    (1 MB for G1), built host-side in ~0.1 s;
  * per point, 32 unsigned 8-bit window digits (a byte view of the
    standard-form limb plane) index 32 table gathers, accumulated by the
    same fused mixed-add kernels the MSM uses (ops/pallas_ec.madd — valid
    masks handle digit == 0, identity handled by the complete formula);
  * one lax.scan over fixed-shape chunks compiles the whole batch into a
    single dispatch (the per-chunk Python loop cost ~220 tunnel
    round-trips at QAP scale, PERF.md round 3);
  * results convert Jacobian -> affine in-program via the shared
    product-tree batch inversion (ops/msm_affine.batch_inv) and leave the
    device as standard-form u16 limb planes — feeding the ArrayPointVec
    serialization path without ever materializing Python ints.

Gather accounting: 32 windows x 2 coords x rows u32 per point (= 1024 u32
for G1) at the measured ~1.2G elem/s aggregate gather rate plus ~32 madds
(~350 Montgomery muls) per point — ~10 s device time for the full rs256
G1 batch vs ~103 s native-host.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pointvec import ArrayPointVec
from . import limb as limb_mod
from .ec import CurveCtx
from .limb import NLIMB, U32
from .msm_affine import batch_inv

WBITS = 8
NWIN = NLIMB * 16 // WBITS  # 32 byte windows cover the 256-bit limb plane
TSIZE = 1 << WBITS


def pec_for(ctx: CurveCtx):
    """Kernel backend for a curve ctx: fused pallas kernels on TPU, the
    XLA adapter (same formula bodies) elsewhere."""
    from .msm import _pallas_for

    pec = _pallas_for(ctx)
    if pec is not None:
        return pec
    if hasattr(ctx.fctx, "base"):
        from .xla_pec import get_quad_xla_pec

        assert ctx.a_is_zero
        return get_quad_xla_pec(ctx.fctx.base.modulus)
    from .xla_pec import get_xla_pec

    return get_xla_pec(ctx.fctx.modulus, ctx.a_host % ctx.fctx.modulus)


class FixedBaseMSM:
    """[k_i * G] for one fixed base G, batched on device."""

    def __init__(self, ctx: CurveCtx, pec=None, chunk: int = 1 << 16):
        self.ctx = ctx
        self.pec = pec if pec is not None else pec_for(ctx)
        self.rows = getattr(self.pec, "ROWS", NLIMB)
        self.chunk = chunk
        self._progs: dict = {}
        base_mod = getattr(ctx.fctx, "base", ctx.fctx)
        # standard-form 1 (de-Montgomery multiplier) and Montgomery 1 planes
        one_std = np.zeros((self.rows, 1), dtype=np.uint32)
        one_std[0, 0] = 1
        self._one_std = jnp.asarray(one_std)
        om = np.zeros((self.rows, 1), dtype=np.uint32)
        om[:NLIMB, 0] = limb_mod.int_to_limbs(base_mod.R % base_mod.modulus)
        self._one_mont = jnp.asarray(om)

    # -- table --------------------------------------------------------------
    def table_scalars(self) -> list[int]:
        """Scalars whose base multiples form the window table, w-major:
        entry w*256+d holds (d ? d : 1) << (8w) mod n (d == 0 lanes are
        masked at accumulate time; a dummy nonzero multiple keeps the
        table identity-free so the affine planes are well-formed)."""
        n = self.ctx.n
        return [
            (max(d, 1) << (WBITS * w)) % n
            for w in range(NWIN)
            for d in range(TSIZE)
        ]

    def table_planes(self, table_pts):
        """8192 affine host points (w-major, from table_scalars) ->
        (rows, NWIN*256) Montgomery x/y planes on device."""
        assert len(table_pts) == NWIN * TSIZE
        P = self.ctx.points_to_device(table_pts)
        m = NWIN * TSIZE
        tx = P.x.reshape(m, self.rows).T
        ty = P.y.reshape(m, self.rows).T
        return tx, ty

    # -- program ------------------------------------------------------------
    def _get_prog(self, nchunks: int, ck: int):
        key = (nchunks, ck)
        if key in self._progs:
            return self._progs[key]
        pec, rows = self.pec, self.rows
        npad = nchunks * ck
        p2 = 1 << (npad - 1).bit_length()
        floor = min(512, p2)

        # graph-size control: one madd body per unroll step (a fully
        # unrolled 32-madd chain is the exact "unrolled mont pipeline"
        # shape XLA:CPU compiles for 30+ min — CLAUDE.md round-5 gotcha);
        # TPU default 8 overlaps next-window gathers with madd compute
        unroll = int(
            os.environ.get(
                "CRESCENT_FB_UNROLL",
                "8" if jax.default_backend() == "tpu" else "1",
            )
        )
        woff = jnp.arange(NWIN, dtype=U32) * TSIZE

        @jax.jit
        def prog(tx, ty, SC):
            def body(_, sc):  # sc: (ck, NLIMB) u32 standard-form limbs
                lo = sc & 0xFF
                hi = (sc >> 8) & 0xFF
                digits = jnp.stack([lo, hi], axis=2).reshape(ck, NWIN)
                zero = jnp.zeros((ck,), U32)

                def wbody(acc, inp):
                    d, off = inp
                    gx = tx[:, d + off]
                    gy = ty[:, d + off]
                    return (
                        pec.madd(*acc, gx, gy, (d != 0).astype(U32), zero),
                        None,
                    )

                acc0 = tuple(jnp.zeros((rows, ck), U32) for _ in range(3))
                (ax, ay, az), _ = jax.lax.scan(
                    wbody, acc0, (digits.T, woff), unroll=unroll
                )
                return None, (ax, ay, az)

            _, (AX, AY, AZ) = jax.lax.scan(body, None, SC)
            AX = jnp.moveaxis(AX, 1, 0).reshape(rows, npad)
            AY = jnp.moveaxis(AY, 1, 0).reshape(rows, npad)
            AZ = jnp.moveaxis(AZ, 1, 0).reshape(rows, npad)
            inf = jnp.all(AZ == 0, axis=0)  # (npad,) identity lanes
            one_m = jnp.broadcast_to(self._one_mont, (rows, npad))
            zm = jnp.where(inf[None, :], one_m, AZ)
            if p2 != npad:  # product tree needs power-of-two halving
                zm = jnp.concatenate(
                    [zm, jnp.broadcast_to(self._one_mont, (rows, p2 - npad))],
                    axis=1,
                )
            zi = batch_inv(pec, zm, floor)[:, :npad]
            zi2 = pec.mul(zi, zi)
            xa = pec.mul(AX, zi2)
            ya = pec.mul(AY, pec.mul(zi2, zi))
            # de-Montgomery (mont-mul by standard-form 1) -> wire format
            one_s = jnp.broadcast_to(self._one_std, (rows, npad))
            xa = pec.mul(xa, one_s)
            ya = pec.mul(ya, one_s)
            xa = jnp.where(inf[None, :], jnp.uint32(0), xa)
            ya = jnp.where(inf[None, :], jnp.uint32(0), ya)
            return xa.astype(jnp.uint16), ya.astype(jnp.uint16), inf

        self._progs[key] = prog
        return prog

    # -- entry --------------------------------------------------------------
    def dispatch(self, table_pts, scalar_limbs: np.ndarray):
        """Upload + enqueue the batch and return a handle immediately (JAX
        dispatch is async).  Lets the caller overlap another group's program
        with this one's result download — zksetup dispatches G1 then G2
        before fetching either, hiding the ~620 MB affine downloads behind
        the other program's compute (PERF.md round 5b zksetup note)."""
        n = int(scalar_limbs.shape[0])
        assert n > 0
        block = getattr(self.pec, "block", 1)
        ck = min(self.chunk, 1 << (n - 1).bit_length() if n > 1 else 1)
        ck = max(ck, min(block, self.chunk))
        nchunks = -(-n // ck)
        npad = nchunks * ck
        sc = np.zeros((npad, NLIMB), dtype=np.uint16)
        sc[:n] = np.asarray(scalar_limbs, dtype=np.uint16)
        tx, ty = self.table_planes(table_pts)
        SC = limb_mod.upload_limbs(sc).reshape(nchunks, ck, NLIMB)
        xa, ya, inf = self._get_prog(nchunks, ck)(tx, ty, SC)
        return xa, ya, inf, n

    def fetch(self, handle) -> ArrayPointVec:
        """Blocking download of a dispatch() handle -> ArrayPointVec."""
        xa, ya, inf, n = handle
        xs = np.asarray(jax.device_get(xa)).T[:n]  # (n, rows) u16
        ys = np.asarray(jax.device_get(ya)).T[:n]
        infh = np.asarray(jax.device_get(inf))[:n]
        return ArrayPointVec(
            np.ascontiguousarray(xs),
            np.ascontiguousarray(ys),
            infh,
            g2=self.rows != NLIMB,
        )

    def run(self, table_pts, scalar_limbs: np.ndarray) -> ArrayPointVec:
        """scalar_limbs: (N, 16) sub-2^16 standard-form limbs (u16/u32),
        scalars already reduced mod the group order.  Returns the affine
        results as an ArrayPointVec (identity for scalar == 0)."""
        return self.fetch(self.dispatch(table_pts, scalar_limbs))
