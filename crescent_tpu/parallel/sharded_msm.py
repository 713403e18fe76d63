"""Multi-chip MSM: point-sharded Pippenger with ring bucket reduction.

The distributed design SURVEY.md §2f/§5 calls for (the reference is
single-process rayon; this layer is new, TPU-first):

  * Phase 1-2 (bucket accumulate + lane fold) is embarrassingly parallel over
    the *point* axis -> shard points across the mesh with shard_map; each
    device builds its own (W, B) bucket set from its N/D points.
  * The bucket sets are then combined with an `all_gather` over ICI followed
    by a local scan-fold (D-1 batched point-adds over the (W, B) plane) —
    EC point addition is not a `psum`-able monoid, so the collective moves
    bytes and the VPU does the group law.  1.5 MB per bucket set, ICI-cheap.
  * Phases 3-4 (suffix sums + Horner) are replicated on every device; the
    result is a replicated single point.

Scaling axis match to BASELINE.json: "MSMs partitioned across a multi-host
pod slice with bucket sums reduced via collectives".
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import limb
from ..ops.ec import CurveCtx, JPoints
from ..ops.msm import _accumulate_buckets, _aggregate_buckets, digits_signed_jit
from ..ops.limb import U32


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def sharded_msm_fn(ctx: CurveCtx, mesh: Mesh, c: int = 8, lanes: int = 64, axis: str = "points"):
    """Returns a jitted fn(px, py, pvalid, digits) -> JPoints computing the
    full MSM with points sharded over `axis` of `mesh`."""

    def local(px, py, pvalid, digits, signs):
        wb = _accumulate_buckets(ctx, px, py, pvalid, digits, signs, c, lanes)
        # combine bucket sets from all devices (ring of point-adds)
        allb = jax.lax.all_gather(wb, axis)          # (D, W, B) JPoints

        def fold(acc, dev_buckets):
            return ctx.add(acc, dev_buckets), None

        W, B = wb.x.shape[0], wb.x.shape[1]
        wb_sum, _ = jax.lax.scan(fold, ctx.identity((W, B)), allb)
        return _aggregate_buckets(ctx, wb_sum, c)

    es = ctx.fctx.elem_shape
    pt_spec = P(axis, *([None] * len(es)))
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(pt_spec, pt_spec, P(axis), P(axis, None), P(axis, None)),
        out_specs=JPoints(
            P(*([None] * (len(es)))), P(*([None] * (len(es)))), P(*([None] * (len(es))))
        ),
        check_vma=False,
    )
    return jax.jit(f)


def sharded_affine_msm_fn(am, mesh: Mesh, n_local: int, axis: str = "points"):
    """Sharded version of the segmented-affine pipeline (ops/msm_affine.py
    — the 297k pts/s single-chip formulation, PERF queue #6): each device
    sorts/reduces its OWN n_local points down to survivor arrays and
    scatters them into a dense (rows, W*B) Jacobian bucket table; only
    those tables (≈1.5 MB each) cross ICI via all_gather; a D-step jadd
    scan folds them and one replicated aggregate finishes.

    `am`: AffineMSM instance; n_local: per-device point count (static)."""
    pec = am.pec
    ctx = am.ctx

    def local(px, py, pvalid, scalars):
        pk, ex, ey = am._survivors(px, py, pvalid, scalars, n_local)
        dx, dy, dz = am._scatter_dense(pk, ex, ey)
        allx = jax.lax.all_gather(dx, axis)   # (D, rows, W*B)
        ally = jax.lax.all_gather(dy, axis)
        allz = jax.lax.all_gather(dz, axis)

        def fold(acc, t):
            ax, ay, az = acc
            bx, by, bz = t
            return tuple(pec.jadd(ax, ay, az, bx, by, bz)), None

        (sx, sy, sz), _ = jax.lax.scan(
            fold, (allx[0], ally[0], allz[0]), (allx[1:], ally[1:], allz[1:])
        )
        x, y, z = am._aggregate_dense(sx, sy, sz)
        return JPoints(x, y, z)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis, None)),
        out_specs=JPoints(P(None), P(None), P(None)),
        check_vma=False,
    )
    return jax.jit(f)


class ShardedMSM:
    """Host-friendly wrapper mirroring ops.msm.MSM over a device mesh.

    Two formulations (PERF queue #6):
      * segmented-affine (default when the pallas pec applies): the 297k
        pts/s single-chip pipeline runs per shard; only dense bucket
        tables cross ICI (sharded_affine_msm_fn).
      * scan-Pippenger fallback (sharded_msm_fn) for contexts without a
        pec (or CRESCENT_SHARDED_AFFINE=0).
    """

    def __init__(self, ctx_or_curve, mesh: Mesh, c: int = 8, lanes: int = 64,
                 affine_c: int | None = None):
        from ..ops.ec import get_curve_ctx
        from ..core.curves import Curve

        self.ctx = (
            ctx_or_curve
            if isinstance(ctx_or_curve, CurveCtx)
            else get_curve_ctx(ctx_or_curve)
        )
        self.mesh = mesh
        self.c = c
        self.lanes = lanes
        import os

        if affine_c is None:
            # CPU meshes shrink the bucket plane: the XLA:CPU backend
            # executes limb graphs near-serially, so plane width is the
            # wall-clock (same reasoning as CRESCENT_SHARDED_C=4)
            affine_c = int(os.environ.get(
                "CRESCENT_SHARDED_AFFINE_C",
                "11" if jax.default_backend() == "tpu" else "6",
            ))
        self.affine_c = affine_c
        self._fn = None
        self._am = None
        self._affine_fns: dict[int, object] = {}

    def _affine_msm(self):
        """AffineMSM for the sharded-affine path, or None.

        CRESCENT_SHARDED_AFFINE: "auto" (default — affine on TPU, scan
        elsewhere), "1" (force affine; CPU meshes run it through the XLA
        adapter), "0" (force the scan-Pippenger fallback)."""
        import os

        mode = os.environ.get("CRESCENT_SHARDED_AFFINE", "auto")
        if mode == "0":
            return None
        if mode != "1" and jax.default_backend() != "tpu":
            return None
        if self._am is None:
            from ..ops.msm import _pallas_for
            from ..ops.msm_affine import AffineMSM

            pec = _pallas_for(self.ctx)
            if pec is None:
                # Mosaic unavailable (CPU mesh / tests / dryrun): run the
                # SAME affine formulation through the XLA-only adapter —
                # identical math, normal XLA compile times (interpret-mode
                # pallas compiles these pipelines for minutes)
                if hasattr(self.ctx.fctx, "base"):
                    return None  # Fq2 XLA adapter not implemented
                from ..ops.xla_pec import get_xla_pec

                pec = get_xla_pec(
                    self.ctx.fctx.modulus,
                    self.ctx.a_host % self.ctx.fctx.modulus,
                )
            self._am = AffineMSM(self.ctx, pec, c=self.affine_c)
        return self._am

    def _affine_fn(self, n_local: int):
        if n_local not in self._affine_fns:
            self._affine_fns[n_local] = sharded_affine_msm_fn(
                self._am, self.mesh, n_local
            )
        return self._affine_fns[n_local]

    def run_host(self, scalars, points):
        n = len(points)
        d = self.mesh.devices.size
        # shape-bucket to powers of two so nearby problem sizes (e.g. the 4
        # Groth16 prove MSMs) share ONE compiled shard_map program; floor at
        # 4 points/device so tiny MSMs (dryrun gate, 2^4 dummy circuits)
        # collapse onto a single compiled shape as well
        npad = 1 << (n - 1).bit_length() if n > 1 else 1
        npad = max(npad, 4 * d)
        npad = -(-npad // d) * d
        points = list(points) + [None] * (npad - n)
        scalars = list(scalars) + [0] * (npad - n)
        Pts = self.ctx.points_to_device(points)
        valid = jnp.asarray([0 if p is None else 1 for p in points], dtype=U32)
        sc = jnp.asarray(limb.ints_to_limbs([s % self.ctx.n for s in scalars]))
        am = self._affine_msm()
        if am is not None:
            rows = am.rows
            px = Pts.x.reshape(npad, rows)
            py = Pts.y.reshape(npad, rows)
            res = self._affine_fn(npad // d)(px, py, valid, sc)
            esh = self.ctx.fctx.elem_shape
            res = JPoints(
                res.x.reshape(esh), res.y.reshape(esh), res.z.reshape(esh)
            )
        else:
            if self._fn is None:
                self._fn = sharded_msm_fn(self.ctx, self.mesh, self.c, self.lanes)
            digits, signs = digits_signed_jit(sc, self.c)
            res = self._fn(Pts.x, Pts.y, valid, digits, signs)
        return self.ctx.points_to_host(
            JPoints(res.x[None], res.y[None], res.z[None])
        )[0]
