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


class ShardedMSM:
    """Host-friendly wrapper mirroring ops.msm.MSM over a device mesh."""

    def __init__(self, ctx_or_curve, mesh: Mesh, c: int = 8, lanes: int = 64):
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
        self._fn = sharded_msm_fn(self.ctx, mesh, c, lanes)

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
        digits, signs = digits_signed_jit(sc, self.c)
        res = self._fn(Pts.x, Pts.y, valid, digits, signs)
        return self.ctx.points_to_host(
            JPoints(res.x[None], res.y[None], res.z[None])
        )[0]
