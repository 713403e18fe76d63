"""Sorted-segment batched-affine Pippenger MSM (TPU) — single-dispatch.

The scan-based accumulator in ops/msm.py pays ~52 Montgomery muls per point
(26 for the complete Jacobian mixed add — half of them for the always-taken
doubling branch — and another 26 in the lane fold), plus a bucket
gather/scatter every scan step.  This module replaces the whole pipeline
with the structure recent MSM accelerators use (cf. if-ZKP / SZKP bucket
schedulers) re-shaped for SIMD, and compiles the ENTIRE MSM into ONE jitted
program — profiling showed per-round host round-trips through the TPU
tunnel (survivor-count pulls, termination checks, host root inversions, and
even the eager digit recoding) costing more than the field work itself.

Pipeline (all device-side, zero host syncs):

  1. signed window digits (computed in-program) -> flat entries keyed by
     (window, bucket) with the entry VALIDITY packed into the key's low bit
     (an invalid survivor keeps its segment key, so reduction-round
     accounting is unchanged, but validity needs no separate gather);
     the sort payload is (point_index << 1 | sign), so round 1 reads
     coordinates straight from the (16, N) / (16, 2N) point tables instead
     of materializing (16, N*W) gathered copies;
  2. ONE `lax.sort` over (packed_key, payload) groups same-bucket entries
     into contiguous segments (~0.7 ms for 2M keys on a v5e — measured);
  3. ceil(log4(M)) rounds of 4-ary segmented reduction: each round locates
     rank-quads of same-key entries (quad-head positions = stable argsort of
     the head mask — TPU XLA lowers scatter and vectorized searchsorted to
     serial-ish code, gathers are the only fast primitive), runs TWO levels
     of batched affine pair addition (one shared Montgomery product-tree
     inversion per level, root block inverted ON DEVICE by a single-block
     Fermat kernel looping over the exponent bits in-VMEM, unwind muls fused
     two-per-launch), and compacts survivors by gather.  Array sizes follow
     a static worst-case schedule (survivors <= m/4 + 3/4 * #segments), so
     no data-dependent shapes;
  4. survivors scatter into a dense (W, B) bucket table; per-window suffix
     sums run as shift-add rounds of the fused Jacobian-add kernel, bucket
     weighting as a log tree, and windows combine by a doubling tree whose
     doubling chains run inside one kernel (fori_loop over 2^j * c steps).

Field work ~= 7 muls per consumed entry vs ~52 for the scan path.

Reference equivalent: forks/halo2curves/src/msm.rs:336-464 (serial CPU
Pippenger; the affine-pair rounds replace its per-bucket running adds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ec import CurveCtx, JPoints
from .limb import LIMB_BITS, NLIMB, U32

I32 = jnp.int32


def _cummax(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _gather_blocks(a, starts, width: int):
    """Contiguous-block gather via vmap(dynamic_slice): rows
    a[..., s : s+width] for each s.  NOT used on the MSM hot path — on TPU
    the blocked lowering measured 3.4x slower than `width` independent
    1-D gathers (kept for reference/experiments; see PERF.md round 4)."""
    if a.ndim == 1:
        return jax.vmap(lambda p: jax.lax.dynamic_slice(a, (p,), (width,)))(
            starts
        )
    return jax.vmap(
        lambda p: jax.lax.dynamic_slice(a, (0, p), (a.shape[0], width)),
        out_axes=1,
    )(starts)


def batch_inv(pec, d, inv_floor: int = 512):
    """Montgomery product-tree inversion of (rows, n) nonzero planes:
    ~3 muls per element + one single-block Fermat kernel on the root.
    n must halve evenly down to inv_floor (callers pad; power-of-two n
    always works).  Shared by the MSM reduction rounds and the fixed-base
    SRS generator (ops/fixed_base.py).

    inv_floor trades tree launches for Fermat lanes: the 256-iteration
    exponent loop costs ~0.53 us/lane, so a 4096-wide root burned ~2 ms
    per inversion (x22 per MSM).  Measured on v5e at 2^16 (profile_msm_r4):
    floor 4096 -> 290 ms, 1024 -> 229 ms, 512 -> 221 ms (the pallas block
    floor; lower just pads back up).  512 is the default."""
    rows = d.shape[0]
    levels = [d]
    while levels[-1].shape[1] > inv_floor:
        cur = levels[-1]
        assert cur.shape[1] % 2 == 0, cur.shape
        levels.append(pec.mul(cur[:, 0::2], cur[:, 1::2]))
    inv = pec.inv(levels[-1])
    for cur in levels[-2::-1]:
        le, ro = cur[:, 0::2], cur[:, 1::2]
        w = cur.shape[1] // 2
        both = pec.mul(
            jnp.concatenate([inv, inv], axis=1),
            jnp.concatenate([ro, le], axis=1),
        )
        inv = jnp.stack([both[:, :w], both[:, w:]], axis=2).reshape(
            rows, cur.shape[1]
        )
    return inv


def quantize(n: int, floor: int = 512) -> int:
    """Round up into the quarter-power-of-two family {2^k * (4+i)/4}.
    Halving a family member stays in the family, so the product-tree levels
    inside every round reuse the same compiled kernel shapes."""
    n = max(int(n), 1)
    if n <= floor:
        return floor
    q = 1 << max(int(n - 1).bit_length() - 2, 0)
    return -(-n // q) * q


class AffineMSM:
    """Segmented-affine MSM executor for one prime-field curve context.

    One jitted program per (padded) input size; everything device-side."""

    def __init__(self, ctx: CurveCtx, pec, c: int = 11, min_bucket: int = 512,
                 inv_floor: int = 512):
        self.ctx = ctx
        self.pec = pec
        self.rows = getattr(pec, "ROWS", NLIMB)  # u32 planes per coordinate
        self.c = c
        self.min_bucket = min_bucket
        self.inv_floor = inv_floor
        self.B = (1 << (c - 1)) + 1          # signed digits: |d| <= 2^(c-1)
        nbits = NLIMB * LIMB_BITS
        self.W = (nbits + c - 1) // c + 1    # +1 carry window
        self.sentinel = self.W * self.B
        self.mod = ctx.fctx.modulus
        self._msm = {}

    # -- batch inversion (device Fermat root) ---------------------------------
    def _batch_inv(self, d):
        """Montgomery product-tree inversion of (rows, n) nonzero values:
        ~3 muls per element + one single-block Fermat kernel on the root.
        The unwind runs both per-level muls in one fused launch.

        See module-level `batch_inv` (shared with ops/fixed_base.py)."""
        return batch_inv(self.pec, d, self.inv_floor)

    # -- one 4-ary reduction round --------------------------------------------
    def _pair_levels(self, parts, kseg, in_r, mn: int):
        """Two levels of batched affine pair addition over the 4 quad parts.
        parts: [(x, y, valid)] * 4.  Returns survivor (x, y, valid)."""
        lx = jnp.concatenate([parts[0][0], parts[2][0]], axis=1)
        ly = jnp.concatenate([parts[0][1], parts[2][1]], axis=1)
        lv = jnp.concatenate([parts[0][2], parts[2][2]])
        rx = jnp.concatenate([parts[1][0], parts[3][0]], axis=1)
        ry = jnp.concatenate([parts[1][1], parts[3][1]], axis=1)
        rv = jnp.concatenate([parts[1][2], parts[3][2]])
        d = self.pec.affine_denom(lx, ly, lv, rx, ry, rv)
        sx, sy, sv = self.pec.affine_add(lx, ly, lv, rx, ry, rv, self._batch_inv(d))
        ax, bx = sx[:, :mn], sx[:, mn:]
        ay, by = sy[:, :mn], sy[:, mn:]
        av, bv = sv[:mn], sv[mn:]
        d2 = self.pec.affine_denom(ax, ay, av, bx, by, bv)
        return self.pec.affine_add(ax, ay, av, bx, by, bv, self._batch_inv(d2))

    def _round(self, pk, ex, ey, mn: int):
        """One 4-ary reduction round on survivor arrays (rounds >= 2).
        pk: (m,) packed keys (key<<1 | valid); ex/ey: (rows, m).  One 1-D
        gather + two coordinate gathers per quad slot.  (A width-4 block
        gather over the contiguous hp..hp+3 slots via vmap(dynamic_slice)
        was measured 3.4x SLOWER end-to-end on TPU — XLA lowers the
        blocked form worse than four independent gathers; see PERF.md.)"""
        m = pk.shape[0]
        i = jnp.arange(m, dtype=I32)
        seg = pk >> 1
        seg_start = jnp.concatenate([jnp.ones(1, bool), seg[1:] != seg[:-1]])
        rank = i - _cummax(jnp.where(seg_start, i, 0))
        head = (rank & 3) == 0
        hp = jnp.argsort(jnp.where(head, 0, 1).astype(jnp.uint8),
                         stable=True)[:mn].astype(I32)
        kaug = seg << 3 | (rank.astype(U32) & 3) << 1 | (pk & 1)
        g0 = None
        parts = []
        for t in range(4):
            pos = jnp.minimum(hp + t, m - 1)
            g = kaug[pos]
            if t == 0:
                g0 = g
            ok = (hp + t < m) & (((g >> 1) & 3) == t)
            parts.append(
                (ex[:, pos], ey[:, pos], (ok & ((g & 1) != 0)).astype(U32))
            )
        # the segment id rides in the key word's high bits — no seg gather
        kseg = g0 >> 3
        in_r = ((g0 >> 1) & 3) == 0
        nx, ny, nv = self._pair_levels(parts, kseg, in_r, mn)
        npk = jnp.where(in_r, kseg * 2 + nv, jnp.uint32(2 * self.sentinel))
        return npk, nx, ny

    def _round1(self, spk, spay, txy, mn: int, n: int):
        """First reduction round: coordinates come straight from the point
        table via the sorted payload.

        Gather-minimized: rank-in-segment mod 4 decides quad membership
        (position hp+t belongs to quad j iff its rank ≡ t mod 4 — a new
        segment inside the quad resets rank below t), so payload, rank bits
        and validity pack into ONE word per entry:
            paug = point_index << 4 | sign << 3 | (rank & 3) << 1 | valid
        and each quad slot costs one 1-D gather plus one 32-row gather from
        the packed [x ; y | x ; -y] table."""
        m = spk.shape[0]
        i = jnp.arange(m, dtype=I32)
        seg = spk >> 1
        seg_start = jnp.concatenate([jnp.ones(1, bool), seg[1:] != seg[:-1]])
        rank = i - _cummax(jnp.where(seg_start, i, 0))
        head = (rank & 3) == 0
        hp = jnp.argsort(jnp.where(head, 0, 1).astype(jnp.uint8),
                         stable=True)[:mn].astype(I32)
        paug = (
            (spay >> 1) << 4
            | (spay & 1) << 3
            | (rank.astype(U32) & 3) << 1
            | (spk & 1)
        )
        kseg = seg[hp]
        g0 = None
        parts = []
        for t in range(4):
            pos = jnp.minimum(hp + t, m - 1)
            g = paug[pos]
            if t == 0:
                g0 = g
            ok = (hp + t < m) & (((g >> 1) & 3) == t)
            idx = (g >> 4).astype(I32) + ((g >> 3) & 1).astype(I32) * n
            xy = txy[:, idx]
            parts.append(
                (xy[: self.rows], xy[self.rows :], (ok & ((g & 1) != 0)).astype(U32))
            )
        in_r = ((g0 >> 1) & 3) == 0  # hp points at a real quad head
        nx, ny, nv = self._pair_levels(parts, kseg, in_r, mn)
        npk = jnp.where(in_r, kseg * 2 + nv, jnp.uint32(2 * self.sentinel))
        return npk, nx, ny

    # -- bucket aggregation -----------------------------------------------------
    def _scatter_dense(self, pk, ex, ey, fused: bool = False):
        """Survivors -> dense Jacobian bucket tables (R, W*B[p]) x3.
        The dense tables are an EC-additive representation: tables from
        different point shards combine with jadd (the sharded MSM
        all_gathers them — parallel/sharded_msm.py)."""
        W, B = self.W, self.B
        pec = self.pec
        WB = W * B
        ev = (pk & 1).astype(U32)
        keys = pk >> 1
        R = self.rows
        one = jnp.asarray(
            self.ctx.fctx.to_mont_host([self.ctx.fctx.host_one])[0]
        ).reshape(R).astype(U32)
        if fused:
            # scatter into the lane-padded layout the fused kernel reads
            # (window stride Bp, columns >= B zero = identity)
            Bp = pec.bucket_stride(B)
            kw = keys // B
            kb = keys - kw * B
            tgt = (kw * Bp + kb).astype(I32)
            idx = jnp.where(ev != 0, tgt, jnp.int32(W * Bp))
            WBp = W * Bp
        else:
            idx = jnp.where(ev != 0, keys.astype(I32), jnp.int32(WB))
            WBp = WB
        dx = jnp.zeros((R, WBp), U32).at[:, idx].set(ex, mode="drop")
        dy = jnp.zeros((R, WBp), U32).at[:, idx].set(ey, mode="drop")
        dv = jnp.zeros((1, WBp), U32).at[:, idx].set(ev[None, :], mode="drop")[0]
        dz = jnp.where(dv[None, :] != 0, one[:, None], jnp.uint32(0))
        return dx, dy, dz

    def _aggregate(self, pk, ex, ey):
        """Dense (W, B) table -> suffix sums -> bucket weighting -> window
        combine.  Returns one Jacobian point as (16,) planes x3."""
        import os

        # Fused aggregate measured SLOWER (279k vs 297k pts/s at 2^16): the
        # per-window sequential grid underutilizes the VPU vs overlapped
        # wide launches.  Kept opt-in for future re-evaluation (PERF.md).
        fused = os.environ.get("CRESCENT_MSM_FUSED_AGG", "0") == "1"
        dx, dy, dz = self._scatter_dense(pk, ex, ey, fused)
        return self._aggregate_dense(dx, dy, dz, fused)

    def _aggregate_dense(self, dx, dy, dz, fused: bool = False):
        W, B, c = self.W, self.B, self.c
        pec = self.pec
        WB = W * B
        R = self.rows

        if fused:
            # suffix sums + weight tree fused into ONE launch (grid over
            # windows, whole reduction in VMEM) — pec.bucket_reduce
            ax, ay, az = pec.bucket_reduce(dx, dy, dz, W, B)
        else:
            # per-window suffix sums: running_b = sum_{b'>=b} S_b' (shift-add)
            x3 = lambda a: a.reshape(R, W, B)
            rx_, ry_, rz_ = dx, dy, dz
            j = 1
            while j < B:
                def shift(a):
                    a = x3(a)
                    a = jnp.concatenate(
                        [a[:, :, j:], jnp.zeros((R, W, j), U32)], axis=2
                    )
                    return a.reshape(R, WB)
                rx_, ry_, rz_ = pec.jadd(rx_, ry_, rz_, shift(rx_), shift(ry_), shift(rz_))
                j *= 2

            # acc_w = sum_{d=1}^{B-1} running_d (B-1 = 2^(c-1), power of two)
            ax = x3(rx_)[:, :, 1:]
            ay = x3(ry_)[:, :, 1:]
            az = x3(rz_)[:, :, 1:]
            n = B - 1
            while n > 1:
                h = n // 2
                ax, ay, az = pec.jadd(
                    ax[:, :, :h].reshape(R, W * h),
                    ay[:, :, :h].reshape(R, W * h),
                    az[:, :, :h].reshape(R, W * h),
                    ax[:, :, h:].reshape(R, W * h),
                    ay[:, :, h:].reshape(R, W * h),
                    az[:, :, h:].reshape(R, W * h),
                )
                ax, ay, az = (a.reshape(R, W, h) for a in (ax, ay, az))
                n = h

        # window combine: result = sum_w acc_w * 2^(c*w) by a doubling tree:
        # level j pairs (2t, 2t+1) with the odd half doubled c*2^j times
        # (identity-padded up to a power of two).
        Wp = 1 << (W - 1).bit_length()
        ax = jnp.pad(ax.reshape(R, W), ((0, 0), (0, Wp - W)))
        ay = jnp.pad(ay.reshape(R, W), ((0, 0), (0, Wp - W)))
        az = jnp.pad(az.reshape(R, W), ((0, 0), (0, Wp - W)))
        shift = c
        while Wp > 1:
            h = Wp // 2
            hx, hy, hz = pec.jdbl_n(
                ax[:, 1::2], ay[:, 1::2], az[:, 1::2], count=shift
            )
            ax, ay, az = pec.jadd(ax[:, 0::2], ay[:, 0::2], az[:, 0::2], hx, hy, hz)
            shift *= 2
            Wp = h
        return ax[:, 0], ay[:, 0], az[:, 0]

    # -- full program -----------------------------------------------------------
    def _round_schedule(self, n: int) -> list[int]:
        """Static survivor-count schedule for an n-point problem."""
        W, B = self.W, self.B
        m0 = n * W
        # static size schedule: survivors <= m/4 + 3/4 * (#segments + 1)
        slack = (3 * (W * B + 2)) // 4 + 64
        rounds = []
        m = m0
        max_seg = m0
        while max_seg > 1:
            # clamp: the gather-compaction slices argsort(~head)[:mn],
            # so a round may not grow (tiny-N worst-case schedules)
            m = min(quantize(m // 4 + slack, self.min_bucket), m)
            rounds.append(m)
            max_seg = -(-max_seg // 4)
        return rounds

    def _survivors(self, px, py, pvalid, scalars, n: int):
        """Traceable phases 1-2: recode, sort, 4-ary reduction rounds.
        Returns (pk, ex, ey) survivor arrays — feed to _aggregate (single
        device) or _scatter_dense (sharded combine)."""
        W, B, sentinel = self.W, self.B, self.sentinel
        ctx = self.ctx
        # digit recoding INSIDE the program: the generic-c bit
        # extraction is ~270 tiny ops — eager dispatch of those
        # over the device tunnel cost 2x the whole MSM.
        from .msm import scalar_digits_signed

        digits, signs = scalar_digits_signed(scalars, self.c)
        # -y through the field adapter's element layout (Fp: (16,);
        # Fq2: (2, 16)), then back to flat (rows,) planes
        esh = ctx.fctx.elem_shape
        neg_py = ctx.fctx.neg_mod(py.reshape((n,) + esh)).reshape(
            n, self.rows
        )
        xt = px.T
        txy = jnp.concatenate(
            [
                jnp.concatenate([xt, xt], axis=1),
                jnp.concatenate([py.T, neg_py.T], axis=1),
            ],
            axis=0,
        )  # (2*rows, 2n): column j -> (x, y); column n+j -> (x, -y)
        valid = (digits != 0) & (pvalid[:, None] != 0)
        keys = jnp.where(
            valid,
            jnp.arange(W, dtype=U32)[None, :] * B + digits,
            jnp.uint32(sentinel),
        )
        pk = keys * 2 + valid.astype(U32)
        pay = (
            jnp.broadcast_to(
                jnp.arange(n, dtype=U32)[:, None] << 1, (n, W)
            )
            | signs
        )
        spk, spay = jax.lax.sort(
            (pk.reshape(-1), pay.reshape(-1)), num_keys=1
        )
        ex = ey = None
        for i, mn in enumerate(self._round_schedule(n)):
            if i == 0:
                spk, ex, ey = self._round1(spk, spay, txy, mn, n)
            else:
                spk, ex, ey = self._round(spk, ex, ey, mn)
        return spk, ex, ey

    def _get_msm(self, n: int):
        if n not in self._msm:

            @jax.jit
            def msm(px, py, pvalid, scalars):
                return self._aggregate(*self._survivors(px, py, pvalid, scalars, n))

            self._msm[n] = msm
        return self._msm[n]

    def run(self, px, py, pvalid, scalars) -> JPoints:
        """px/py: (N, *elem_shape) Montgomery affine — (N, 16) for Fp,
        (N, 2, 16) for Fq2 (flattened internally to (N, rows) planes);
        pvalid: (N,) 0/1; scalars: (N, 16) standard-form limbs.
        Returns one Jacobian point with (rows,)-plane coordinates."""
        n = px.shape[0]
        px = px.reshape(n, self.rows)
        py = py.reshape(n, self.rows)
        nq = quantize(n, self.min_bucket)
        if nq != n:
            pad = [(0, nq - n)]
            px = jnp.pad(px, pad + [(0, 0)])
            py = jnp.pad(py, pad + [(0, 0)])
            pvalid = jnp.pad(pvalid, pad)
            scalars = jnp.pad(scalars, pad + [(0, 0)])
        x, y, z = self._get_msm(nq)(px, py, pvalid, scalars)
        esh = self.ctx.fctx.elem_shape  # back to the ctx element layout
        return JPoints(x.reshape(esh), y.reshape(esh), z.reshape(esh))
