"""Multi-scalar multiplication (Pippenger) on TPU.

The single hottest op in the whole framework: Groth16 prove is 4 big MSMs,
KZG commit/open is an MSM, Pedersen commitments are small MSMs
(SURVEY.md §2c, BASELINE.json "MSM points/s/chip").

TPU-shaped Pippenger (no scatter-unfriendly inner loops):
  * window width ``c`` bits => W = ceil(256/c) windows, B = 2^c buckets each.
  * Phase 1 (accumulate): L parallel lanes; a `lax.scan` of N/L steps where
    each step gathers the (lane, window)-addressed buckets, performs ONE
    batched mixed point-add of shape (L, W), and scatters back.  All windows
    of a point are processed in the same step, so each point is loaded once.
  * Phase 2: tree-reduce the L lane-local bucket sets (log L batched adds of
    shape (W, B)).
  * Phase 3: per-window suffix running-sum over buckets (B sequential steps,
    batched over W windows): sum_b b*bucket_b.
  * Phase 4: Horner combine across windows (c doublings + 1 add per window).

Multi-chip: phase 1 shards over the point axis (pure data parallel), phase 2's
tree reduction becomes a `psum`-style collective of bucket sets — see
crescent_tpu.parallel.sharded_msm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.curves import Curve
from . import limb
from .ec import CurveCtx, JPoints, get_curve_ctx
from .limb import LIMB_BITS, NLIMB, U32
from .pallas_ec import get_pallas_ec

# Tri-state override for the fused limb-major Pallas accumulate path:
# None = auto (TPU backend + prime field only, unless CRESCENT_MSM_PALLAS=0),
# True/False = force.
USE_PALLAS: bool | None = None


def _pallas_for(ctx: CurveCtx):
    """PallasEC instance if the fused path applies to this curve, else None."""
    import os

    enabled = USE_PALLAS
    if enabled is None:
        enabled = (
            jax.default_backend() == "tpu"
            and os.environ.get("CRESCENT_MSM_PALLAS", "1") != "0"
        )
    if not enabled:
        return None
    if hasattr(ctx.fctx, "base"):  # QuadCtx (G2/Fq2): fused _F2 kernels
        from .pallas_ec import get_quad_pallas_ec

        if not ctx.a_is_zero:
            return None
        return get_quad_pallas_ec(ctx.fctx.modulus)
    return get_pallas_ec(ctx.fctx.modulus, ctx.a_host % ctx.fctx.modulus)


def scalar_digits(scalars: jax.Array, c: int) -> jax.Array:
    """(N, 16) 16-bit limbs -> (N, W) c-bit unsigned window digits.

    c must divide LIMB_BITS or be a multiple of it for a pure reshape; the
    general path extracts bits (still vectorized).
    """
    N = scalars.shape[0]
    nbits = NLIMB * LIMB_BITS
    W = (nbits + c - 1) // c
    if LIMB_BITS % c == 0:
        per = LIMB_BITS // c
        parts = [(scalars >> (c * i)) & ((1 << c) - 1) for i in range(per)]
        # interleave: limb j gives digits j*per + i
        stacked = jnp.stack(parts, axis=-1)          # (N, 16, per)
        return stacked.reshape(N, W)
    # generic bit gather
    bits = []
    for i in range(nbits):
        bits.append((scalars[:, i // LIMB_BITS] >> (i % LIMB_BITS)) & 1)
    bits = jnp.stack(bits, axis=-1)                   # (N, 256)
    pad = W * c - nbits
    bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(N, W, c)
    weights = (1 << jnp.arange(c, dtype=U32))
    return jnp.sum(bits * weights, axis=-1)


def scalar_digits_signed(scalars: jax.Array, c: int) -> tuple[jax.Array, jax.Array]:
    """(N, 16) limbs -> signed-digit recoding: (|digit| (N, W+1), sign (N, W+1)).

    Windows are remapped to the balanced range [-(2^(c-1)-1), 2^(c-1)] via a
    carry chain, so only 2^(c-1)+1 buckets are needed (halving phase-2/3 work;
    PERF.md item 3) and negative digits add the negated point (-Y is one
    sub_mod).  One extra window absorbs the final carry for full-width
    scalars.  sign is 0/1 (1 => subtract)."""
    half = 1 << (c - 1)
    full = 1 << c
    d = scalar_digits(scalars, c)                     # (N, W) unsigned
    W = d.shape[1]
    digs, signs = [], []
    carry = jnp.zeros(d.shape[0], dtype=U32)
    for w in range(W):
        e = d[:, w] + carry                           # <= 2^c
        neg = (e > half).astype(U32)
        digs.append(jnp.where(neg, full - e, e))
        signs.append(neg)
        carry = neg
    digs.append(carry)                                # top carry window
    signs.append(jnp.zeros_like(carry))
    return jnp.stack(digs, axis=-1), jnp.stack(signs, axis=-1)


# eager per-bit extraction is ~270 dispatches for generic c; always jit it
digits_signed_jit = jax.jit(scalar_digits_signed, static_argnums=1)


def _accumulate_buckets(ctx: CurveCtx, px, py, pvalid, digits, signs, c: int, lanes: int) -> JPoints:
    """Pippenger phases 1-2: accumulate points into per-window buckets and
    fold lanes.  digits/signs from `scalar_digits_signed` (balanced
    recoding => B = 2^(c-1)+1 buckets).  Returns a (W, B) JPoints bucket
    set whose bucket b holds the sum of points with |digit| == b."""
    N = px.shape[0]
    W = digits.shape[1]
    B = (1 << (c - 1)) + 1
    L = min(lanes, N)
    steps = (N + L - 1) // L
    Npad = steps * L

    def padpts(a, fill):
        return jnp.pad(a, [(0, Npad - N)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)

    px = padpts(px, 0)
    py = padpts(py, 0)
    pvalid = padpts(pvalid, 0)
    digits = padpts(digits, 0)
    signs = padpts(signs, 0)

    # reshape to (steps, L, *elem)
    es = ctx.fctx.elem_shape
    px = px.reshape((steps, L) + es)
    py = py.reshape((steps, L) + es)
    pvalid = pvalid.reshape(steps, L)
    digits = digits.reshape(steps, L, W)
    signs = signs.reshape(steps, L, W)

    # lane-local buckets: (L, W, B) points
    buckets = ctx.identity((L, W, B))

    lane_idx = jnp.broadcast_to(jnp.arange(L)[:, None], (L, W))
    win_idx = jnp.broadcast_to(jnp.arange(W)[None, :], (L, W))

    def step(buckets, inp):
        sx, sy, sval, sdig, ssgn = inp     # (L,16),(L,16),(L,),(L,W),(L,W)
        cur = JPoints(
            buckets.x[lane_idx, win_idx, sdig],
            buckets.y[lane_idx, win_idx, sdig],
            buckets.z[lane_idx, win_idx, sdig],
        )                                   # (L, W, 16)
        syn = ctx.fctx.neg_mod(sy)          # one negate per point, all windows share
        qx = jnp.broadcast_to(jnp.expand_dims(sx, 1), (L, W) + es)
        qy = ctx.fctx.select(
            ssgn,
            jnp.broadcast_to(jnp.expand_dims(syn, 1), (L, W) + es),
            jnp.broadcast_to(jnp.expand_dims(sy, 1), (L, W) + es),
        )
        # skip digit-0 (bucket 0 unused) and invalid (padded/infinity) points
        valid = (sdig != 0) & (sval[:, None] != 0)
        new = ctx.add_mixed(cur, qx, qy, valid.astype(U32))
        buckets = JPoints(
            buckets.x.at[lane_idx, win_idx, sdig].set(new.x),
            buckets.y.at[lane_idx, win_idx, sdig].set(new.y),
            buckets.z.at[lane_idx, win_idx, sdig].set(new.z),
        )
        return buckets, None

    buckets, _ = jax.lax.scan(step, buckets, (px, py, pvalid, digits, signs))

    # Phase 2: fold lanes into one (W, B) bucket set.  A lax.scan (L steps of
    # one batched add) keeps the compiled graph at a single add body; the
    # log-tree variant compiled log2(L) distinct shapes and dominated
    # compile time on XLA.
    def fold(acc, lane):
        return ctx.add(acc, lane), None

    wb, _ = jax.lax.scan(fold, ctx.identity((W, B)), buckets)
    return wb


def _aggregate_buckets(ctx: CurveCtx, wb: JPoints, c: int) -> JPoints:
    """Pippenger phases 3-4: per-window suffix sums + Horner window combine.
    wb: (W, B) bucket set -> single Jacobian point."""
    W, B = wb.x.shape[0], wb.x.shape[1]

    # Phase 3: suffix running sums per window.
    #   running_d = sum_{b>=d} bucket_b ; acc = sum_{d>=1} running_d = sum b*bucket_b
    def phase3(carry, d):
        running, acc = carry
        idx = B - 1 - d
        bkt = JPoints(wb.x[:, idx], wb.y[:, idx], wb.z[:, idx])  # (W, 16)
        running = ctx.add(running, bkt)
        acc = ctx.add(acc, running)
        return (running, acc), None

    run0 = ctx.identity((W,))
    acc0 = ctx.identity((W,))
    (_, acc), _ = jax.lax.scan(phase3, (run0, acc0), jnp.arange(B - 1))

    # Phase 4: Horner over windows, top first: res = 2^c * res + acc[w].
    # (Doubling the identity is identity, so the first iteration needs no
    # special case; scan keeps the compiled graph at one double+add body.)
    def phase4(res, w):
        idx = W - 1 - w
        res = jax.lax.fori_loop(0, c, lambda _, r: ctx.double(r), res)
        res = ctx.add(res, JPoints(acc.x[idx], acc.y[idx], acc.z[idx]))
        return res, None

    res, _ = jax.lax.scan(phase4, ctx.identity(()), jnp.arange(W))
    return res


def _accumulate_buckets_pallas(
    ctx: CurveCtx, pec, px, py, pvalid, digits, signs, c: int, lanes: int
) -> JPoints:
    """Pippenger phases 1-2 with the fused limb-major Pallas point kernels
    (PERF.md item 1).  Buckets live limb-major (16, L, W, B) the whole time:
    the digit gather yields contiguous (16, L, W) planes that reshape for
    free into the kernel's (16, n) layout — no per-step transposes — and the
    per-step case analysis + ~26 Montgomery muls run in one VMEM-resident
    kernel instead of ~60 HBM-materialized XLA intermediates."""
    N = px.shape[0]
    W = digits.shape[1]
    B = (1 << (c - 1)) + 1
    L = min(lanes, N)
    steps = (N + L - 1) // L
    Npad = steps * L

    def padpts(a):
        return jnp.pad(a, [(0, Npad - N)] + [(0, 0)] * (a.ndim - 1))

    # points limb-major once: (steps, 16, L)
    px = padpts(px).reshape(steps, L, NLIMB).transpose(0, 2, 1)
    py = padpts(py).reshape(steps, L, NLIMB).transpose(0, 2, 1)
    pvalid = padpts(pvalid).reshape(steps, L)
    digits = padpts(digits).reshape(steps, L, W)
    signs = padpts(signs).reshape(steps, L, W)

    ident = ctx.identity((L, W, B))
    buckets = tuple(a.transpose(3, 0, 1, 2) for a in ident)  # (16, L, W, B) x3

    li = jnp.broadcast_to(jnp.arange(L)[:, None], (L, W))
    wi = jnp.broadcast_to(jnp.arange(W)[None, :], (L, W))

    def step(buckets, inp):
        bx, by, bz = buckets
        sx, sy, sval, sdig, ssgn = inp  # (16,L),(16,L),(L,),(L,W),(L,W)
        cur = [a[:, li, wi, sdig].reshape(NLIMB, L * W) for a in (bx, by, bz)]
        qx = jnp.broadcast_to(sx[:, :, None], (NLIMB, L, W)).reshape(NLIMB, L * W)
        qy = jnp.broadcast_to(sy[:, :, None], (NLIMB, L, W)).reshape(NLIMB, L * W)
        valid = ((sdig != 0) & (sval[:, None] != 0)).reshape(L * W)
        nx, ny, nz = pec.madd(*cur, qx, qy, valid, ssgn.reshape(L * W))
        out = []
        for b, v in ((bx, nx), (by, ny), (bz, nz)):
            out.append(b.at[:, li, wi, sdig].set(v.reshape(NLIMB, L, W)))
        return tuple(out), None

    buckets, _ = jax.lax.scan(step, buckets, (px, py, pvalid, digits, signs))

    # Phase 2: fold lanes.  Scan over the lane axis with the fused jadd.
    def fold(acc, lane):
        lx, ly, lz = (a.reshape(NLIMB, W * B) for a in lane)
        return tuple(pec.jadd(*acc, lx, ly, lz)), None

    # identity planes: x=0, y=mont(1), z=0
    id1 = ctx.identity((W * B,))
    acc0 = (id1.x.T, id1.y.T, id1.z.T)
    lanes_xs = tuple(a.transpose(1, 0, 2, 3) for a in buckets)  # (L, 16, W, B)
    (fx, fy, fz), _ = jax.lax.scan(fold, acc0, lanes_xs)
    return JPoints(
        fx.T.reshape(W, B, NLIMB), fy.T.reshape(W, B, NLIMB), fz.T.reshape(W, B, NLIMB)
    )


def _msm_impl(ctx: CurveCtx, px, py, pvalid, digits, signs, c: int, lanes: int) -> JPoints:
    """Core Pippenger given precomputed signed digits. All args device arrays."""
    pec = _pallas_for(ctx)
    # The fused accumulate's reshapes assume base-field (ROWS == NLIMB)
    # point planes; the quad (Fq2/G2) pec only powers the AffineMSM route,
    # so G2 scan-path calls fall through to the XLA accumulator (ADVICE r4).
    if pec is not None and getattr(pec, "ROWS", None) == NLIMB:
        wb = _accumulate_buckets_pallas(ctx, pec, px, py, pvalid, digits, signs, c, lanes)
    else:
        wb = _accumulate_buckets(ctx, px, py, pvalid, digits, signs, c, lanes)
    return _aggregate_buckets(ctx, wb, c)


def _small_msm_impl(ctx: CurveCtx, px, py, pvalid, k_limbs) -> JPoints:
    """Direct path for small N: batched double-and-add then a scan-fold.
    Pippenger's bucket machinery costs >= W * 2^c point-adds regardless of N,
    so below ~1k points this is both faster and a much smaller program."""
    one = ctx.fctx.broadcast_elem(
        jnp.asarray(ctx.fctx.to_mont_host([ctx.fctx.host_one])[0]), pvalid.shape
    )
    z = ctx.fctx.select(pvalid, one, jnp.zeros_like(one))
    prods = ctx.scalar_mul(k_limbs, JPoints(px, py, z))

    def fold(acc, p):
        return ctx.add(acc, JPoints(*p)), None

    acc, _ = jax.lax.scan(fold, ctx.identity(()), tuple(prods))
    return acc


class MSM:
    """MSM executor for one curve context; jit-cached per shape bucket.

    Large prime-field MSMs on TPU route to the sorted-segment batched-affine
    accumulator (ops/msm_affine.py, ~7 muls per entry); the scan-based
    Pippenger below remains for G2 (Fq2), CPU runs, and as the
    CRESCENT_MSM_AFFINE=0 fallback.

    `lanes` caps scan-phase-1 parallelism; the actual lane count adapts to
    N/2^c so the lane-fold (L*W*2^c point-adds) never dominates the
    accumulation work (N*W adds).
    """

    def __init__(self, curve, c: int = 8, lanes: int = 256, small_cutoff: int = 1024,
                 affine_c: int = 11, max_chunk: int = 1 << 17):
        import os

        self.ctx = curve if isinstance(curve, CurveCtx) else get_curve_ctx(curve)
        self.c = c
        self.lanes = lanes
        self.small_cutoff = small_cutoff
        self.affine_c = affine_c
        # QAP-scale MSMs run as a fold over fixed-shape chunks.  2^17 is the
        # largest program the axon tunnel compiles reliably (2^16: 15 min,
        # 2^17: 11 min, 2^19: compile RPC hangs indefinitely — reproduced
        # twice); per-chunk throughput is flat (~210k pts/s) so fewer,
        # bigger chunks just shave dispatch overhead.  Override with
        # CRESCENT_MSM_CHUNK.
        self.max_chunk = int(os.environ.get("CRESCENT_MSM_CHUNK", str(max_chunk)))
        self._impls: dict = {}
        self._affine = None
        self._small = jax.jit(functools.partial(_small_msm_impl, self.ctx))
        self._small_many = jax.jit(jax.vmap(functools.partial(_small_msm_impl, self.ctx)))

    def _affine_msm(self):
        """AffineMSM instance if the segmented-affine path applies, else None."""
        import os

        if os.environ.get("CRESCENT_MSM_AFFINE", "1") == "0":
            return None
        pec = _pallas_for(self.ctx)
        if pec is None:
            return None
        if self._affine is None:
            from .msm_affine import AffineMSM

            self._affine = AffineMSM(self.ctx, pec, c=self.affine_c)
        return self._affine

    def _lanes_for(self, n: int) -> int:
        return max(1, min(self.lanes, n >> self.c))

    def _get_impl(self, lanes: int, many: bool):
        key = (lanes, many)
        if key not in self._impls:
            fn = functools.partial(_msm_impl, self.ctx, c=self.c, lanes=lanes)
            self._impls[key] = jax.jit(jax.vmap(fn) if many else fn)
        return self._impls[key]

    @staticmethod
    def _pad_to(npad, px, py, pvalid, scalars):
        n = px.shape[0]
        if npad != n:
            pad = [(0, npad - n)]
            px = jnp.pad(px, pad + [(0, 0)] * (px.ndim - 1))
            py = jnp.pad(py, pad + [(0, 0)] * (py.ndim - 1))
            pvalid = jnp.pad(pvalid, pad)
            scalars = jnp.pad(scalars, pad + [(0, 0)])
        return px, py, pvalid, scalars

    # -- device API ---------------------------------------------------------
    def run_device(self, px, py, pvalid, scalars) -> JPoints:
        """px/py: (N, *elem) Montgomery affine; pvalid: (N,) 0/1;
        scalars: (N,16) standard-form limbs. Returns a single Jacobian point.

        N is padded up to a power of two (with invalid lanes) so nearby sizes
        share one compiled executable."""
        n = px.shape[0]
        npad = 1 << (n - 1).bit_length() if n > 1 else 1
        px, py, pvalid, scalars = self._pad_to(npad, px, py, pvalid, scalars)
        if npad <= self.small_cutoff:
            return self._small(px, py, pvalid, scalars)
        am = self._affine_msm()
        if am is not None:
            if npad > self.max_chunk:
                # QAP-scale inputs: chunk to bound HBM footprint and compile
                # time (one compiled program per chunk shape), then fold the
                # per-chunk Jacobian results with log2(chunks) batched adds
                ck = self.max_chunk
                parts = [
                    am.run(px[i : i + ck], py[i : i + ck],
                           pvalid[i : i + ck], scalars[i : i + ck])
                    for i in range(0, npad, ck)
                ]
                acc = JPoints(
                    jnp.stack([p.x for p in parts]),
                    jnp.stack([p.y for p in parts]),
                    jnp.stack([p.z for p in parts]),
                )
                while acc.x.shape[0] > 1:
                    h = acc.x.shape[0] // 2
                    top = JPoints(acc.x[h : 2 * h], acc.y[h : 2 * h], acc.z[h : 2 * h])
                    rest = JPoints(acc.x[2 * h :], acc.y[2 * h :], acc.z[2 * h :])
                    lo = self.ctx.add(
                        JPoints(acc.x[:h], acc.y[:h], acc.z[:h]), top
                    )
                    acc = JPoints(
                        jnp.concatenate([lo.x, rest.x]),
                        jnp.concatenate([lo.y, rest.y]),
                        jnp.concatenate([lo.z, rest.z]),
                    )
                return JPoints(acc.x[0], acc.y[0], acc.z[0])
            return am.run(px, py, pvalid, scalars)
        digits, signs = digits_signed_jit(scalars, self.c)
        return self._get_impl(self._lanes_for(npad), many=False)(px, py, pvalid, digits, signs)

    def run_device_many(self, problems) -> JPoints:
        """Batch of independent MSMs in ONE compiled program (vmap over the
        problem axis).  problems: list of (px, py, pvalid, scalars); each is
        padded to a common power-of-two N.  Returns JPoints with leading axis
        len(problems)."""
        nmax = max(p[0].shape[0] for p in problems)
        npad = 1 << (nmax - 1).bit_length() if nmax > 1 else 1
        padded = [self._pad_to(npad, *p) for p in problems]
        stack = [jnp.stack(arrs) for arrs in zip(*padded)]
        if npad <= self.small_cutoff:
            return self._small_many(*stack)
        am = self._affine_msm()
        if am is not None:
            # host-loop rounds don't vmap; run sequentially (few big problems)
            outs = [self.run_device(*p) for p in padded]
            return JPoints(*(jnp.stack(a) for a in zip(*outs)))
        pxs, pys, vals, scs = stack
        digs, sgns = digits_signed_jit(scs.reshape((-1,) + scs.shape[2:]), self.c)
        digs = digs.reshape(scs.shape[0], npad, -1)
        sgns = sgns.reshape(scs.shape[0], npad, -1)
        return self._get_impl(self._lanes_for(npad), many=True)(pxs, pys, vals, digs, sgns)

    def _get_fold(self, nchunks: int, ck: int, nprob: int):
        """One jitted program running `nchunks` fixed-shape chunk MSMs via
        lax.scan and accumulating each into its problem's Jacobian slot."""
        key = ("fold", nchunks, ck, nprob)
        if key not in self._impls:
            am = self._affine_msm()
            prog = am._get_msm(ck)
            ctx = self.ctx

            @jax.jit
            def fold(PX, PY, PV, SC, pid):
                def body(acc, inp):
                    x, y, v, s, j = inp
                    rx, ry, rz = prog(x, y, v, s)
                    cur = JPoints(acc.x[j], acc.y[j], acc.z[j])
                    new = ctx.add(cur, JPoints(rx, ry, rz))
                    return (
                        JPoints(
                            acc.x.at[j].set(new.x),
                            acc.y.at[j].set(new.y),
                            acc.z.at[j].set(new.z),
                        ),
                        None,
                    )

                acc, _ = jax.lax.scan(
                    body, ctx.identity((nprob,)), (PX, PY, PV, SC, pid)
                )
                return acc

            self._impls[key] = fold
        return self._impls[key]

    def run_device_fold(self, problems):
        """Run several QAP-scale MSMs as ONE compiled chunk-scan program.

        The per-chunk Python loop in `run_device` costs one tunnel dispatch
        per chunk plus eager slicing ops; at rs256@2048 scale that is ~220
        dispatches whose round-trip latency dwarfs the field work (PERF.md
        round 3: 343-956 s for ~35 s of kernel time).  Here every chunk of
        every problem runs inside a single lax.scan, so the whole G1 MSM
        phase is one dispatch.

        problems: list of (px, py, pvalid, scalars) device arrays (shapes
        (N_i, ...)); returns a list of Jacobian JPoints, one per problem.
        Returns None when the affine path does not apply (caller falls back).
        """
        am = self._affine_msm()
        if am is None:
            return None
        ck = self.max_chunk
        xs, ys, vs, ss, pid = [], [], [], [], []
        for j, (px, py, pvalid, sc) in enumerate(problems):
            n = px.shape[0]
            nc = max(1, -(-n // ck))
            npad = nc * ck
            px, py, pvalid, sc = self._pad_to(npad, px, py, pvalid, sc)
            xs.append(px.reshape((nc, ck) + px.shape[1:]))
            ys.append(py.reshape((nc, ck) + py.shape[1:]))
            vs.append(pvalid.reshape(nc, ck))
            ss.append(sc.reshape((nc, ck) + sc.shape[1:]))
            pid += [j] * nc
        PX = jnp.concatenate(xs)
        PY = jnp.concatenate(ys)
        PV = jnp.concatenate(vs)
        SC = jnp.concatenate(ss)
        pidj = jnp.asarray(pid, dtype=jnp.int32)
        acc = self._get_fold(len(pid), ck, len(problems))(PX, PY, PV, SC, pidj)
        return [
            JPoints(acc.x[j], acc.y[j], acc.z[j]) for j in range(len(problems))
        ]

    # -- host convenience ---------------------------------------------------
    def run_host(self, scalars: list[int], points: list):
        """Host scalars/affine points -> host affine result (any curve ctx)."""
        from ..utils.pointvec import ArrayPointVec

        P = self.ctx.points_to_device(points)
        if isinstance(points, ArrayPointVec):
            valid = jnp.asarray((~points.inf).astype(np.uint32))
        else:
            valid = jnp.asarray(
                [0 if p is None else 1 for p in points], dtype=U32
            )
        sc = jnp.asarray(limb.ints_to_limbs([s % self.ctx.n for s in scalars]))
        res = self.run_device(P.x, P.y, valid, sc)
        return self.ctx.points_to_host(
            JPoints(res.x[None], res.y[None], res.z[None])
        )[0]


@functools.lru_cache(maxsize=None)
def get_msm(curve: Curve, c: int = 8, lanes: int = 128) -> MSM:
    return MSM(curve, c, lanes)


@functools.lru_cache(maxsize=None)
def get_g2_msm(c: int = 8, lanes: int = 64) -> MSM:
    from .ec import get_g2_ctx

    return MSM(get_g2_ctx(), c, lanes)
