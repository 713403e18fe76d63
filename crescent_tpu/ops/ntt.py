"""Number-theoretic transform over BN254 Fr (and any NTT-friendly ModCtx).

Backs the QAP witness map (Groth16 prover's h-polynomial, reference
forks/groth16/src/r1cs_to_qap.rs) and the KZG range-proof polynomial ops
(creds/src/rangeproof.rs:167).  BASELINE.json's second headline metric is
"NTT butterflies/s/chip".

TPU shape: iterative Cooley–Tukey with one bit-reversal gather up front and
log2(N) butterfly stages, each stage a pure reshape + batched Montgomery
multiply (no gathers inside the loop).  Twiddles are precomputed per stage on
host and indexed as compile-time constants.  Multi-chip NTT (all-to-all
butterfly exchange) lives in crescent_tpu.parallel.sharded_ntt.

Evaluation-domain semantics match arkworks Radix2EvaluationDomain: natural
order in/out, `ifft = (1/N) * ntt with w^-1`, coset ops scale by g^i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limb
from .limb import NLIMB, ModCtx


def elemwise_mont_mul(ctx: ModCtx, x: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise Montgomery multiply of (n, 16) batch-major planes.

    On TPU this routes through the fused limb-major pallas kernel: the
    batch-major XLA formulation streams the Montgomery routing-matmul
    scratch — (n, 512) f32, ~4 GB at 2^21 — through HBM per multiply."""
    import os

    env = os.environ.get("CRESCENT_NTT_PALLAS")
    use_pallas = env != "0" if env is not None else jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas_ec import get_pallas_ec

        pec = get_pallas_ec(ctx.modulus, 0)
        return pec.mul(x.T, y.T).T
    return ctx.mont_mul(x, y)


def transform_limb_major(ctx: ModCtx, x: jax.Array, perm: jax.Array,
                         tws: tuple, n_inv_mont) -> jax.Array:
    """Radix-2 NTT over (n, 16) Montgomery planes with the fused pallas
    butterflies, with the permutation/twiddle tables passed EXPLICITLY.

    Callers building big fused programs must pass the tables as jit
    arguments, not closures: captured device arrays embed as HLO constants,
    and at QAP scale (2^21: ~500 MB across fwd+inv+coset tables) the
    serialized program exceeds the axon tunnel's remote-compile body limit
    (HTTP 413 — observed round 4).  n_inv_mont = None for the forward
    transform, the (16,) Montgomery 1/n for the inverse."""
    from .pallas_ec import get_pallas_ec

    pec = get_pallas_ec(ctx.modulus, 0)
    n = x.shape[0]
    logn = n.bit_length() - 1
    assert len(tws) == logn
    x = jnp.take(x, perm, axis=0).T  # (16, n) limb-major
    for s in range(logn):
        half = 1 << s
        blocks = n // (2 * half)
        v = x.reshape(NLIMB, blocks, 2, half)
        a = v[:, :, 0, :].reshape(NLIMB, n // 2)
        b = v[:, :, 1, :].reshape(NLIMB, n // 2)
        twp = jnp.tile(tws[s].T, (1, blocks)) if half > 1 else jnp.broadcast_to(
            tws[s].T, (NLIMB, n // 2)
        )
        # column blk*half + j needs twiddle j — jnp.tile repeats the
        # (16, half) plane blocks times along the minor axis, giving
        # exactly that layout
        o0, o1 = pec.butterfly(a, b, twp)
        x = jnp.stack(
            [o0.reshape(NLIMB, blocks, half), o1.reshape(NLIMB, blocks, half)],
            axis=2,
        ).reshape(NLIMB, n)
    if n_inv_mont is not None:
        x = pec.mul(x, jnp.broadcast_to(n_inv_mont[:, None], (NLIMB, n)))
    return x.T


def bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NTTDomain:
    """Radix-2 evaluation domain of size N=2^k over a ModCtx field."""

    def __init__(self, ctx: ModCtx, n: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        p = ctx.modulus
        assert (p - 1) % n == 0, "field lacks required 2-adicity"
        self.ctx = ctx
        self.n = n
        self.logn = n.bit_length() - 1

        # host: primitive n-th root (from the field's 2-adic root tower)
        from ..core.fields import PrimeField

        f = PrimeField(p)
        self.w = f.root_of_unity(n) if n > 1 else 1
        self.w_inv = pow(self.w, -1, p) if n > 1 else 1
        self.n_inv = pow(n, -1, p)
        self.group_gen = self.w

        # per-stage twiddles in Montgomery form: stage s has half=2^s,
        # twiddles w^(j * n / 2^(s+1)) for j in [0, 2^s)
        def _native_powers():
            try:
                from ..native import backend as nb

                return nb.powers if nb.available() else None
            except Exception:
                return None

        npow = _native_powers() if n >= (1 << 12) else None

        def stage_twiddles(root):
            if npow is not None:
                # native geometric series per stage + ONE device Montgomery
                # conversion over the concatenated (n-1, 16) plane: the
                # per-element Python pow() path below costs ~90 s at 2^21
                # (2M 254-bit exponentiations, measured round 5)
                parts = [
                    npow(p, pow(root, n >> (s + 1), p), 1, 1 << s)
                    for s in range(self.logn)
                ]
                allv = np.concatenate(parts, axis=0)
                mont = ctx.to_mont(limb.upload_limbs(limb.u64_to_limbs(allv)))
                tw, off = [], 0
                for s in range(self.logn):
                    half = 1 << s
                    tw.append(mont[off : off + half])
                    off += half
                return tw
            tw = []
            for s in range(self.logn):
                half = 1 << s
                step = n // (2 * half)
                vals = [pow(root, j * step, p) for j in range(half)]
                tw.append(jnp.asarray(ctx.to_mont_host(vals)))
            return tw

        self.tw_fwd = stage_twiddles(self.w)
        self.tw_inv = stage_twiddles(self.w_inv)
        self.perm = jnp.asarray(bit_reverse_perm(n))
        self.n_inv_mont = jnp.asarray(ctx.to_mont_host([self.n_inv])[0])

        self._fwd = jax.jit(functools.partial(self._transform, inverse=False))
        self._bwd = jax.jit(functools.partial(self._transform, inverse=True))

    # -- device -------------------------------------------------------------
    def _use_pallas(self) -> bool:
        """Limb-major fused-butterfly path: default on TPU, forceable for
        tests with CRESCENT_NTT_PALLAS=1/0."""
        import os

        env = os.environ.get("CRESCENT_NTT_PALLAS")
        if env is not None:
            return env != "0"
        return jax.default_backend() == "tpu"

    def _transform(self, x: jax.Array, inverse: bool) -> jax.Array:
        """x: (n, 16) Montgomery coeffs -> (n, 16) Montgomery evals."""
        if self._use_pallas():
            return self._transform_limb_major(x, inverse)
        ctx = self.ctx
        n = self.n
        x = jnp.take(x, self.perm, axis=0)
        tws = self.tw_inv if inverse else self.tw_fwd
        for s in range(self.logn):
            half = 1 << s
            blocks = n // (2 * half)
            v = x.reshape(blocks, 2, half, NLIMB)
            a = v[:, 0]
            b = v[:, 1]
            t = ctx.mont_mul(b, jnp.broadcast_to(tws[s][None], b.shape))
            out0 = ctx.add_mod(a, t)
            out1 = ctx.sub_mod(a, t)
            x = jnp.stack([out0, out1], axis=1).reshape(n, NLIMB)
        if inverse:
            x = ctx.mont_mul(x, jnp.broadcast_to(self.n_inv_mont, x.shape))
        return x

    def _transform_limb_major(self, x: jax.Array, inverse: bool) -> jax.Array:
        """Fused-butterfly stages on (16, n) limb-major planes.

        Each stage is ONE pallas launch (pallas_ec.butterfly): the twiddle
        product, modular add and sub all stay in VMEM, vs the batch-major
        XLA path that streams the Montgomery routing-matmul scratch
        (~2 GB/stage at 2^20) through HBM.  50 ms/stage -> ~1 ms/stage."""
        tws = self.tw_inv if inverse else self.tw_fwd
        return transform_limb_major(
            self.ctx, x, self.perm, tuple(tws),
            self.n_inv_mont if inverse else None,
        )

    def ntt(self, x: jax.Array) -> jax.Array:
        """coefficients -> evaluations on the domain (both Montgomery form)."""
        return self._fwd(x)

    def intt(self, x: jax.Array) -> jax.Array:
        """evaluations -> coefficients."""
        return self._bwd(x)

    def coset_scale(self, x: jax.Array, g: int) -> jax.Array:
        """multiply coefficient i by g^i (host-known g)."""
        return elemwise_mont_mul(self.ctx, x, self._coset_powers(g))

    @functools.lru_cache(maxsize=8)
    def _coset_powers(self, g: int) -> jax.Array:
        """Montgomery-form [g^0 .. g^(n-1)] device plane, cached per g.

        The naive per-i `pow` costs O(n log n) host bigint muls (~12 s at
        2^21, paid on EVERY prove before this was cached); the running
        product is O(n) and the array uploads once."""
        p = self.ctx.modulus
        powers = [1] * self.n
        acc = 1
        for i in range(1, self.n):
            acc = acc * g % p
            powers[i] = acc
        return jnp.asarray(self.ctx.to_mont_host(powers))

    def coset_ntt(self, x: jax.Array, g: int) -> jax.Array:
        return self.ntt(self.coset_scale(x, g))

    def coset_intt(self, x: jax.Array, g: int) -> jax.Array:
        return self.coset_scale(self.intt(x), pow(g, -1, self.ctx.modulus))

    # -- host oracle --------------------------------------------------------
    def ntt_host(self, coeffs: list[int]) -> list[int]:
        p, n = self.ctx.modulus, self.n
        return [
            sum(coeffs[j] * pow(self.w, j * k, p) for j in range(n)) % p
            for k in range(n)
        ]

    def intt_host(self, evals: list[int]) -> list[int]:
        p, n = self.ctx.modulus, self.n
        return [
            self.n_inv * sum(evals[j] * pow(self.w_inv, j * k, p) for j in range(n)) % p
            for k in range(n)
        ]

    def vanishing_on_coset(self, g: int) -> int:
        """Z_H(g*w^i) = g^n - 1, constant on the coset."""
        return (pow(g, self.n, self.ctx.modulus) - 1) % self.ctx.modulus


@functools.lru_cache(maxsize=None)
def get_domain(modulus: int, n: int) -> NTTDomain:
    return NTTDomain(limb.get_ctx(modulus), n)
