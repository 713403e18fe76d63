"""Multi-chip NTT: Bailey four-step decomposition with all-to-all transpose.

BASELINE.json: "QAP polynomial division NTTs exchanged all-to-all across
butterfly stages".  The four-step form is the TPU-native shape of that idea:

  N = n1 * n2, coeffs viewed as an (n1, n2) matrix M[j1, j2] = x[j2*n1 + j1]:
    1. row-wise NTTs of length n2 (local; rows sharded over the mesh),
    2. twiddle multiply by w^(j1*k2) (local, per-shard constants),
    3. transpose via `all_to_all` over ICI,
    4. column-wise NTTs of length n1 (local),
  output X[k1*n2 + k2] lands sharded over the k2 axis.

One collective per transform, all butterflies stay on-chip — instead of
log2(N) cross-chip exchanges a naive stage-parallel mapping would need.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import limb, ntt
from ..ops.limb import NLIMB


class ShardedNTT:
    """NTT of size n1*n2 over a 1-D device mesh (axis `axis`).

    `inverse=True` builds the inverse transform: the same four-step
    decomposition with the inverse roots (the row/col domains' `_bwd`
    carry their own 1/n2 and 1/n1 factors, whose product is the full 1/N)."""

    def __init__(self, modulus: int, n1: int, n2: int, mesh: Mesh,
                 axis: str = "points", inverse: bool = False):
        self.ctx = limb.get_ctx(modulus)
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        self.mesh = mesh
        self.axis = axis
        self.inverse = inverse
        d = mesh.devices.size
        assert n1 % d == 0, "n1 must divide evenly across devices"

        self.dom_rows = ntt.get_domain(modulus, n2)   # length-n2 NTTs, root w^n1
        self.dom_cols = ntt.get_domain(modulus, n1)   # length-n1 NTTs, root w^n2
        self.dom_full = ntt.get_domain(modulus, self.n)

        # twiddle matrix w^(j1*k2) in Montgomery form, sharded by rows
        w = self.dom_full.w_inv if inverse else self.dom_full.w
        p = modulus
        tw = np.zeros((n1, n2, NLIMB), dtype=np.uint32)
        for j1 in range(n1):
            row = [pow(w, j1 * k2, p) for k2 in range(n2)]
            tw[j1] = self.ctx.to_mont_host(row)
        self.twiddles = jnp.asarray(tw)

        row_fn = self.dom_rows._bwd if inverse else self.dom_rows._fwd
        col_fn = self.dom_cols._bwd if inverse else self.dom_cols._fwd
        row_ntt = jax.vmap(row_fn)                        # (rows, n2, 16)
        col_ntt = jax.vmap(col_fn, in_axes=1, out_axes=1)

        def local(mat, tw):
            # mat: (n1/D, n2, 16) row shard
            a = row_ntt(mat)
            b = self.ctx.mont_mul(a, tw)
            # transpose shards: (n1/D, n2, 16) -> (n1, n2/D, 16)
            b = jax.lax.all_to_all(b, self.axis, split_axis=1, concat_axis=0, tiled=True)
            return col_ntt(b)

        self._fn = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(axis, None, None)),
                out_specs=P(None, axis, None),
                check_vma=False,
            )
        )

    def ntt(self, coeffs_mont: jax.Array) -> jax.Array:
        """coeffs (n, 16) Montgomery -> evaluations (n, 16), natural order."""
        mat = coeffs_mont.reshape(self.n2, self.n1, NLIMB).transpose(1, 0, 2)
        out = self._fn(mat, self.twiddles)                # (n1, n2, 16)
        return out.reshape(self.n, NLIMB)

    def ntt_host_ints(self, coeffs: list[int]) -> list[int]:
        cm = jnp.asarray(self.ctx.to_mont_host(coeffs))
        out = self.ntt(cm)
        return self.ctx.from_mont_host(np.asarray(out))


class ShardedHPipeline:
    """Multi-chip h(x) = (A(x)B(x) - C(x)) / Z(x) for the Groth16 prover:
    every length-N transform in the QAP witness map runs through the
    four-step sharded NTT (one all_to_all each), with the elementwise coset
    scales / pointwise products as local device ops.

    Mirrors models/groth16._compute_h bit-for-bit (oracle-tested in
    tests/test_parallel.py); reference: forks/groth16/src/r1cs_to_qap.rs.
    """

    def __init__(self, modulus: int, n: int, mesh: Mesh, g: int,
                 axis: str = "points"):
        d = mesh.devices.size
        n1 = d
        while n1 * n1 < n:  # square-ish factorization, n1 divisible by d
            n1 *= 2
        n2 = n // n1
        assert n1 * n2 == n and n1 % d == 0
        self.ctx = limb.get_ctx(modulus)
        self.n = n
        self.fwd = ShardedNTT(modulus, n1, n2, mesh, axis)
        self.inv = ShardedNTT(modulus, n1, n2, mesh, axis, inverse=True)
        self.dom = self.fwd.dom_full
        p = modulus
        self.g = g
        self.g_inv = pow(g, -1, p)
        self.pows = self.dom._coset_powers(g)
        self.ipows = self.dom._coset_powers(self.g_inv)
        zinv = pow(self.dom.vanishing_on_coset(g), -1, p)
        self.zinv_m = jnp.asarray(self.ctx.to_mont_host([zinv])[0])

    def _coset_fwd(self, x_mont: jax.Array) -> jax.Array:
        co = self.ctx.mont_mul(self.inv.ntt(x_mont), self.pows)
        return self.fwd.ntt(co)

    def compute_h(self, a: list[int], b: list[int], c: list[int]) -> list[int]:
        """Domain evaluations (host ints) -> h coefficients (host ints,
        length n; the caller asserts the top coefficient is zero)."""
        ctx = self.ctx
        am = jnp.asarray(ctx.to_mont_host(a))
        bm = jnp.asarray(ctx.to_mont_host(b))
        cm = jnp.asarray(ctx.to_mont_host(c))
        ac, bc, cc = self._coset_fwd(am), self._coset_fwd(bm), self._coset_fwd(cm)
        prod = ctx.sub_mod(ctx.mont_mul(ac, bc), cc)
        hc = ctx.mont_mul(prod, jnp.broadcast_to(self.zinv_m, prod.shape))
        h = ctx.mont_mul(self.inv.ntt(hc), self.ipows)
        return ctx.from_mont_host(np.asarray(jax.device_get(h)))
