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
    """Forward NTT of size n1*n2 over a 1-D device mesh (axis `axis`)."""

    def __init__(self, modulus: int, n1: int, n2: int, mesh: Mesh, axis: str = "points"):
        self.ctx = limb.get_ctx(modulus)
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        self.mesh = mesh
        self.axis = axis
        d = mesh.devices.size
        assert n1 % d == 0, "n1 must divide evenly across devices"

        self.dom_rows = ntt.get_domain(modulus, n2)   # length-n2 NTTs, root w^n1
        self.dom_cols = ntt.get_domain(modulus, n1)   # length-n1 NTTs, root w^n2
        self.dom_full = ntt.get_domain(modulus, self.n)

        # twiddle matrix w^(j1*k2) in Montgomery form, sharded by rows
        w = self.dom_full.w
        p = modulus
        tw = np.zeros((n1, n2, NLIMB), dtype=np.uint32)
        for j1 in range(n1):
            row = [pow(w, j1 * k2, p) for k2 in range(n2)]
            tw[j1] = self.ctx.to_mont_host(row)
        self.twiddles = jnp.asarray(tw)

        row_ntt = jax.vmap(self.dom_rows._fwd)            # (rows, n2, 16)
        col_ntt = jax.vmap(self.dom_cols._fwd, in_axes=1, out_axes=1)

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
