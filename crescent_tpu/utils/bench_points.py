"""Disk-cached random point sets for benchmarks/profiling.

Generating 2^16+ BN254 points costs minutes (device scalar-muls + host
affine normalization); benches reuse a cached .npz across runs.
"""

from __future__ import annotations

import os
import random

import numpy as np


def cached_points(n: int, seed: int = 42, cache_dir: str | None = None):
    """Returns (px, py) as (n, 16) uint32 Montgomery-form numpy arrays of
    affine BN254 G1 points k_i * G (k_i pseudorandom)."""
    import jax.numpy as jnp

    from ..core.curves import BN254_G1
    from ..ops import limb
    from ..ops.ec import JPoints, get_curve_ctx

    cache_dir = cache_dir or os.path.expanduser("~/.cache/crescent_tpu_bench")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"points_{n}_{seed}.npz")
    if os.path.exists(path):
        data = np.load(path)
        return data["px"], data["py"]

    ctx = get_curve_ctx(BN254_G1)
    rng = random.Random(seed)
    base = ctx.points_to_device([BN254_G1.generator])
    es = ctx.fctx.elem_shape
    P = JPoints(
        jnp.broadcast_to(base.x[0], (n,) + es),
        jnp.broadcast_to(base.y[0], (n,) + es),
        jnp.broadcast_to(base.z[0], (n,) + es),
    )
    kl = jnp.asarray(limb.ints_to_limbs([rng.randrange(1, 1 << 20) for _ in range(n)]))
    jac = ctx.scalar_mul(kl, P)
    aff = ctx.points_to_host(jac)
    Pd = ctx.points_to_device(aff)
    px = np.asarray(Pd.x)
    py = np.asarray(Pd.y)
    np.savez_compressed(path, px=px, py=py)
    return px, py
