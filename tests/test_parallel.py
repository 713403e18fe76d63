"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import pytest

from crescent_tpu.core import curves
from crescent_tpu.core.fields import BN254_FR


rng = random.Random(2024)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_host():
    from crescent_tpu.parallel.sharded_msm import ShardedMSM, make_mesh

    curve = curves.BN254_G1
    mesh = make_mesh(8)
    n = 64
    pts = [curve.mul(rng.randrange(1, curve.n), curve.generator) for _ in range(n)]
    ks = [rng.randrange(curve.n) for _ in range(n)]
    ks[0] = 0
    pts[1] = None
    m = ShardedMSM(curve, mesh, c=8, lanes=2)
    got = m.run_host(ks, pts)
    assert got == curve.msm(ks, pts)


def test_sharded_ntt_matches_single_device():
    from crescent_tpu.parallel.sharded_ntt import ShardedNTT
    from crescent_tpu.parallel.sharded_msm import make_mesh
    from crescent_tpu.ops import ntt

    mesh = make_mesh(8)
    n1, n2 = 16, 8
    sh = ShardedNTT(BN254_FR, n1, n2, mesh)
    coeffs = [rng.randrange(BN254_FR) for _ in range(n1 * n2)]
    got = sh.ntt_host_ints(coeffs)
    dom = ntt.get_domain(BN254_FR, n1 * n2)
    import jax.numpy as jnp
    import numpy as np

    want = dom.ctx.from_mont_host(
        np.asarray(dom.ntt(jnp.asarray(dom.ctx.to_mont_host(coeffs))))
    )
    assert got == want
