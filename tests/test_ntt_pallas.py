"""Limb-major fused-butterfly NTT path vs the host oracle.

The TPU production path (NTTDomain._transform_limb_major; pallas butterfly
kernel) runs here in pallas interpret mode at small n — slow per launch, so
sizes stay tiny.  The batch-major XLA path is what the rest of the CPU
suite exercises; this file pins the two paths to the same results.
"""

import random

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setenv("CRESCENT_NTT_PALLAS", "1")


def test_limb_major_ntt_matches_oracle(force_pallas):
    from crescent_tpu.core.fields import BN254_FR
    from crescent_tpu.ops import ntt

    rng = random.Random(5)
    n = 128
    dom = ntt.get_domain(BN254_FR, n)
    coeffs = [rng.randrange(BN254_FR) for _ in range(n)]
    xm = jnp.asarray(dom.ctx.to_mont_host(coeffs))
    got = dom.ctx.from_mont_host(jax.device_get(dom._transform_limb_major(xm, inverse=False)))
    assert got == dom.ntt_host(coeffs)
    # round trip through the inverse (covers the n_inv mul tail)
    back = dom.ctx.from_mont_host(
        jax.device_get(
            dom._transform_limb_major(
                dom._transform_limb_major(xm, inverse=False), inverse=True
            )
        )
    )
    assert back == coeffs


def test_limb_major_matches_batch_major(force_pallas):
    from crescent_tpu.core.fields import BN254_FR
    from crescent_tpu.ops import ntt

    rng = random.Random(6)
    n = 64
    dom = ntt.get_domain(BN254_FR, n)
    coeffs = [rng.randrange(BN254_FR) for _ in range(n)]
    xm = jnp.asarray(dom.ctx.to_mont_host(coeffs))
    a = jax.device_get(dom._transform_limb_major(xm, inverse=True))
    import os

    os.environ["CRESCENT_NTT_PALLAS"] = "0"
    b = jax.device_get(dom._transform(xm, inverse=True))
    assert (a == b).all()
