"""Device windowed fixed-base MSM vs the host/native oracle (bit-exact).

Runs on the XLA adapter (same formula bodies as the TPU pallas kernels,
ops/xla_pec.py) so CPU CI covers the exact program structure the TPU
zksetup path compiles (ops/fixed_base.py)."""

import random


from crescent_tpu.core.curves import BN254G2
from crescent_tpu.models.groth16 import G1, fixed_base_mul
from crescent_tpu.ops import limb
from crescent_tpu.ops.ec import get_curve_ctx, get_g2_ctx
from crescent_tpu.ops.fixed_base import FixedBaseMSM


def _scalars(rng, order, n):
    ks = [0, 1, 2, order - 1, order - 2, (order + 1) // 2]
    ks += [rng.randrange(order) for _ in range(n - len(ks))]
    return ks[:n]


def test_fixed_base_g1_matches_oracle():
    rng = random.Random(11)
    ctx = get_curve_ctx(G1)
    fb = FixedBaseMSM(ctx, chunk=64)  # several scan chunks at tiny n
    g = G1.generator
    table = fixed_base_mul(g, fb.table_scalars())
    ks = _scalars(rng, G1.n, 150)  # non-pow2: exercises padding lanes
    out = fb.run(table, limb.ints_to_limbs(ks))
    ref = fixed_base_mul(g, ks)
    assert list(out) == ref
    assert out.inf[0] and not out.inf[1]


def test_fixed_base_g2_matches_oracle():
    rng = random.Random(12)
    ctx = get_g2_ctx()
    fb = FixedBaseMSM(ctx, chunk=64)
    h = BN254G2.generator()
    table = fixed_base_mul(h, fb.table_scalars(), g2=True)
    ks = _scalars(rng, BN254G2.n, 70)
    out = fb.run(table, limb.ints_to_limbs(ks))
    ref = fixed_base_mul(h, ks, g2=True)
    assert out.g2
    assert list(out) == ref


def test_setup_device_path_matches_host(monkeypatch):
    """groth16.setup via the device fixed-base pipeline == host path,
    table-for-table (same rng seed -> identical toxic waste)."""
    from crescent_tpu.models import groth16
    from crescent_tpu.utils.pointvec import ArrayPointVec

    rng1 = random.Random(77)
    r1cs, z = groth16.dummy_circuit(5, rng1, num_public=2)
    pk_host = groth16.setup(r1cs, random.Random(42))

    monkeypatch.setenv("CRESCENT_SETUP_TPU", "force")
    monkeypatch.setenv("CRESCENT_SETUP_TPU_MIN", "0")
    pk_dev = groth16.setup(r1cs, random.Random(42))
    assert isinstance(pk_dev.a_query, ArrayPointVec)
    assert list(pk_dev.a_query) == pk_host.a_query
    assert list(pk_dev.b_g1_query) == pk_host.b_g1_query
    assert list(pk_dev.h_query) == pk_host.h_query
    assert list(pk_dev.l_query) == pk_host.l_query
    assert list(pk_dev.b_g2_query) == pk_host.b_g2_query
    assert pk_dev.vk == pk_host.vk
    assert (pk_dev.beta_g1, pk_dev.delta_g1) == (
        pk_host.beta_g1,
        pk_host.delta_g1,
    )
    # and the device-generated key proves/verifies
    proof = groth16.prove(pk_dev, r1cs, z, random.Random(3))
    pvk = pk_dev.vk.prepare()
    assert groth16.verify(pvk, proof, z[1 : r1cs.num_instance])


def test_fixed_base_serializes_like_points():
    from crescent_tpu.utils import ark
    from crescent_tpu.utils.serialize import ser_g1_uncompressed

    rng = random.Random(13)
    ctx = get_curve_ctx(G1)
    fb = FixedBaseMSM(ctx, chunk=64)
    g = G1.generator
    table = fixed_base_mul(g, fb.table_scalars())
    ks = _scalars(rng, G1.n, 40)
    out = fb.run(table, limb.ints_to_limbs(ks))
    ref = fixed_base_mul(g, ks)
    assert ark.ser_list(out, ser_g1_uncompressed) == ark.ser_list(
        ref, ser_g1_uncompressed
    )
