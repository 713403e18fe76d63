"""Per-phase MSM profiling on the local accelerator (dev tool)."""
import sys, time, random, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from crescent_tpu.core.curves import BN254_G1
from crescent_tpu.ops import limb
from crescent_tpu.ops.ec import get_curve_ctx
from crescent_tpu.ops import msm as M
from crescent_tpu.utils.bench_points import cached_points

def log(*a): print(*a, flush=True)

ctx = get_curve_ctx(BN254_G1)
n = 1 << 16
t0=time.time(); px, py = cached_points(n); log("points ready", time.time()-t0)
px, py = jnp.asarray(px), jnp.asarray(py)
rng = random.Random(2)
valid = jnp.ones(n, dtype=jnp.uint32)
sc = jnp.asarray(limb.ints_to_limbs([rng.randrange(BN254_G1.n) for _ in range(n)]))
digits = M.scalar_digits(sc, 8)

for lanes in [256, 1024]:
    acc_fn = jax.jit(functools.partial(M._accumulate_buckets, ctx, c=8, lanes=lanes))
    t0=time.time(); wb = acc_fn(px, py, valid, digits); jax.block_until_ready(wb); log(f"acc[L={lanes}] compile+run", round(time.time()-t0,2))
    t0=time.time(); wb = acc_fn(px, py, valid, digits); jax.block_until_ready(wb); log(f"acc[L={lanes}] run", round(time.time()-t0,3))

agg_fn = jax.jit(functools.partial(M._aggregate_buckets, ctx, c=8))
t0=time.time(); r = agg_fn(wb); jax.block_until_ready(r); log("agg compile+run", round(time.time()-t0,2))
t0=time.time(); r = agg_fn(wb); jax.block_until_ready(r); log("agg run", round(time.time()-t0,3))
