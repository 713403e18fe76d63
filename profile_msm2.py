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
px, py = cached_points(n); log("points ready")
px, py = jnp.asarray(px), jnp.asarray(py)
rng = random.Random(2)
valid = jnp.ones(n, dtype=jnp.uint32)
sc = jnp.asarray(limb.ints_to_limbs([rng.randrange(BN254_G1.n) for _ in range(n)]))
for c in [8]:
    digits = M.scalar_digits(sc, c)
    for lanes in [64, 128]:
        fn = jax.jit(functools.partial(M._msm_impl, ctx, c=c, lanes=lanes))
        t0=time.time(); r = fn(px, py, valid, digits); jax.block_until_ready(r); log(f"msm[c={c},L={lanes}] compile+run", round(time.time()-t0,2))
        t0=time.time(); r = fn(px, py, valid, digits); jax.block_until_ready(r); log(f"msm[c={c},L={lanes}] run", round(time.time()-t0,3))
