"""Microbench: 4 arbitrary-index 1-D gathers vs ONE width-4 block gather
(the msm_affine quad-slot pattern), plus the full AffineMSM before/after.

Run on TPU:  python profile_gather.py
"""
import sys, time, random
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from crescent_tpu.ops.msm_affine import _gather_blocks

def bench(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def main():
    m, mn = 1 << 21, 1 << 19   # round-1 shapes at n=2^16, W=25-ish
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (m + 4,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    hp = jnp.sort(jax.random.randint(key, (mn,), 0, m - 4, dtype=jnp.int32))
    exy = jax.random.randint(key, (32, m + 4), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)

    @jax.jit
    def four_gathers(a, hp):
        out = []
        for t in range(4):
            out.append(a[jnp.minimum(hp + t, m - 1)])
        return sum(out)

    @jax.jit
    def one_block(a, hp):
        g = _gather_blocks(a, hp, 4)
        return g[:, 0] + g[:, 1] + g[:, 2] + g[:, 3]

    @jax.jit
    def coord_four(exy, hp):
        acc = None
        for t in range(4):
            v = exy[:, jnp.minimum(hp + t, m - 1)]
            acc = v if acc is None else acc + v
        return acc

    @jax.jit
    def coord_block(exy, hp):
        c = _gather_blocks(exy, hp, 4)
        return c[:, :, 0] + c[:, :, 1] + c[:, :, 2] + c[:, :, 3]

    print("1-D   4 gathers :", round(bench(four_gathers, a, hp) * 1e3, 2), "ms")
    print("1-D   1 block   :", round(bench(one_block, a, hp) * 1e3, 2), "ms")
    print("coord 4 gathers :", round(bench(coord_four, exy, hp) * 1e3, 2), "ms")
    print("coord 1 block   :", round(bench(coord_block, exy, hp) * 1e3, 2), "ms")

if __name__ == "__main__":
    main()
