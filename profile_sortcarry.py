"""PERF queue #1 micro-measurement: sort-carry round 1 premise.

The idea: carry the 32 coordinate rows through the initial lax.sort as
payload operands so round 1 skips its four 32-row txy gathers.  The
compaction gathers (ex[:, hp+t]) remain either way, so the trade is
EXACTLY:   sort(keys + 33 payload operands)
  versus   sort(keys + 1 payload) + 4x 32-row gathers (mn wide) from txy.

This measures both sides at the 2^16/c=11 shapes (m = N*W = 1.57M,
mn = m/4) on TPU.  If the wide sort costs more than the gathers it
replaces, sort-carry is a dead end — recorded either way in PERF.md.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # the axon tunnel's block_until_ready can return before execution for
    # some programs; a tiny device_get of the OUTPUT forces completion
    leaves = jax.tree_util.tree_leaves(out)
    for lf in leaves:
        np.asarray(lf[:8])


def t_min(f, xs, reps=3):
    _sync(f(xs[0]))
    best = 1e9
    for i in range(reps):
        t0 = time.time()
        _sync(f(xs[1 + i]))
        best = min(best, time.time() - t0)
    return best


def main():
    N = 1 << 16
    W = 24
    m = N * W
    mn = m // 4
    rng = np.random.default_rng(0)

    def mk():
        keys = jnp.asarray(rng.integers(0, 1 << 20, m, dtype=np.uint32))
        pay = jnp.asarray(rng.integers(0, 1 << 20, m, dtype=np.uint32))
        coords = jnp.asarray(
            rng.integers(0, 1 << 16, (32, m), dtype=np.uint32)
        )
        txy = jnp.asarray(
            rng.integers(0, 1 << 16, (32, 2 * N), dtype=np.uint32)
        )
        idx = jnp.asarray(rng.integers(0, 2 * N, mn, dtype=np.int32))
        return keys, pay, coords, txy, idx

    sets = [mk() for _ in range(4)]

    @jax.jit
    def sort2(keys, pay):
        return jax.lax.sort((keys, pay), num_keys=1)

    @jax.jit
    def sort34(keys, pay, coords):
        ops = (keys, pay) + tuple(coords[i] for i in range(32))
        return jax.lax.sort(ops, num_keys=1)

    @jax.jit
    def gathers4(txy, idx):
        outs = []
        for t in range(4):
            outs.append(txy[:, jnp.roll(idx, t)])
        return outs

    dt2 = t_min(lambda s: sort2(s[0], s[1]), sets)
    print(f"sort 2-operand @{m}: {dt2*1e3:.1f} ms", flush=True)
    dtg = t_min(lambda s: gathers4(s[3], s[4]), sets)
    print(f"4x 32-row gathers (mn={mn}): {dtg*1e3:.1f} ms", flush=True)
    dt34 = t_min(lambda s: sort34(s[0], s[1], s[2]), sets)
    print(f"sort 34-operand @{m}: {dt34*1e3:.1f} ms", flush=True)
    print(
        f"sort-carry delta: {(dt34 - dt2)*1e3:.1f} ms extra sort vs "
        f"{dtg*1e3:.1f} ms gathers saved -> "
        f"{'WIN' if dt34 - dt2 < dtg else 'DEAD END'}"
    )


if __name__ == "__main__":
    main()
