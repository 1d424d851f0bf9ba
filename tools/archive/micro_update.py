"""Micro-benchmarks of the sparse-update building blocks on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 8192 * 26            # flattened ids per step
VP = 325_000             # physical rows (V/pack)
W = 128                  # packed width
STEPS = 20


def timeit(name, step_fn, carry0):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)

    r = run(carry0)
    jax.tree_util.tree_map(lambda x: float(x), r)
    t0 = time.perf_counter()
    r = run(carry0)
    jax.tree_util.tree_map(lambda x: float(x), r)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:40s} {dt:8.3f} ms")


def main():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, VP * 8, N), jnp.int32)
    g = jnp.asarray(rng.randn(N, 16), jnp.float32)
    lines = jnp.asarray(rng.randn(N, W), jnp.float32)
    table = jnp.zeros((VP, W), jnp.float32)
    pr = ids // 8

    def rz(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return 0.0 * jnp.sum(leaf.astype(jnp.float32))

    timeit("argsort(ids) [N=213k]",
           lambda c: jnp.argsort(ids + (rz(c) > 1).astype(ids.dtype)),
           jnp.zeros((N,), jnp.int32))
    timeit("sort ids + gather payload (N,16)",
           lambda c: g[jnp.argsort(ids + (rz(c) > 1).astype(ids.dtype))],
           g)

    def seg(c):
        i2 = ids + (rz(c) > 1).astype(ids.dtype)
        order = jnp.argsort(i2)
        sid = i2[order]
        sg = g[order]
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 sid[1:] != sid[:-1]])
        s = jnp.cumsum(first.astype(jnp.int32)) - 1
        return jax.ops.segment_sum(sg, s, num_segments=N)
    timeit("full dedup (sort+gather+segsum)", seg, g)

    timeit("scatter-add (N,128) into (325k,128)",
           lambda t: t.at[pr].add(lines), table)
    timeit("scatter-add sorted idx",
           lambda t: t.at[jnp.sort(pr)].add(lines), table)
    timeit("gather (N,128) from (325k,128)",
           lambda c: table.at[pr + (rz(c) > 1).astype(pr.dtype)].get(),
           lines)
    # dense alternative: scatter grads into dense buffer + elementwise
    def dense_path(t):
        buf = jnp.zeros((VP, W), t.dtype).at[pr].add(lines)
        return t - 0.01 * buf
    timeit("dense: zero+scatter+elementwise", dense_path, table)


if __name__ == "__main__":
    main()
