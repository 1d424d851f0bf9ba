"""TPU micro: scatter hint variants + pack-slice select variants."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 8192 * 26
VP = 325_000
W = 128
P, D = 8, 16
STEPS = 20


def timeit(name, step_fn, carry0):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)
    try:
        r = run(carry0)
        jax.tree_util.tree_map(float, r)
        t0 = time.perf_counter()
        r = run(carry0)
        jax.tree_util.tree_map(float, r)
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"{name:46s} {dt:8.3f} ms", flush=True)
    except Exception as e:  # noqa
        print(f"{name:46s} FAILED: {type(e).__name__}", flush=True)


def rz(c):
    return 0.0 * jnp.sum(jax.tree_util.tree_leaves(c)[0]
                         .astype(jnp.float32))


def main():
    rng = np.random.RandomState(0)
    pr = jnp.asarray(rng.randint(0, VP, N), jnp.int32)
    pru = jnp.asarray(np.sort(rng.permutation(VP)[:150_000]), jnp.int32)
    lines = jnp.asarray(rng.randn(N, W), jnp.float32)
    lines_u = lines[:150_000]
    table = jnp.asarray(rng.randn(VP, W), jnp.float32)
    local_rows = jnp.asarray(rng.randint(0, VP * P, N), jnp.int32)

    timeit("scatter-add plain (N=213k)",
           lambda t: t.at[pr].add(lines), table)
    timeit("scatter-add unique+sorted hints (150k)",
           lambda t: t.at[pru].add(lines_u, indices_are_sorted=True,
                                   unique_indices=True), table)
    timeit("scatter-add unique+sorted NO hints (150k)",
           lambda t: t.at[pru].add(lines_u), table)

    # pack-slice select variants after the packed gather
    def fetch_tala(c):
        rows = local_rows + (rz(c) > 1).astype(local_rows.dtype)
        l = jnp.take(table, rows // P, axis=0).reshape(-1, P, D)
        off = rows % P
        return jnp.take_along_axis(l, off[:, None, None], axis=1)[:, 0]
    timeit("fetch: gather + take_along_axis (current)", fetch_tala,
           jnp.zeros((N, D)))

    def fetch_einsum(c):
        rows = local_rows + (rz(c) > 1).astype(local_rows.dtype)
        l = jnp.take(table, rows // P, axis=0).reshape(-1, P, D)
        oh = jax.nn.one_hot(rows % P, P, dtype=l.dtype)
        return jnp.einsum("npd,np->nd", l, oh)
    timeit("fetch: gather + one-hot einsum", fetch_einsum,
           jnp.zeros((N, D)))

    def fetch_mulsum(c):
        rows = local_rows + (rz(c) > 1).astype(local_rows.dtype)
        l = jnp.take(table, rows // P, axis=0).reshape(-1, P, D)
        oh = jax.nn.one_hot(rows % P, P, dtype=l.dtype)
        return jnp.sum(l * oh[:, :, None], axis=1)
    timeit("fetch: gather + mul-sum", fetch_mulsum, jnp.zeros((N, D)))


if __name__ == "__main__":
    main()
