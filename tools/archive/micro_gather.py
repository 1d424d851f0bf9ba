"""Gather/scatter strategy shoot-out for the embedding engine."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 8192 * 26
VP = 325_000
W = 128
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
        jax.tree_util.tree_map(lambda x: float(x), r)
        t0 = time.perf_counter()
        r = run(carry0)
        jax.tree_util.tree_map(lambda x: float(x), r)
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"{name:44s} {dt:8.3f} ms")
    except Exception as e:  # noqa
        print(f"{name:44s} FAILED: {type(e).__name__}: {e}")


def rz(c):
    leaf = jax.tree_util.tree_leaves(c)[0]
    return 0.0 * jnp.sum(leaf.astype(jnp.float32))


def main():
    rng = np.random.RandomState(0)
    pr = jnp.asarray(np.sort(rng.randint(0, VP, N)), jnp.int32)
    pru = jnp.asarray(np.sort(rng.permutation(VP)[:N % VP]), jnp.int32)
    lines = jnp.asarray(rng.randn(N, W), jnp.float32)
    lines_u = lines[: pru.shape[0]]
    table = jnp.asarray(rng.randn(VP, W), jnp.float32)

    def pert(c, idx):
        return idx + (rz(c) > 1).astype(idx.dtype)

    timeit("gather plain",
           lambda c: table[pert(c, pr)], lines)
    timeit("gather sorted hint",
           lambda c: table.at[pert(c, pr)].get(indices_are_sorted=True),
           lines)
    timeit("gather bf16 table",
           lambda c: table.astype(jnp.bfloat16)[pert(c, pr)], lines)

    tbl16 = table.astype(jnp.bfloat16)
    timeit("gather bf16 pre-cast",
           lambda c: tbl16[pert(c, pr)], lines)

    timeit("scatter-add plain",
           lambda t: t.at[pr].add(lines), table)
    timeit("scatter-add sorted hint",
           lambda t: t.at[pr].add(lines, indices_are_sorted=True), table)
    timeit("scatter-add unique+sorted (unique ids)",
           lambda t: t.at[pru].add(lines_u, indices_are_sorted=True,
                                   unique_indices=True), table)
    timeit("scatter-set unique+sorted",
           lambda t: t.at[pru].set(lines_u, indices_are_sorted=True,
                                   unique_indices=True), table)

    # Pallas scalar-prefetch gather: grid over ids, block = 1 table row
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS_PER_STEP = 8

    def gather_kernel(idx_ref, tbl_ref, out_ref):
        out_ref[...] = tbl_ref[...]

    def pallas_gather(tbl, idx):
        n = idx.shape[0]
        grid = (n // ROWS_PER_STEP,)
        return pl.pallas_call(
            gather_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(
                    (ROWS_PER_STEP, W),
                    lambda i, idx_ref: (idx_ref[i * ROWS_PER_STEP] // ROWS_PER_STEP, 0))],
                out_specs=pl.BlockSpec((ROWS_PER_STEP, W),
                                       lambda i, idx_ref: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n, W), tbl.dtype),
        )(idx, tbl)

    # NOTE: block-aligned variant — gathers the 8-row tile containing
    # each id (only correct when ids are tile-aligned); measures the
    # DMA-rate ceiling, not exact semantics.
    timeit("pallas tile-gather (8-row tiles) ceiling",
           lambda c: pallas_gather(table, pert(c, pr)), lines)

    # full-table stream: copy whole table (sequential-read ceiling)
    timeit("full table copy (sequential ceiling)",
           lambda c: table + rz(c), table)


if __name__ == "__main__":
    main()
