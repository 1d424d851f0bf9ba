"""TPU timing: pieces of the dense-apply embedding update.

Which part of _apply_grads_adagrad_dense costs 8.5 ms at bench shapes
(V=2.6M, D=16, pack=8 -> (325k, 128) physical table; 213k scattered
rows/step)?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 8192 * 26
VP = 325_000
PACK = 8
D = 16
W = PACK * D
STEPS = 10


def timeit(name, step_fn, carry0):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)
    r = run(carry0)
    jax.tree_util.tree_map(float, r)
    t0 = time.perf_counter()
    r = run(carry0)
    jax.tree_util.tree_map(float, r)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.zipf(1.3, size=N) % (VP * PACK), jnp.int32)
    g = jnp.asarray(rng.randn(N, D) * 1e-3, jnp.float32)
    table = jnp.zeros((VP, W), jnp.float32)
    acc = jnp.zeros((VP, PACK), jnp.float32)

    pr = rows // PACK
    off = rows % PACK

    def expand(rows, g):
        pr = rows // PACK
        off = rows % PACK
        oh = jax.nn.one_hot(off, PACK, dtype=g.dtype)  # (N, P)
        lines = (oh[:, :, None] * g[:, None, :]).reshape(N, W)
        return pr, lines

    def scatter_only(t):
        p, lines = expand(rows, g + t[0, 0])
        return jnp.zeros_like(t).at[p].add(lines)

    def scatter_sorted(t):
        p, lines = expand(rows, g + t[0, 0])
        order = jnp.argsort(p)
        return jnp.zeros_like(t).at[p[order]].add(
            lines[order], indices_are_sorted=True)

    def scatter_rows_narrow(t):
        # scatter (N, D) grads at (pr, off) coordinates viewing the
        # table as (VP, PACK, D): same data, narrower lines
        t3 = jnp.zeros((VP, PACK, D), t.dtype)
        out = t3.at[pr, off].add(g + t[0, 0])
        return out.reshape(VP, W)

    def elementwise_pass(t):
        gl = t.reshape(VP, PACK, D)
        sq = jnp.mean(jnp.square(gl), axis=2)
        na = acc + sq
        scale = 0.05 / jnp.sqrt(jnp.clip(na, 1e-12))
        return (t - (scale[:, :, None] * gl).reshape(VP, W)
                + jnp.sum(na) * 0)

    def segment_then_scatter(t):
        p, lines = expand(rows, g + t[0, 0])
        order = jnp.argsort(p)
        ps = p[order]
        ls = lines[order]
        # collapse duplicate physical rows: segment boundaries where
        # row changes; scatter once per first-occurrence
        first = jnp.concatenate([jnp.ones(1, bool), ps[1:] != ps[:-1]])
        seg = jnp.cumsum(first) - 1
        agg = jax.ops.segment_sum(ls, seg, num_segments=N)
        tgt = jax.ops.segment_max(ps, seg, num_segments=N)
        tgt = jnp.where(jnp.arange(N) < seg[-1] + 1, tgt, VP)  # OOB drop
        return jnp.zeros_like(t).at[tgt].add(
            agg, indices_are_sorted=True, mode="drop")

    variants = {
        "wide": ("scatter-add (current, wide lines)", scatter_only),
        "sorted": ("scatter-add sorted", scatter_sorted),
        "narrow": ("scatter-add narrow (VP,PACK,D) 2-coord",
                   scatter_rows_narrow),
        "dedup": ("sort+segment-dedup+sorted scatter",
                  segment_then_scatter),
        "pass": ("full-table adagrad elementwise pass",
                 elementwise_pass),
    }
    import sys
    keys = sys.argv[1:] or list(variants)
    for k in keys:
        name, fn = variants[k]
        timeit(name, fn, table)


if __name__ == "__main__":
    main()

# appended: flat (V, D) single-coord scatter, no one-hot expansion
def _flat_variant():
    import sys, time
    import jax, jax.numpy as jnp, numpy as np
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.zipf(1.3, size=N) % (VP * PACK), jnp.int32)
    g = jnp.asarray(rng.randn(N, D) * 1e-3, jnp.float32)
    table = jnp.zeros((VP, W), jnp.float32)

    def scatter_flat(t):
        tv = jnp.zeros((VP * PACK, D), t.dtype)
        dg = tv.at[rows].add(g + t[0, 0])
        return dg.reshape(VP, W)

    def scatter_flat_sorted(t):
        order = jnp.argsort(rows)
        tv = jnp.zeros((VP * PACK, D), t.dtype)
        dg = tv.at[rows[order]].add((g + t[0, 0])[order],
                                    indices_are_sorted=True)
        return dg.reshape(VP, W)

    timeit("scatter-add flat (V,D) single-coord", scatter_flat, table)
    timeit("scatter-add flat sorted", scatter_flat_sorted, table)
