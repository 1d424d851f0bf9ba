"""Compare sparse vs dense table update at config-#3 scale (1 chip).

V=2.6M rows, D=16 (pack=8), B*F=213k touched ids per step.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.embedding.sharded import ShardedEmbeddingTable
from rec_now_tpu.parallel import make_mesh

B, F, D = 8192, 26, 16
V = 26 * 100_000
STEPS = 20


def timeit(name, step_fn, carry0):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return c
    r = run(carry0)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][0]))
    t0 = time.perf_counter()
    r = run(carry0)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0][0]))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)


def main():
    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=(B, F)).astype(np.int32))
    grads = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 1e-3)

    for mode in ["dense", "sparse"]:
        tbl = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh,
                                    update_mode=mode)
        state = tbl.init(jax.random.PRNGKey(0))

        def upd(c, tbl=tbl):
            return tbl.apply_grads(c, ids, grads, lr=0.05)
        timeit(f"adagrad update ({mode})", upd, state)

        def lk(c, tbl=tbl):
            emb = tbl.lookup(c, ids)
            return c._replace(
                table=c.table + 1e-20 * jnp.sum(emb))
        timeit(f"lookup ({mode})", lk, state)

        def both(c, tbl=tbl):
            emb = tbl.lookup(c, ids)
            return tbl.apply_grads(c, ids, grads + 1e-20 * emb, lr=0.05)
        timeit(f"lookup+update ({mode})", both, state)


if __name__ == "__main__":
    main()
