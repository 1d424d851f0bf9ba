"""TPU timing: sparse vs dense apply_grads + lookup at bench shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.embedding import ShardedEmbeddingTable
from rec_now_tpu.parallel import make_mesh

B = 8192
F = 26
V = 2_600_000
D = 16
STEPS = 20


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
    print(f"{name:44s} {dt:8.3f} ms", flush=True)


def main():
    mesh = make_mesh(len(jax.devices()))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(
        (rng.zipf(1.3, size=(B, F)) % 100_000)
        + np.arange(F)[None, :] * 100_000, jnp.int32)
    grads = jnp.asarray(rng.randn(B, F, D) * 1e-3, jnp.float32)

    for mode in ("sparse", "dense"):
        for opt in ("adagrad", "adam"):
            t = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh,
                                      optimizer=opt, update_mode=mode)
            st = t.init(jax.random.PRNGKey(0))
            timeit(f"apply_grads {mode}/{opt}",
                   lambda s, t=t: t.apply_grads(s, ids, grads, lr=0.05),
                   st)

    t = ShardedEmbeddingTable(vocab_size=V, dim=D, mesh=mesh)
    st = t.init(jax.random.PRNGKey(0))

    def rz(c):
        return 0.0 * jnp.sum(jax.tree_util.tree_leaves(c)[0])

    timeit("lookup", lambda c: t.lookup(
        st, ids + (rz(c) > 1).astype(ids.dtype)),
        t.lookup(st, ids))


if __name__ == "__main__":
    main()
