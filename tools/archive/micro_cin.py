"""Micro-bench cin_flat fwd / fwd+bwd at config-#3 shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import rec_now_tpu.ops.pallas.cin_kernel as ck

B, D, F = 8192, 16, 26
M = B * D
STEPS = 30


def timeit(name, step_fn, carry0):
    """On-device scan loop: excludes per-dispatch tunnel latency."""
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jax.tree_util.tree_map(jnp.sum, c)
    float(jax.tree_util.tree_leaves(run(carry0))[0])
    t0 = time.perf_counter()
    r = run(carry0)
    float(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(M, F).astype(np.float32))
    for h, k in [(26, 64), (64, 64)]:
        prev = jnp.asarray(rng.randn(M, h).astype(np.float32))
        w = jnp.asarray(rng.randn(k, F, h).astype(np.float32) * 0.05)

        def fwd_step(c, prev=prev, w=w):
            out = ck.cin_flat(c, prev, w)
            return c + 1e-12 * out[:, :F]

        def grad_step(c, prev=prev, w=w):
            def loss(x0):
                return jnp.sum(ck.cin_flat(x0, prev, w) ** 2)
            return c + 1e-12 * jax.grad(loss)(c)

        timeit(f"H={h} K={k} fwd", fwd_step, x0)
        timeit(f"H={h} K={k} fwd+bwd", grad_step, x0)


if __name__ == "__main__":
    main()
