"""Throwaway probe: calibrate XLA op costs at CIN shapes on this TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

M, F, H, K = 131072, 26, 64, 64
STEPS = 30


def timeit(name, step_fn, carry0):
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
    print(f"{name:46s} {dt:8.3f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    prev = jnp.asarray(rng.randn(M, H).astype(np.float32))
    x0 = jnp.asarray(rng.randn(M, F).astype(np.float32))
    w = jnp.asarray(rng.randn(K, F, H).astype(np.float32) * 0.05)
    wk = jnp.asarray(rng.randn(H, K).astype(np.float32))

    timeit("elementwise (M,H)*2", lambda c: c * 2.0 + 1e-9, prev)
    timeit("dot (M,H)x(H,K)",
           lambda c: c + 1e-12 * jnp.dot(c, wk), prev)

    def xla_cin(c):
        from rec_now_tpu.ops.cin_op import cin_contract_xla
        out = cin_contract_xla(
            x0.reshape(8192, 16, F), c.reshape(8192, 16, H), w)
        return c + 1e-12 * out.reshape(M, K)[:, :H]
    timeit("cin_contract_xla fwd", xla_cin, prev)

    def xla_cin_grad(c):
        from rec_now_tpu.ops.cin_op import cin_contract_xla

        def loss(p):
            return jnp.sum(cin_contract_xla(
                x0.reshape(8192, 16, F), p.reshape(8192, 16, H), w) ** 2)
        return c + 1e-12 * jax.grad(loss)(c)
    timeit("cin_contract_xla fwd+bwd", xla_cin_grad, prev)


if __name__ == "__main__":
    main()
