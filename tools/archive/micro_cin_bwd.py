"""Isolate CIN stack backward cost with scalar outputs (no transfer
pollution): stack kernel vs per-layer kernel vs pure-XLA contraction.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_cin_bwd.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, F, D = 8192, 26, 16
KS = (64, 64)
STEPS = 10


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jax.device_get(out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = jfn(*args)
    float(jax.device_get(out))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return dt


def grad_scalar(f):
    def g(*args):
        grads = jax.grad(f, argnums=tuple(range(len(args))))(*args)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
    return g


def main():
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(B, F, D).astype(np.float32) * 0.1)
    x0 = jnp.transpose(emb, (0, 2, 1))
    weights = tuple(
        jnp.asarray(rng.randn(k, F, h).astype(np.float32) * 0.05)
        for k, h in zip(KS, (F,) + KS[:-1]))

    from rec_now_tpu.ops.pallas.cin_kernel import (cin_stack_sum_pallas,
                                                   cin_pallas)

    def stack_loss(x0, ws):
        return jnp.sum(cin_stack_sum_pallas(x0, ws))
    timeit("stack fwd (scalar)", stack_loss, x0, weights)
    timeit("stack fwd+bwd (scalar)", grad_scalar(stack_loss), x0, weights)

    def perlayer_loss(x0, ws):
        layers = [x0]
        for w in ws:
            layers.append(cin_pallas(x0, layers[-1], w))
        return jnp.sum(jnp.concatenate(layers, axis=-1))
    timeit("per-layer fwd+bwd (scalar)", grad_scalar(perlayer_loss),
           x0, weights)

    def xla_loss(x0, ws):
        layers = [x0]
        for w in ws:
            t = jnp.einsum("bdh,kfh->bdfk", layers[-1], w,
                           preferred_element_type=jnp.float32)
            layers.append(jnp.einsum("bdf,bdfk->bdk", x0, t))
        return jnp.sum(jnp.concatenate(layers, axis=-1))
    timeit("pure-XLA fwd+bwd (scalar)", grad_scalar(xla_loss),
           x0, weights)


if __name__ == "__main__":
    main()
