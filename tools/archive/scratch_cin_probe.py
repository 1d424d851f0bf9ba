"""Throwaway probe: bisect the CIN fwd kernel cost on TPU."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, F, H, K = 131072, 26, 64, 64
FK = F * K
TM = 512
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


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make(variant):
    def kern(x0_ref, prev_ref, wr_ref, r_ref, sel_ref, out_ref):
        if variant == "dot_small":
            # (TM,H)x(H,K) only — bandwidth floor
            out = _dot(prev_ref[:], wr_ref[:, :K], (((1,), (0,))))
        elif variant == "main_dot_sel":
            t2 = _dot(prev_ref[:], wr_ref[:], (((1,), (0,))))
            out = _dot(t2, sel_ref[:], (((1,), (0,))))
        elif variant == "x_dot_sel":
            x = _dot(x0_ref[:], r_ref[:], (((1,), (0,))))
            out = _dot(x, sel_ref[:], (((1,), (0,))))
        elif variant == "full":
            t2 = _dot(prev_ref[:], wr_ref[:], (((1,), (0,))))
            x = _dot(x0_ref[:], r_ref[:], (((1,), (0,))))
            out = _dot(t2 * x, sel_ref[:], (((1,), (0,))))
        out_ref[:] = out.astype(out_ref.dtype)

    @jax.jit
    def f(x0, prev, wr, r, sel):
        return pl.pallas_call(
            kern,
            grid=(M // TM,),
            in_specs=[
                pl.BlockSpec((TM, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, FK), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, FK), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((FK, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        )(x0, prev, wr, r, sel)
    return f


def main():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(M, F).astype(np.float32))
    prev = jnp.asarray(rng.randn(M, H).astype(np.float32))
    wr = jnp.asarray(rng.randn(H, FK).astype(np.float32) * 0.05)
    r = jnp.asarray(rng.randn(F, FK).astype(np.float32))
    sel = jnp.asarray(rng.randn(FK, K).astype(np.float32))

    for v in ["dot_small", "x_dot_sel", "main_dot_sel", "full"]:
        f = make(v)

        def step(c, f=f):
            out = f(c[0], c[1], wr, r, sel)
            return (c[0] + 1e-12 * out[:, :F], c[1] + 1e-12 * out[:, :H])
        timeit(v, step, (x0, prev))


if __name__ == "__main__":
    main()
