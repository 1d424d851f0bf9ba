"""Measure this rig's actual HBM streaming bandwidth (scan-amortized).

BASELINE.md's 108 GB/s ceiling came from an early per-call measurement;
the adagrad dense pass later clocked ~184 GB/s effective, so the real
ceiling must be higher.  This tool streams a large buffer through the
simplest possible elementwise op (read + write) inside a ``lax.scan``
so dispatch overhead is amortized, at several sizes, plus a copy-free
reduction (read only).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_hbm.py
"""
import time

import jax
import jax.numpy as jnp

STEPS = 20


def timeit(name, fn, carry0, bytes_moved):
    @jax.jit
    def run(c0):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jnp.sum(jax.tree_util.tree_leaves(c)[0][:1])
    float(jax.device_get(run(carry0)))
    t0 = time.perf_counter()
    float(jax.device_get(run(carry0)))
    dt = (time.perf_counter() - t0) / STEPS
    gbps = bytes_moved / dt / 1e9
    print(f"{name:44s} {dt*1e3:8.3f} ms  {gbps:8.1f} GB/s", flush=True)


def main():
    # r+w only: a read-only reduce inside scan is loop-invariant and
    # XLA hoists it, so it cannot be measured this way
    for mb in (64, 256, 512):
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n // 128, 128), jnp.float32)
        timeit(f"r+w stream f32 {mb} MB (x+1)",
               lambda c: c + 1.0, x, 2 * n * 4)
    x = jnp.ones((512 * 1024 * 1024 // 2 // 128, 128), jnp.bfloat16)
    timeit("r+w stream bf16 512 MB (x+1)",
           lambda c: c + 1.0, x, 2 * x.size * 2)


if __name__ == "__main__":
    main()
