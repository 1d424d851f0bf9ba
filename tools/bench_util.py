"""Shared scan-amortized probe harness for the tools/ measurements.

One canonical implementation of the measurement discipline BASELINE.md
relies on (carry-dependent bodies so XLA's while-loop LICM cannot hoist
the work; fetch-forced completion; compile excluded; per-step ms):
older tools (roofline.py, probe_fused_update.py, micro_*.py) carry
their own historical copies — their recorded numbers must stay
reproducible against the exact code that measured them — but new
probes should import from here.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def scan_timeit(name: str, step_fn, carry0, steps: int = 20,
                results: list = None):
    """Scan-amortized best-effort ms/step for ``step_fn`` (1 rep).

    ``step_fn(carry) -> carry`` must thread a data dependence through
    the carry (e.g. ``s + jnp.sum(out) * 1e-20``) — see
    tools/roofline.py's probe-validity note.
    """
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=steps)
        return jnp.sum(jax.tree_util.tree_leaves(c)[-1])
    float(jax.device_get(run(carry0)))          # compile
    t0 = time.perf_counter()
    float(jax.device_get(run(carry0)))          # fetch-forced
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    if results is not None:
        results.append({"name": name, "ms": round(dt, 3)})
    return dt
