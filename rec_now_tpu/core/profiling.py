"""Profiling and numerical-guard utilities.

TPU-native replacements for the reference's absent observability layer
(SURVEY.md §5): ``jax.profiler`` trace capture for perfetto,
``named_scope`` annotations that show up in traces, and NaN/Inf guards
(XLA SPMD is data-race-free by construction, so the "sanitizer" surface
a CUDA framework would need reduces to numerics checks).
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace (open with perfetto / tensorboard).

    Example:
        with trace("/tmp/trace"):
            state, _ = trainer.train_step(state, *args)
            jax.block_until_ready(state.table.table)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator adding a named scope visible in profiler traces."""
    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)
        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped
    return deco


def guard_finite(x: jnp.ndarray, name: str = "tensor",
                 enabled: bool = True) -> jnp.ndarray:
    """Raise (via jax.debug callback-free checkify-lite) on NaN/Inf.

    Uses ``jax.debug.print`` so it works under jit without host sync on
    the happy path; for hard failure semantics wrap the train step in
    ``jax.experimental.checkify``.

    Returns ``x`` unchanged.
    """
    if not enabled:
        return x
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print(
            "[guard_finite] non-finite values in " + name
            + " min={mn} max={mx}", mn=jnp.nanmin(x), mx=jnp.nanmax(x)),
        lambda: None)
    return x


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Bytes in use / limit for a device (HBM watermark telemetry)."""
    if device is None:
        device = jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
        "bytes_limit": stats.get("bytes_limit", -1),
    }
