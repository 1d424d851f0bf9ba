"""Pallas one-hot line expand for the dense-grad scatter.

The dense update's scatter consumes (N, P*D) one-hot-masked lines built
from (N, D) grads.  The XLA formulation (broadcast-multiply-reshape,
sharded.py:_expand) gets assigned a layout the scatter then needs
transposed — the production HLO carries 2x ~54 MB bf16 copy/transpose
pairs per step on those lines (BASELINE.md r4 "Layout copies" finding),
which is the measured ~1.5 ms scatter->pass composition penalty.

This kernel materializes the SAME lines with a plain row-major output
(one MXU spread-dot + lane mask per tile), giving XLA a scatter operand
that needs no relayout.  Adopted only where the A/B probe
(tools/probe_expand_scatter.py) shows a win; falls back to the XLA
expand elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_kernel(g_ref, off_ref, out_ref, *, dim: int, width: int,
                   out_dtype):
    tile = g_ref.shape[0]
    # wide[n, l] = g[n, l % dim] via an exact 0/1 spread matrix on the
    # MXU (HIGHEST precision: bf16x3 reproduces f32 exactly for 0/1
    # factors)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (dim, width), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (dim, width), 1)
    spread = (l_iota % dim == d_iota).astype(jnp.float32)
    wide = jnp.dot(g_ref[:].astype(jnp.float32), spread,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 1)
    sel = (lane // dim == off_ref[:][:, None]).astype(jnp.float32)
    out_ref[:] = (wide * sel).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("pack", "dim", "out_dtype", "tile"))
def expand_lines(grads: jnp.ndarray, off: jnp.ndarray, *, pack: int,
                 dim: int, out_dtype=jnp.bfloat16,
                 tile: int = 2048) -> jnp.ndarray:
    """(N, D) grads + (N,) lane slots -> (N, pack*D) one-hot lines.

    Equivalent to ``one_hot(off, pack)[:, :, None] * grads[:, None, :]``
    reshaped to (N, pack*D), in the scatter's preferred layout.
    """
    if tile % 1024:
        # same Mosaic constraint as gather_kernel: 1-D s32 blocks below
        # XLA's T(1024) layout tile fail layout verification
        raise ValueError("tile must be a multiple of 1024")
    n = grads.shape[0]
    n_pad = -n % tile
    if n_pad:
        grads = jnp.pad(grads, ((0, n_pad), (0, 0)))
        off = jnp.pad(off, (0, n_pad))
    total = grads.shape[0]
    width = pack * dim
    out = pl.pallas_call(
        functools.partial(_expand_kernel, dim=dim, width=width,
                          out_dtype=out_dtype),
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, width), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(grads, off.astype(jnp.int32))
    return out[:n] if n_pad else out
