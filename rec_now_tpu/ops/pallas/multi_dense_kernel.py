"""Batched multi-expert dense as a Pallas TPU kernel.

(N, B, D) x (N, D, U) + (N, 1, U) with the bias add and activation fused
into the same VMEM pass as the MXU matmul — the reference's "N experts
in one tf.matmul" primitive (rec_now/layers/multi_dense_layer.py:88-93)
with the elementwise epilogue guaranteed fused.  Used by MMoE/PLE expert
banks where U is small (32-256) and the op is HBM-bandwidth-bound, so
avoiding a separate bias/activation pass matters.

Only f32/bf16 inputs with MXU-friendly shapes go through the kernel;
other cases fall back to the XLA path in ops.multi_dense_op.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mde_kernel(x_ref, w_ref, b_ref, out_ref, *, activation):
    """One (expert, B-tile): matmul + bias + activation in VMEM."""
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (TB, U)
    acc = acc + b_ref[0]
    if activation is not None:
        acc = activation(acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_tile_b(b: int, d: int, u: int,
                 vmem_budget: int = 8 * 1024 * 1024) -> int:
    tile = 2048
    while tile > 8:
        need = (tile * d + d * u + tile * u) * 4
        if need <= vmem_budget:
            return min(tile, b)
        tile //= 2
    return tile


def multi_dense_pallas(inputs: jnp.ndarray,
                       kernel: jnp.ndarray,
                       bias: Optional[jnp.ndarray],
                       activation: Optional[Callable]) -> jnp.ndarray:
    """Fused multi-expert dense.

    Args:
        inputs: (1 | N, B, D).
        kernel: (N, D, U).
        bias: (N, 1, U) or None.
        activation: fused epilogue callable or None.

    Returns:
        (N, B, U).
    """
    n, d, u = kernel.shape
    if inputs.shape[0] == 1 and n > 1:
        inputs = jnp.broadcast_to(inputs, (n,) + inputs.shape[1:])
    b = inputs.shape[1]
    if bias is None:
        bias = jnp.zeros((n, 1, u), kernel.dtype)

    tile_b = _pick_tile_b(b, d, u)
    pad = -b % tile_b
    if pad:
        inputs = jnp.pad(inputs, ((0, 0), (0, pad), (0, 0)))
    bp = inputs.shape[1]

    out = pl.pallas_call(
        functools.partial(_mde_kernel, activation=activation),
        grid=(n, bp // tile_b),
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, u), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, u), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, u), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, bp, u), inputs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * bp * d * u,
            bytes_accessed=(n * bp * d + n * d * u + n * bp * u) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(inputs, kernel, bias)
    if pad:
        out = out[:, :b]
    return out
