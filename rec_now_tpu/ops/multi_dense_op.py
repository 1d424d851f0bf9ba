"""Batched multi-expert dense: the shared acceleration primitive.

The reference computes N same-shape Dense layers with one batched
``tf.matmul`` (rec_now/layers/multi_dense_layer.py:88-93) — the hot loop
of MMoE and PLE (SURVEY.md §3.4).  On TPU this contraction
``(N, B, D) x (N, D, U) -> (N, B, U)`` maps directly onto the MXU as a
batched matmul; the default path simply expresses it so XLA tiles it.
A Pallas kernel (:func:`multi_dense_pallas`) fuses the bias add and
activation into the same VMEM pass for the bandwidth-bound small-expert
shapes; it is used automatically on TPU when shapes are tile-aligned.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def multi_dense_xla(inputs: jnp.ndarray,
                    kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray],
                    activation: Optional[Callable]) -> jnp.ndarray:
    """(1|N, B, D) x (N, D, U) [+ (N, 1, U)] with fused activation."""
    if inputs.shape[0] == kernel.shape[0]:
        outputs = jax.lax.dot_general(
            inputs, kernel,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:  # shared (1, B, D) input broadcast over the N experts
        outputs = jnp.einsum("bd,ndu->nbu", inputs[0], kernel,
                             preferred_element_type=jnp.float32)
    outputs = outputs.astype(inputs.dtype)
    if bias is not None:
        outputs = outputs + bias
    if activation is not None:
        outputs = activation(outputs)
    return outputs


@functools.partial(jax.jit, static_argnames=("activation",))
def _multi_dense_jit(inputs, kernel, bias, activation):
    return multi_dense_xla(inputs, kernel, bias, activation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _multi_dense_fused(inputs, kernel, bias, activation):
    """Pallas forward with an XLA-derived backward.

    pallas_call has no automatic autodiff; the backward differentiates
    the mathematically identical XLA formulation at the saved inputs —
    batched matmuls XLA already schedules optimally, so only the
    forward (where the fused bias+activation epilogue saves an HBM
    round trip) needs the custom kernel.
    """
    from rec_now_tpu.ops.pallas.multi_dense_kernel import (
        multi_dense_pallas)
    return multi_dense_pallas(inputs, kernel, bias, activation)


def _multi_dense_fused_fwd(inputs, kernel, bias, activation):
    return (_multi_dense_fused(inputs, kernel, bias, activation),
            (inputs, kernel, bias))


def _multi_dense_fused_bwd(activation, residuals, g):
    inputs, kernel, bias = residuals
    _, vjp = jax.vjp(
        lambda i, k, b: multi_dense_xla(i, k, b, activation),
        inputs, kernel, bias)
    return vjp(g)


_multi_dense_fused.defvjp(_multi_dense_fused_fwd,
                          _multi_dense_fused_bwd)


def multi_dense_apply(inputs: jnp.ndarray,
                      kernel: jnp.ndarray,
                      bias: Optional[jnp.ndarray] = None,
                      activation: Optional[Callable] = None,
                      use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Apply N experts in one contraction.

    Args:
        inputs: (B, D) shared input or (N, B, D) per-expert inputs.
        kernel: (N, D, U).
        bias: optional (N, 1, U).
        activation: optional fused activation callable.
        use_pallas: force the Pallas kernel on/off; None = auto.

    Returns:
        (N, B, U).
    """
    if inputs.ndim == 2:
        inputs = inputs[None, :, :]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        if bias is None:  # concrete zeros so the VJP pytree is uniform
            bias = jnp.zeros((kernel.shape[0], 1, kernel.shape[2]),
                             kernel.dtype)
        return _multi_dense_fused(inputs, kernel, bias, activation)
    return multi_dense_xla(inputs, kernel, bias, activation)
