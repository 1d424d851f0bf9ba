"""Stacked (additive-personalized) dense layers.

Reference: rec_now/layers/stacked_dense_layer.py:16-205.  Same shapes as
the STAR variants but the personalized kernel is *added* (residual) to
the trunk kernel with a ``resnet_weight`` scale, so per-scene parameters
are zero-initialized.

Symbols: B batch, D in-dim, U out-dim.
"""
from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer)
from rec_now_tpu.core.shapes import wrap_as_list
from rec_now_tpu.layers.star_dense_layer import ParasiticStarDenseLayer


class StackedDenseLayer(nn.Module):
    """Dense layer with additive per-sample personalized parameters."""
    units: int
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @classmethod
    def get_resnet_param_size(cls, units_in: int, units_out: int) -> int:
        """Embedding dim carrying one personalized (kernel, bias)."""
        return units_in * units_out + units_out

    @classmethod
    def get_resnet_kernel_initializer(cls):
        """Personalized kernels add to the trunk -> initialize to zeros."""
        return get_initializer("zeros")

    @classmethod
    def get_resnet_bias_initializer(cls):
        return get_initializer("zeros")

    def _reshape_resnet_param(self, net_param: jnp.ndarray, dim_in: int):
        """(B, D*U+U) -> kernel (B, D, U), bias (B, 1, U)."""
        dim_out = self.units
        kernel = jnp.reshape(net_param[:, :dim_in * dim_out],
                             (-1, dim_in, dim_out))
        bias = jnp.reshape(net_param[:, dim_in * dim_out:],
                           (-1, 1, dim_out))
        return kernel, bias

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 resnet_param_list: Union[jnp.ndarray, List[jnp.ndarray]],
                 resnet_weight: float = 1.0) -> jnp.ndarray:
        """outputs = act(inputs @ (trunk + sum(res_kernels)) + biases).

        Args:
            inputs: (B, D).
            resnet_param_list: one or more (B, D*U+U) per-sample vectors.
            resnet_weight: scale on the personalized parameters.

        Returns:
            (B, U).
        """
        dim_in = inputs.shape[-1]
        trunk_kernel = self.param("kernel",
                                  get_initializer(self.kernel_init),
                                  (dim_in, self.units))
        trunk_bias = (self.param("bias", get_initializer(self.bias_init),
                                 (self.units,))
                      if self.use_bias else None)

        resnet_param_list = wrap_as_list(resnet_param_list)
        kernels, biases = [], []
        for p in resnet_param_list:
            k, b = self._reshape_resnet_param(p, dim_in)
            kernels.append(k)
            biases.append(b)
        kernel_final = sum(kernels[1:], kernels[0])       # (B, D, U)
        bias_final = sum(biases[1:], biases[0])           # (B, 1, U)

        if resnet_weight != 1.0:
            kernel_final = resnet_weight * kernel_final
            bias_final = resnet_weight * bias_final

        kernel_final = kernel_final + trunk_kernel[None, :, :]
        if trunk_bias is not None:
            bias_final = bias_final + trunk_bias

        outputs = jnp.einsum("bd,bdu->bu", inputs, kernel_final,
                             preferred_element_type=jnp.float32
                             ).astype(inputs.dtype)       # (B, U)
        outputs = outputs + jnp.squeeze(bias_final, axis=1)
        return get_activation(self.activation)(outputs)


class ParasiticStackedDenseLayer(ParasiticStarDenseLayer):
    """Additive parasitic variant: kernel added instead of multiplied.

    Reference: stacked_dense_layer.py:158-205.  Parasitic kernels are
    zero-initialized.
    """
    parasitic_kernel_initializer: Initializer = "zeros"

    def _combine_kernel(self, trunk, parasitic):
        return trunk + parasitic
