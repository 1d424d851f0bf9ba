"""STAR topology dense layers (per-sample / per-scene personalization).

Reference: rec_now/layers/star_dense_layer.py:14-311.

* :class:`StarDenseLayer` — per-sample kernels: a (B, D*U+U) parameter
  vector (usually looked up from an embedding table by scene id) is
  reshaped into a per-sample kernel that *multiplies* the trunk kernel.
  The reference warns the intermediate (B, D, U) kernel costs B x the
  dense kernel's memory (star_dense_layer.py:23-25); here the whole layer
  is one einsum ``bd,du,bdu->bu`` so XLA fuses the elementwise products
  into the contraction and the (B, D, U) product only ever exists as
  VMEM tiles.
* :class:`ParasiticStarDenseLayer` — per-scene (group) kernels selected
  by ``group_idx``, multiplied into a host dense layer's kernel.

Symbols: B batch, D in-dim, U out-dim.
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer)
from rec_now_tpu.core.shapes import wrap_as_list


class StarDenseLayer(nn.Module):
    """Dense layer whose kernel is trunk_kernel * per-sample star kernels."""
    units: int
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @classmethod
    def get_starnet_param_size(cls, units_in: int, units_out: int) -> int:
        """Embedding dim needed to carry one star net's (kernel, bias)."""
        return units_in * units_out + units_out

    @classmethod
    def get_starnet_kernel_initializer(cls):
        """Star kernels multiply the trunk -> initialize to ones."""
        return get_initializer("ones")

    @classmethod
    def get_starnet_bias_initializer(cls):
        return get_initializer("zeros")

    def _reshape_starnet_param(self, net_param: jnp.ndarray, dim_in: int):
        """(B, D*U+U) -> kernel (B, D, U), bias (B, 1, U)."""
        dim_out = self.units
        kernel = jnp.reshape(net_param[:, :dim_in * dim_out],
                             (-1, dim_in, dim_out))
        bias = jnp.reshape(net_param[:, dim_in * dim_out:],
                           (-1, 1, dim_out))
        return kernel, bias

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 starnet_param_list: Union[jnp.ndarray, List[jnp.ndarray]]
                 ) -> jnp.ndarray:
        """Compute the personalized dense layer.

        Args:
            inputs: (B, D).
            starnet_param_list: one or more (B, D*U+U) per-sample
                parameter vectors; kernels multiply, biases add.  Since
                kernel and bias share a ones-initialized embedding row,
                ``num_starnet`` is subtracted from the final bias
                (reference star_dense_layer.py:152-155).

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

        starnet_param_list = wrap_as_list(starnet_param_list)
        kernels, biases = [], []
        for p in starnet_param_list:
            k, b = self._reshape_starnet_param(p, dim_in)
            kernels.append(k)
            biases.append(b)

        star_kernel = kernels[0]
        for k in kernels[1:]:
            star_kernel = star_kernel * k                 # (B, D, U)
        bias_final = biases[0]
        for b in biases[1:]:
            bias_final = bias_final + b                   # (B, 1, U)
        if trunk_bias is not None:
            bias_final = bias_final + trunk_bias
        # kernel & bias live in one ones-initialized table row: correct
        # the bias init offset.
        bias_final = bias_final - float(len(starnet_param_list))

        # fused per-sample contraction: no (B, D, U) kernel in HBM.
        outputs = jnp.einsum("bd,du,bdu->bu", inputs, trunk_kernel,
                             star_kernel,
                             preferred_element_type=jnp.float32
                             ).astype(inputs.dtype)       # (B, U)
        outputs = outputs + jnp.squeeze(bias_final, axis=1)
        return get_activation(self.activation)(outputs)


class ParasiticStarDenseLayer(nn.Module):
    """Host dense layer + ``num_groups`` parasitic kernels (multiplied).

    The reference wraps an existing built keras Dense layer
    (star_dense_layer.py:179-215); here the trunk kernel/bias are owned
    by this module (Flax modules are pure), which keeps the same math and
    checkpoint surface.
    """
    units: int
    num_groups: int = 1
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"
    parasitic_kernel_initializer: Initializer = "ones"

    def _combine_kernel(self, trunk, parasitic):
        return trunk * parasitic

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 group_idx: Optional[int] = 0,
                 stop_trunk_grad: bool = False) -> jnp.ndarray:
        """Apply the group-personalized dense layer.

        Args:
            inputs: (B, D).
            group_idx: which parasitic group to use.  A Python int picks
                one group for the whole batch (the reference's per-scene
                semantics, star_dense_layer.py:273-289); an int array of
                shape (B,) routes each sample to its own group (mixed
                serving domains in one batch); None or a negative int
                uses only the trunk parameters.
            stop_trunk_grad: stop gradients into the trunk kernel/bias.

        Returns:
            (B, U).
        """
        dim_in = inputs.shape[-1]
        trunk_kernel = self.param("trunk_kernel",
                                  get_initializer(self.kernel_init),
                                  (dim_in, self.units))
        trunk_bias = (self.param("trunk_bias",
                                 get_initializer(self.bias_init),
                                 (self.units,))
                      if self.use_bias else None)
        parasitic_kernel = self.param(
            "parasitic_kernel",
            get_initializer(self.parasitic_kernel_initializer),
            (self.num_groups, dim_in, self.units))
        parasitic_bias = (self.param("parasitic_bias",
                                     get_initializer("zeros"),
                                     (self.num_groups, self.units))
                          if self.use_bias else None)

        kernel = trunk_kernel
        bias = trunk_bias
        if stop_trunk_grad:
            kernel = jax.lax.stop_gradient(kernel)
            if bias is not None:
                bias = jax.lax.stop_gradient(bias)
        only_trunk = group_idx is None or (
            isinstance(group_idx, int) and group_idx < 0)
        per_sample = (not only_trunk
                      and getattr(group_idx, "ndim", 0) >= 1)
        if per_sample:
            # per-sample routing: run every group's personalized dense
            # on the MXU and one-hot select.  G is small (serving
            # domains), so G batched matmuls beat gathering a
            # (B, D, U) per-sample kernel out of HBM.
            kernels = self._combine_kernel(kernel[None],
                                           parasitic_kernel)  # (G, D, U)
            outs = jnp.einsum("bd,gdu->gbu", inputs, kernels,
                              preferred_element_type=jnp.float32
                              ).astype(inputs.dtype)          # (G, B, U)
            oh = jax.nn.one_hot(group_idx, self.num_groups,
                                dtype=outs.dtype)             # (B, G)
            outputs = jnp.einsum("gbu,bg->bu", outs, oh)
            if bias is not None:
                outputs = outputs + oh @ (bias[None] + parasitic_bias)
            return get_activation(self.activation)(outputs)
        if not only_trunk:
            kernel = self._combine_kernel(kernel, parasitic_kernel[group_idx])
            if bias is not None:
                bias = bias + parasitic_bias[group_idx]

        outputs = inputs @ kernel
        if bias is not None:
            outputs = outputs + bias
        return get_activation(self.activation)(outputs)
