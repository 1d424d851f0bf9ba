"""Co-Action Network (CAN) layer.

Reference: rec_now/layers/can_layer.py:17-275.  A second input tensor
``dnn_params (B, size)`` provides *per-sample MLP weights* which are
sliced per layer and applied to ``inputs (B, L, D0)``; all-zero
(padding) embeddings are masked out; the L axis is pooled by a combiner.

The per-sample matmul ``(B, L, 1, Din) @ (B, 1, Din, Dout)`` is a batched
MXU contraction via broadcasting ``jnp.matmul``; parameter slicing is
static so the whole layer jits to one fused region.

Symbols: B batch, L co-action inputs per sample, D0 input dim,
D1..Dn layer dims, size_dnn_param total parameter count.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Activation, get_activation
from rec_now_tpu.layers.pooling_layer import pool

CAN_EXPANDED_INPUT_DIM = 4


def _layer_param_size(dim_in: int, dim_out: int, use_bias: bool) -> int:
    size = dim_in * dim_out
    if use_bias:
        size += dim_out
    return size


class CANLayer(nn.Module):
    """Apply a per-sample-parameterized DNN to co-action inputs."""
    dnn_dims: Optional[Sequence[int]] = None
    activation: Activation = "tanh"
    use_bias: bool = True
    use_res_net: bool = False
    output_layer_use_activation: bool = False
    output_combiner: Optional[str] = "sum"
    mask_all_zero_embedding: bool = True

    @classmethod
    def get_dnn_param_size(cls, input_dim: int, dnn_dims: Sequence[int],
                           use_bias: bool = True) -> int:
        """Total parameter count of the per-sample DNN.

        Used as the embedding dim of the co-action parameter table.
        """
        dims = [input_dim] + list(dnn_dims)
        return sum(_layer_param_size(dims[i - 1], dims[i], use_bias)
                   for i in range(1, len(dims)))

    def _auto_decide_dnn_dims(self, input_dim: int,
                              total_param_size: int) -> List[int]:
        """Infer layer count assuming every layer keeps the input dim.

        Reference: can_layer.py:109-133.
        """
        one_layer = _layer_param_size(input_dim, input_dim, self.use_bias)
        n_layer = float(total_param_size) / one_layer
        if math.floor(n_layer) != n_layer:
            raise ValueError(
                f"dnn_param_size not match! input_dim: {input_dim}, "
                f"total_param_size: {total_param_size}, "
                f"use_bias:{self.use_bias}, "
                f"one_layer_param_size(auto decide): {one_layer}")
        return [input_dim] * int(n_layer)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 dnn_params: jnp.ndarray) -> jnp.ndarray:
        """Run the co-action network.

        Args:
            inputs: (B, L, D0) or (B, D0) co-action target embeddings
                (all-zero rows are treated as padding).
            dnn_params: (B, size_dnn_param) per-sample DNN parameters.

        Returns:
            combiner set:   (B, Dn)
            combiner None:  (B, L, Dn) for 3-D input, (B, Dn) for 2-D.
        """
        dim_in = int(inputs.shape[-1])
        input_was_2d = inputs.ndim == 2
        while inputs.ndim < CAN_EXPANDED_INPUT_DIM:
            inputs = jnp.expand_dims(inputs, axis=inputs.ndim - 1)
        # inputs: (B, L, 1, D0)

        size_dnn_param = int(dnn_params.shape[-1])
        dnn_dims = (list(self.dnn_dims) if self.dnn_dims is not None
                    else self._auto_decide_dnn_dims(dim_in, size_dnn_param))
        expected = self.get_dnn_param_size(dim_in, dnn_dims, self.use_bias)
        if expected != size_dnn_param:
            raise ValueError(
                f"dnn_param_size not match! input_dim: {dim_in}, expected "
                f"total_param_size: {size_dnn_param},\nuse_bias:"
                f"{self.use_bias}, dnn_dims: {dnn_dims}, calculated "
                f"total_param_size: {expected}")

        act = get_activation(self.activation)
        offset = 0
        layer_input = inputs                              # (B, L, 1, Din)
        cur_in = dim_in
        for layer_idx, dim_out in enumerate(dnn_dims):
            size_kernel = cur_in * dim_out
            kernel = jnp.reshape(
                dnn_params[:, offset:offset + size_kernel],
                (-1, 1, cur_in, dim_out))                 # (B, 1, Din, Dout)
            offset += size_kernel
            layer_output = jnp.matmul(
                layer_input, kernel,
                preferred_element_type=jnp.float32
            ).astype(inputs.dtype)                        # (B, L, 1, Dout)
            if self.use_bias:
                bias = jnp.reshape(dnn_params[:, offset:offset + dim_out],
                                   (-1, 1, 1, dim_out))
                offset += dim_out
                layer_output = layer_output + bias
            is_last = layer_idx == len(dnn_dims) - 1
            if self.output_layer_use_activation or not is_last:
                layer_output = act(layer_output)
            if self.use_res_net:
                layer_output = layer_input + layer_output
            cur_in = dim_out
            layer_input = layer_output

        outputs = layer_input                             # (B, L, 1, Dn)
        if self.mask_all_zero_embedding:
            mask = jnp.any(inputs != 0.0, axis=-1, keepdims=True)
            outputs = outputs * mask.astype(outputs.dtype)

        outputs = jnp.squeeze(outputs, axis=-2)           # (B, L, Dn)
        if input_was_2d:
            return jnp.squeeze(outputs, axis=1)           # (B, Dn)
        if self.output_combiner is not None:
            return pool(outputs, self.output_combiner, axis=1,
                        keepdims=False)                   # (B, Dn)
        return outputs
