"""N same-shape Dense layers in one batched contraction.

Reference: rec_now/layers/multi_dense_layer.py:13-94.  The shared
acceleration primitive behind MMoE and PLE ("N experts with a single
matmul").  The contraction is routed through
:func:`rec_now_tpu.ops.multi_dense_apply` so the TPU path can use the
fused Pallas kernel.

Symbols: B batch, D in-dim, N experts, U out-dim.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer,
                                     glorot_uniform_nd)
from rec_now_tpu.ops.multi_dense_op import multi_dense_apply


class MultiDenseLayer(nn.Module):
    """Batched multi-expert dense: (B, D)|(N, B, D) -> (N, B, U)."""
    units: int
    num_dnn: int
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Apply the N experts.

        Args:
            inputs: (B, D) shared input or (N, B, D) per-expert input.

        Returns:
            (N, B, U).
        """
        if inputs.ndim == 2:
            inputs = inputs[None, :, :]                   # (1, B, D)
        if inputs.ndim != 3:
            raise ValueError(
                f"MultiDenseLayer expects rank-2 or rank-3 input, got "
                f"rank {inputs.ndim}")
        last_dim = inputs.shape[-1]
        kernel_init = (glorot_uniform_nd(1, 2)
                       if isinstance(self.kernel_init, str)
                       and self.kernel_init == "glorot_uniform"
                       else get_initializer(self.kernel_init))
        kernel = self.param("kernel", kernel_init,
                            (self.num_dnn, last_dim, self.units))  # (N, D, U)
        bias = None
        if self.use_bias:
            bias = self.param("bias", get_initializer(self.bias_init),
                              (self.num_dnn, 1, self.units))       # (N, 1, U)
        return multi_dense_apply(inputs, kernel, bias,
                                 get_activation(self.activation),
                                 use_pallas=self.use_pallas)
