"""Deep & Cross Network (DCN) cross layer.

Reference: rec_now/layers/dcn_layer.py:12-103:
``x_{l+1} = act(x0 * (x_l . w_l) + b_l)`` for ``degree_of_cross``
iterations (note: the reference intentionally omits the ``+ x_l``
residual of the original paper; we match that behavior).

The per-layer kernels are stored stacked as (L, D) / (L, D) so the whole
cross stack is two parameters; each iteration is a (B, D) x (D,) matvec
plus a fused elementwise pass — XLA keeps x in VMEM across iterations.

Symbols: B batch, D in-dim, L degree_of_cross.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer)


class DCNLayer(nn.Module):
    """DCN cross network."""
    degree_of_cross: int
    use_bias: bool = True
    activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Apply the cross stack.

        Args:
            inputs: (B, D).

        Returns:
            (B, D).
        """
        d = inputs.shape[-1]
        # one (D, 1)-equivalent kernel and (1, D) bias per cross degree,
        # stacked so the parameter tree stays flat.
        kernels = self.param("kernels", get_initializer(self.kernel_init),
                             (self.degree_of_cross, d, 1))
        biases = None
        if self.use_bias:
            biases = self.param("biases", get_initializer(self.bias_init),
                                (self.degree_of_cross, 1, d))
        act = get_activation(self.activation)

        x = inputs                                        # (B, D)
        for layer_idx in range(self.degree_of_cross):
            cross = x @ kernels[layer_idx]                # (B, 1)
            out = inputs * cross                          # (B, D)
            if biases is not None:
                out = out + biases[layer_idx]             # (B, D)
            x = act(out)
        return x
