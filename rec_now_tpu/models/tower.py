"""Plain DNN tower (Dense stack) used by every model family."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer)


class DNNTower(nn.Module):
    """MLP: Dense stack with activation on all but the last layer."""
    dims: Sequence[int]
    activation: Activation = "relu"
    final_activation: Activation = None
    kernel_init: Initializer = "glorot_uniform"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        kinit = get_initializer(self.kernel_init)
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim, kernel_init=kinit, name=f"dense_{i}")(x)
            if i < len(self.dims) - 1:
                x = act(x)
        return get_activation(self.final_activation)(x)
