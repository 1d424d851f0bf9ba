"""Pad-or-truncate to a static length.

Reference: rec_now/layers/fix_length_layer.py:81-110.  Under XLA all
shapes are static, so this is a trace-time pad/slice (see
rec_now_tpu/core/shapes.py).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.shapes import pad_or_truncate


class FixLengthLayer(nn.Module):
    """Normalize ``axis`` of the input to extent ``length``."""
    length: int
    axis: int = -1
    constant_values: float = 0

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return pad_or_truncate(inputs, self.length, self.axis,
                               self.constant_values)
