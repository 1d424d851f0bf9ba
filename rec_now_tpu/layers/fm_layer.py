"""Factorization Machines second-order interaction layer.

Reference: rec_now/layers/fm_layer.py:12-42 (sum-square minus square-sum
trick).  Pure elementwise/reduction math — XLA fuses the whole layer into
one VPU pass; no parameters.

Symbols: B batch, F fields, D embedding dim.
"""
from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp
from flax import linen as nn


class FMLayer(nn.Module):
    """FM second-order cross: ``0.5 * sum((sum_f e_f)^2 - sum_f e_f^2)``."""

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, List[jnp.ndarray]]
                 ) -> jnp.ndarray:
        """Compute the FM second-order term.

        Args:
            inputs: list of F field embeddings each (B, D), or a stacked
                (B, F, D) tensor.

        Returns:
            (B, 1) second-order interaction score.
        """
        if isinstance(inputs, (list, tuple)):
            stacked = jnp.stack(inputs, axis=1)           # (B, F, D)
        else:
            stacked = inputs                              # (B, F, D)
        summed = jnp.sum(stacked, axis=1)                 # (B, D)
        summed_square = jnp.square(summed)                # (B, D)
        square_sum = jnp.sum(jnp.square(stacked), axis=1)  # (B, D)
        second_order = summed_square - square_sum         # (B, D)
        return 0.5 * jnp.sum(second_order, axis=1, keepdims=True)  # (B, 1)
