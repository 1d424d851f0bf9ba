"""Expand per-field weights to per-element weights.

Reference: rec_now/rec_block/embedding_wise_weight.py:13-36.  The
reference flattens the weight matrix and gathers with a computed flat
index; in JAX a static per-axis take does the same with no index
arithmetic — XLA lowers it to a layout-only broadcast.

Symbols: B batch, F fields, total_dim = sum of per-field dims.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np


def gather_embedding_element_wise_weight(
        embedding_weights: jnp.ndarray,
        pos_idx: Union[Sequence[int], np.ndarray]) -> jnp.ndarray:
    """Broadcast per-field weights (B, F) to per-element (B, total_dim).

    Args:
        embedding_weights: (B, F) per-field weights.
        pos_idx: length-total_dim static map position -> field index.

    Returns:
        (B, total_dim) per-element weights.
    """
    pos_idx = np.asarray(pos_idx, dtype=np.int32).reshape(-1)
    return jnp.take(embedding_weights, pos_idx, axis=-1)
