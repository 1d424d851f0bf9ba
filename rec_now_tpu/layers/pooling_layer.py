"""Combiner-dispatch pooling layer.

Reference: rec_now/layers/pooling_layer.py:12-68.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

_COMBINERS = {
    "mean": jnp.mean,
    "sum": jnp.sum,
    "max": jnp.max,
    "min": jnp.min,
}


def pool(inputs: jnp.ndarray, combiner: Optional[Union[str, Callable]],
         axis: Optional[int] = None, keepdims: bool = False) -> jnp.ndarray:
    """Functional pooling with combiner dispatch.

    Args:
        inputs: any array.
        combiner: None (identity), 'mean'/'sum'/'max'/'min', or callable.
        axis: reduction axis.
        keepdims: keep the reduced dimension.

    Returns:
        pooled array.
    """
    if combiner is None:
        return inputs
    if callable(combiner):
        return combiner(inputs)
    if combiner in _COMBINERS:
        return _COMBINERS[combiner](inputs, axis=axis, keepdims=keepdims)
    raise ValueError("combiner must be one of None, 'mean', 'sum', 'max', "
                     "'min' or a callable object")


class PoolingLayer(nn.Module):
    """Module wrapper over :func:`pool`.

    Example:
        PoolingLayer(axis=0, keepdims=True, combiner='sum')([[1, 2, 3],
        [10, 11, 12]]) == [[11, 13, 15]]
    """
    axis: Optional[int] = None
    keepdims: bool = False
    combiner: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        return pool(jnp.asarray(inputs), self.combiner, self.axis,
                    self.keepdims)
