"""Static-shape helpers.

TPU-native equivalents of the reference's shape utilities:

* ``pad_or_truncate`` — reference: rec_now/layers/fix_length_layer.py:37-78.
  The reference normalizes dynamically-shaped ragged features (e.g. click
  history) to a static length with ``tf.slice``/``tf.pad`` under
  ``tf.function``.  Under XLA every shape is already static at trace time,
  so this becomes a pure compile-time pad/slice — zero runtime dispatch.
* ``wrap_as_list`` — reference: rec_now/util/param_normalizer.py:10-24.
"""
from __future__ import annotations

import jax.numpy as jnp


def wrap_as_list(inputs):
    """Wrap ``inputs`` in a list unless it already is one."""
    if not isinstance(inputs, list):
        inputs = [inputs]
    return inputs


def pad_or_truncate(tensor: jnp.ndarray, length: int, axis: int = -1,
                    constant_values=0) -> jnp.ndarray:
    """Pad (at the end) or truncate ``axis`` of ``tensor`` to ``length``.

    Shapes are static under jit, so the branch resolves at trace time.

    Args:
        tensor: input array.
        length: target static length of ``axis``.
        axis: axis to normalize.
        constant_values: fill value used when padding.

    Returns:
        Array whose ``axis`` has extent exactly ``length``.
    """
    length = int(length)
    rank = tensor.ndim
    axis = axis % rank
    origin_length = tensor.shape[axis]

    if length < origin_length:
        index = [slice(None)] * rank
        index[axis] = slice(0, length)
        return tensor[tuple(index)]
    if length > origin_length:
        pad_width = [(0, 0)] * rank
        pad_width[axis] = (0, length - origin_length)
        return jnp.pad(tensor, pad_width, constant_values=constant_values)
    return tensor
