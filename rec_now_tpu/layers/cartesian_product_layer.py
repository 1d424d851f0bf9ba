"""Cartesian-product feature crossing — int-native TPU redesign.

Reference: rec_now/layers/cartesian_product_layer.py:12-183 casts every
input to *strings*, tiles, joins with a separator, and regex-replaces
invalid combinations.  Strings and RE2 do not exist on TPU; the same
capability — "cross n id lists into one id list, with invalid-member
filtering" — is re-built on integers:

* each input (B, Li) (or (B,) == (B, 1); batch-1 inputs broadcast) is
  tiled to the full cross (B, L1*...*Ln) exactly like the reference;
* the joined string is replaced by an order-sensitive hash
  combination (:func:`rec_now_tpu.ops.hashing.combine_hash`) — a
  collision-resistant stand-in for string concatenation that feeds
  directly into hash-trick embedding layers;
* ``invalid_value_list`` plays the role of ``invalid_pattern_list``: if
  input i's member equals its invalid value, the crossed id becomes
  ``default_result_id``.

Symbols: B batch, Li per-input lengths, P = prod(Li).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.ops.hashing import combine_hash, mix32


class CartesianProductLayer(nn.Module):
    """Cross n int-id tensors into (B, prod(Li)) combined ids."""

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray],
                 invalid_value_list: Optional[Sequence[Optional[int]]] = None,
                 default_result_id: int = 0) -> jnp.ndarray:
        """Compute the cartesian product of id lists.

        Args:
            inputs: list of int arrays shaped (B, Li), (B,), or with
                leading dim 1 (broadcast over the batch).
            invalid_value_list: same length as inputs; entry i is the id
                value marking input i's elements invalid (None = never).
                Any crossed tuple containing an invalid member maps to
                ``default_result_id`` — the int equivalent of the
                reference's regex replacement (:115-124).
            default_result_id: replacement id for invalid tuples.

        Returns:
            (B, prod(Li)) uint32 combined ids (feed into a hash-trick
            embedding such as FastMultiHashLayer).
        """
        if invalid_value_list is not None and \
                len(invalid_value_list) != len(inputs):
            raise ValueError("length not equal:%s v.s %s"
                             % (len(invalid_value_list), len(inputs)))

        # normalize to 2-D
        arrays = []
        batch = 1
        for x in inputs:
            x = jnp.asarray(x)
            if x.ndim == 0:
                x = x[None, None]
            elif x.ndim == 1:
                x = x[:, None]
            elif x.ndim > 2:
                x = jnp.reshape(x, (x.shape[0], -1))
            arrays.append(x)
            if x.shape[0] > batch:
                batch = x.shape[0]
        arrays = [jnp.broadcast_to(x, (batch, x.shape[1])) for x in arrays]

        dims = [x.shape[1] for x in arrays]
        n = len(arrays)

        # tile each input across the cross grid, then flatten to (B, P)
        tiled = []
        for idx, x in enumerate(arrays):
            shape = [batch] + [1] * n
            shape[1 + idx] = dims[idx]
            x = jnp.reshape(x, shape)
            full = [batch] + dims
            x = jnp.broadcast_to(x, full)
            tiled.append(jnp.reshape(x, (batch, -1)))     # (B, P)

        result = mix32(tiled[0].astype(jnp.uint32))
        for x in tiled[1:]:
            result = combine_hash(result, x)

        if invalid_value_list is not None:
            invalid = jnp.zeros(tiled[0].shape, dtype=bool)
            for x, bad in zip(tiled, invalid_value_list):
                if bad is None:
                    continue
                invalid = jnp.logical_or(invalid, x == bad)
            result = jnp.where(
                invalid, jnp.uint32(default_result_id), result)
        return result
