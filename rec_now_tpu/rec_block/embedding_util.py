"""Slot / segment embedding utilities — static-shape feature ingestion.

Re-design of rec_now/rec_block/embedding_util.py (586 LoC), the glue
between a parameter-server-style ragged feature format and dense
interaction towers.  Features arrive as aligned matrices
``(slots[B, C], ids[B, C], weights[B, C])`` — each row holds up to C
(slot, id, weight) triples.

The reference leans on dynamic-shape TF ops everywhere:
``tf.lookup.StaticHashTable`` (:122,181), ``tf.boolean_mask``
(:190,304), ``tf.unique`` (:306), ``tf.RaggedTensor`` (:400,406).  None
of those compile under XLA/jit without host sync.  The same semantics are
rebuilt on three static primitives:

* slot -> target index: a compare-and-sum over the (small, static)
  target-slot list instead of a hash table;
* pooling: ``jax.ops.segment_sum`` with a *drop bucket* — invalid
  positions get segment id ``num_segments`` and the extra row is sliced
  off, replacing boolean_mask compaction;
* per-slot padding (ragged -> (B, ncols, D)): the position of each hit
  within its row is its masked cumsum; a second segment-scatter lands the
  values in their padded slots.  Overflow past ``ncols`` is truncated —
  identical to RaggedTensor.to_tensor(shape=(B, ncols)).

On-device ``unique`` dedup before lookup (:306-311) is intentionally
dropped on the local path: a gather from HBM costs the same with or
without duplicated rows on TPU.  Dedup reappears where it pays — per
shard, to cut the all-to-all payload of the distributed lookup (see
rec_now_tpu/embedding/sharded.py).

Symbols: B batch, C columns per row, T target slots, D embedding dim.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# membership / dedup helpers
# --------------------------------------------------------------------------

def isin(values: jnp.ndarray, target_values: Sequence) -> jnp.ndarray:
    """Like np.isin: True where ``values`` is one of ``target_values``.

    Reference: embedding_util.py:11-35 (StaticHashTable membership).
    ``target_values`` is a static Python list/array — the membership test
    unrolls to T vectorized compares.

    Example:
        isin([[0, 1, 2]], [1, 2]) -> [[False, True, True]]
    """
    values = jnp.asarray(values)
    targets = np.asarray(target_values).reshape(-1)
    result = jnp.zeros(values.shape, dtype=bool)
    for t in targets:
        result = jnp.logical_or(result, values == t)
    return result


def mask_values(values: jnp.ndarray, target_values: Sequence,
                padding_value=0) -> jnp.ndarray:
    """Keep values in ``target_values``; replace others with padding.

    Reference: embedding_util.py:38-50.
    """
    values = jnp.asarray(values)
    return jnp.where(isin(values, target_values), values,
                     jnp.asarray(padding_value, dtype=values.dtype))


def first_occurance_in_row(mat: jnp.ndarray, need_sort: bool = False,
                           padding_value=0) -> jnp.ndarray:
    """Keep only the first occurrence of each (adjacent) value per row.

    Reference: embedding_util.py:53-82 (shifted-compare dedup; already
    static-shape in the reference, direct port).

    Example:
        first_occurance_in_row([[0, 1, 1, 2]], padding_value=-1)
            -> [[0, 1, -1, 2]]
    """
    mat = jnp.asarray(mat)
    if mat.ndim != 2:
        raise ValueError(f"mat must be 2D tensor, get {mat.ndim}D tensor")
    if need_sort:
        mat = jnp.sort(mat, axis=-1)
    keep = mat[:, :-1] != mat[:, 1:]
    right = jnp.where(keep, mat[:, 1:],
                      jnp.asarray(padding_value, dtype=mat.dtype))
    return jnp.concatenate([mat[:, 0:1], right], axis=-1)


# --------------------------------------------------------------------------
# slot -> segment-id mapping
# --------------------------------------------------------------------------

def _slot_to_target_idx(slots: jnp.ndarray,
                        target_slots: Sequence) -> jnp.ndarray:
    """Map each slot value to its index in ``target_slots`` (-1 if absent).

    Static replacement for the reference's StaticHashTable lookup
    (embedding_util.py:120-125).
    """
    slots = jnp.asarray(slots)
    idx = jnp.full(slots.shape, -1, dtype=jnp.int32)
    for i, t in enumerate(list(target_slots)):
        idx = jnp.where(slots == t, jnp.int32(i), idx)
    return idx


def batch_segment_ids_of_targets(slots: jnp.ndarray,
                                 target_slots: Sequence
                                 ) -> Tuple[jnp.ndarray, int, int, int]:
    """Per-element batch segment ids for target slots (-1 for others).

    Reference: embedding_util.py:85-134.

    Example:
        slots = [[0, 1, 1, 2, 3, 3], [1, 3, 3, 2, 5, 5]],
        target_slots = [1, 3, 5] ->
            [[-1, 0, 0, -1, 1, 1], [3, 4, 4, -1, 5, 5]]

    Returns:
        (batch_segment_ids (B, C), num_rows, num_ids, num_segments).
    """
    slots = jnp.asarray(slots)
    segment_ids = _slot_to_target_idx(slots, target_slots)
    num_rows = slots.shape[0]
    num_ids = len(list(target_slots))
    row_shift = num_ids * jnp.arange(num_rows, dtype=jnp.int32)[:, None]
    row_shift = row_shift * (segment_ids >= 0).astype(jnp.int32)
    return segment_ids + row_shift, num_rows, num_ids, num_rows * num_ids


def sparse_batch_segment_ids_of_targets(slots: jnp.ndarray,
                                        target_slots: Sequence):
    """Mask + flat segment ids for target slots.

    Reference: embedding_util.py:137-195.  The reference compacts with
    ``boolean_mask`` into a dynamically-sized vector; the static
    equivalent keeps the full (B*C,) id vector and routes invalid
    entries to the drop bucket ``num_segments`` (callers allocate
    ``num_segments + 1`` segments and slice).

    Returns:
        (mask (B, C) bool, flat_segment_ids (B*C,) with drop bucket,
         num_rows, num_ids, num_segments).
    """
    slots = jnp.asarray(slots)
    batch_ids, num_rows, num_ids, num_segments = \
        batch_segment_ids_of_targets(slots, target_slots)
    mask = batch_ids >= 0
    flat = jnp.where(mask, batch_ids, num_segments).reshape(-1)
    return mask, flat, num_rows, num_ids, num_segments


# --------------------------------------------------------------------------
# pooled embedding of target slots
# --------------------------------------------------------------------------

def embedding_using_batch_segment_ids(
        embedding_func: Callable[[jnp.ndarray], jnp.ndarray],
        slots: jnp.ndarray,
        target_slots: Sequence,
        ids: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        method: str = "sum") -> jnp.ndarray:
    """Embed ids and pool per (row, target slot) -> (B, T, D).

    Reference: embedding_util.py:198-215 and :239-324 (the main path).
    Static pipeline: zero out non-target ids, embed everything, weight,
    segment-reduce into B*T+1 segments (last = drop), reshape.

    Args:
        embedding_func: maps an int id vector to (N, D) embeddings.
        slots: (B, C) slot of each id.
        target_slots: static list of T slots to extract.
        ids: (B, C) ids.
        weights: optional (B, C) per-id weights.
        method: 'sum' or 'mean' pooling.

    Returns:
        (B, T, D) pooled embeddings; empty (row, slot) groups are zero
        ('mean' divides by the count, zero counts yield zero).
    """
    mask, flat_seg, num_rows, num_ids, num_segments = \
        sparse_batch_segment_ids_of_targets(slots, target_slots)
    flat_mask = mask.reshape(-1)
    flat_ids = jnp.where(flat_mask, jnp.asarray(ids).reshape(-1), 0)

    embeddings = embedding_func(flat_ids)                 # (B*C, D)
    embeddings = embeddings * flat_mask[:, None].astype(embeddings.dtype)
    if weights is not None:
        embeddings = embeddings * jnp.asarray(weights).reshape(-1)[:, None]

    summed = jax.ops.segment_sum(embeddings, flat_seg,
                                 num_segments=num_segments + 1)
    if method == "mean":
        counts = jax.ops.segment_sum(flat_mask.astype(embeddings.dtype),
                                     flat_seg,
                                     num_segments=num_segments + 1)
        summed = summed / jnp.maximum(counts, 1.0)[:, None]
    elif method != "sum":
        raise ValueError(f"not support {method!r}")
    pooled = summed[:num_segments]                        # drop bucket off
    return pooled.reshape(num_rows, num_ids, -1)          # (B, T, D)


# the reference exposes the same computation under three names
# (v0/v1/sparse — embedding_util.py:198,218,239); the static pipeline is
# one implementation.
embedding_using_sparse_batch_segment_ids = embedding_using_batch_segment_ids
embedding_using_sparse_batch_segment_ids_v1 = embedding_using_batch_segment_ids


# --------------------------------------------------------------------------
# non-pooled (padded) single-slot extraction
# --------------------------------------------------------------------------

def _position_in_row(mask: jnp.ndarray) -> jnp.ndarray:
    """0-based position of each True within its row (garbage where False)."""
    return jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1


def _scatter_to_padded(values: jnp.ndarray, mask: jnp.ndarray,
                       ncols: int, default_value=0.0) -> jnp.ndarray:
    """Scatter row-wise hits into (B, ncols, ...) padded layout.

    values: (B, C, ...) aligned with mask (B, C).  Hits beyond ncols per
    row are truncated (RaggedTensor.to_tensor(shape=[B, ncols]) parity).
    """
    b, c = mask.shape
    pos = _position_in_row(mask)                          # (B, C)
    valid = jnp.logical_and(mask, pos < ncols)
    dest = jnp.where(valid,
                     jnp.arange(b, dtype=jnp.int32)[:, None] * ncols + pos,
                     b * ncols)                           # drop bucket
    flat_vals = values.reshape((b * c,) + values.shape[2:])
    flat_vals = flat_vals * valid.reshape(-1).astype(flat_vals.dtype).reshape(
        (-1,) + (1,) * (flat_vals.ndim - 1))
    out = jax.ops.segment_sum(flat_vals, dest.reshape(-1),
                              num_segments=b * ncols + 1)[:b * ncols]
    out = out.reshape((b, ncols) + values.shape[2:])
    if default_value != 0.0:
        hit = jax.ops.segment_sum(
            valid.reshape(-1).astype(jnp.float32), dest.reshape(-1),
            num_segments=b * ncols + 1)[:b * ncols].reshape(b, ncols)
        fill_shape = (b, ncols) + (1,) * (values.ndim - 2)
        fill = (1.0 - hit).reshape(fill_shape)
        out = out + jnp.asarray(default_value, out.dtype) * fill.astype(
            out.dtype)
    return out


def embedding_single_slot(
        embedding_func: Callable[[jnp.ndarray], jnp.ndarray],
        slots: jnp.ndarray,
        target_slot,
        ids: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        default_weight: float = 0.0,
        ncols: Optional[int] = None):
    """A slot's embeddings without pooling -> padded (B, ncols, D).

    Reference: embedding_util.py:327-416 (RaggedTensor path).

    Args:
        embedding_func: id vector -> (N, D).
        slots, ids, weights: (B, C) feature triples.
        target_slot: the single slot to extract.
        default_weight: fill for missing weights.
        ncols: static padded length (required; the reference could infer
            it dynamically, which has no static-shape analogue).

    Returns:
        (embedding (B, ncols, D), weights (B, ncols, 1) or None,
         mask (B, ncols, 1) bool).
    """
    if ncols is None:
        raise ValueError("ncols must be set (static shape required)")
    slots = jnp.asarray(slots)
    ids = jnp.asarray(ids)
    mask = slots == target_slot                           # (B, C)

    flat_ids = jnp.where(mask.reshape(-1), ids.reshape(-1), 0)
    emb = embedding_func(flat_ids)                        # (B*C, D)
    emb = emb.reshape(ids.shape[0], ids.shape[1], -1)     # (B, C, D)
    embedding_tensor = _scatter_to_padded(emb, mask, ncols)

    weights_tensor = None
    if weights is not None:
        w = jnp.asarray(weights)[..., None]               # (B, C, 1)
        weights_tensor = _scatter_to_padded(w, mask, ncols,
                                            default_value=default_weight)
    ones = jnp.ones(mask.shape + (1,), dtype=jnp.float32)
    mask_tensor = _scatter_to_padded(ones, mask, ncols) > 0.5
    return embedding_tensor, weights_tensor, mask_tensor


# --------------------------------------------------------------------------
# id/weight pooling without embedding
# --------------------------------------------------------------------------

def pool_slots(slots: jnp.ndarray,
               target_slots: Sequence,
               ids: Optional[jnp.ndarray] = None,
               weights: Optional[jnp.ndarray] = None,
               method: str = "sum",
               drop_duplicate_slot: bool = False):
    """Pool each target slot's ids (min, 0 if absent) and weights.

    Reference: embedding_util.py:419-489.

    Returns:
        (pooled_ids (B, T) or None, pooled_weights (B, T) or None).
    """
    slots = jnp.asarray(slots)
    if slots.ndim == 1:
        slots = slots.reshape(1, -1)
    if slots.ndim != 2:
        raise ValueError(
            f"only support 2 (or 1) dimentional slots, get {slots.ndim}")

    batch_ids, num_rows, num_ids, num_segments = \
        batch_segment_ids_of_targets(slots, target_slots)
    if drop_duplicate_slot:
        batch_ids = first_occurance_in_row(batch_ids, need_sort=False,
                                           padding_value=-1)
    flat_seg = jnp.where(batch_ids >= 0, batch_ids,
                         num_segments).reshape(-1)
    flat_mask = (batch_ids >= 0).reshape(-1)

    def _pool(values, how):
        if values is None:
            return None
        values = jnp.asarray(values)
        flat = values.reshape(-1)
        if how == "min0":
            big = (jnp.iinfo(flat.dtype).max
                   if jnp.issubdtype(flat.dtype, jnp.integer)
                   else jnp.inf)
            flat = jnp.where(flat_mask, flat, jnp.asarray(big, flat.dtype))
            result = jax.ops.segment_min(flat, flat_seg,
                                         num_segments=num_segments + 1)
            result = jnp.where(result == jnp.asarray(big, flat.dtype),
                               jnp.zeros_like(result), result)
        elif how == "mean":
            flat = flat * flat_mask.astype(flat.dtype)
            s = jax.ops.segment_sum(flat, flat_seg,
                                    num_segments=num_segments + 1)
            counts = jax.ops.segment_sum(flat_mask.astype(flat.dtype),
                                         flat_seg,
                                         num_segments=num_segments + 1)
            result = s / jnp.maximum(counts, 1)
        elif how == "sum":
            flat = flat * flat_mask.astype(flat.dtype)
            result = jax.ops.segment_sum(flat, flat_seg,
                                         num_segments=num_segments + 1)
        else:
            raise ValueError(f"not support '{how}'")
        return result[:num_segments].reshape(num_rows, num_ids)

    pooled_ids = _pool(ids, "min0")
    pooled_weights = _pool(weights, method)
    return pooled_ids, pooled_weights


def pool_single_slot(slots: jnp.ndarray, target_slot,
                     ids: Optional[jnp.ndarray] = None,
                     weights: Optional[jnp.ndarray] = None):
    """Pool a slot occurring exactly once per sample -> (B, 1) values.

    Reference: embedding_util.py:492-528 (deprecated there in favor of
    fetch_single_slot; kept for API parity).  Static version: the
    single hit per row is ``sum(values * mask)`` per row.
    """
    import warnings
    warnings.warn("pool_single_slot only work for slot that occur exactly "
                  "once a sample, use fetch_single_slot instead")
    slots = jnp.asarray(slots)
    mask = (slots == target_slot)

    def fetch(values):
        if values is None:
            return None
        values = jnp.asarray(values)
        return jnp.sum(values * mask.astype(values.dtype), axis=-1,
                       keepdims=True)
    return fetch(ids), fetch(weights)


def fetch_single_slot(slots: jnp.ndarray, target_slot,
                      ids: Optional[jnp.ndarray] = None,
                      weights: Optional[jnp.ndarray] = None,
                      default_id=0, default_weight: float = 0,
                      ncols: Optional[int] = None):
    """Fetch a slot's ids/weights padded-or-truncated to (B, ncols).

    Reference: embedding_util.py:531-584.

    Example:
        slots=[[0, 1], [1, 2]], target_slot=1, ncols=2 ->
        ids rows: [id01, default], [id10, default].
    """
    if ncols is None:
        raise ValueError("ncols must be set (static shape required)")
    slots = jnp.asarray(slots)
    mask = slots == target_slot

    def fetch(values, default_value):
        if values is None:
            return None
        values = jnp.asarray(values)
        out = _scatter_to_padded(values[..., None].astype(jnp.float32),
                                 mask, ncols,
                                 default_value=float(default_value))
        return jnp.squeeze(out, -1).astype(values.dtype)
    return fetch(ids, default_id), fetch(weights, default_weight)
