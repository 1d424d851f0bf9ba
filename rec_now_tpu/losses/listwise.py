"""In-batch listwise loss construction — fixed-shape, XLA-native.

Re-design of rec_now/rec_block/listwise_loss_from_batch.py:89
(``to_listwise_sample``) and :151 (softmax-CE listwise loss).

The reference groups the batch with ``tf.unique_with_counts`` and scatters
it into a dynamically-shaped ``(num_valid_group, B)`` dense matrix through
a ``tf.SparseTensor`` (listwise_loss_from_batch.py:109-129), then drops
rows without both a positive and a negative via ``tf.boolean_mask``
(:142-145).  Dynamic shapes twice over.

Static-shape re-design: every sample is a *candidate anchor* for its
group; only the first occurrence of each group value is a *valid* anchor
row.  The listwise matrices are all (B, B):

    member[i, j]  = group[j] == group[i]
    labels[i, j]  = labels[j] * member[i, j]
    logits[i, j]  = logits[j]        if member[i, j] else masked_value
    row_valid[i]  = first_occurrence(i) AND row-has-pos AND row-has-neg

The loss is then a masked mean over valid rows — identical numerics to
the reference (row order differs, which is irrelevant to the reduction),
but one fused fixed-shape computation that XLA maps straight onto the
MXU/VPU.

Symbols: B = batch size.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def row_not_all_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Per-row: does the row contain a non-zero element?

    Reference: listwise_loss_from_batch.py:13-31.
    """
    return jnp.any(x.astype(jnp.float32) != 0.0, axis=-1)


def row_has_value_greater_than(x: jnp.ndarray, threshold) -> jnp.ndarray:
    """Per-row: does the row contain a value > threshold?

    Reference: listwise_loss_from_batch.py:34-53.
    """
    return jnp.any(x.astype(jnp.float32) > threshold, axis=-1)


def row_has_value_less_than(x: jnp.ndarray, threshold) -> jnp.ndarray:
    """Per-row: does the row contain a value < threshold?

    Reference: listwise_loss_from_batch.py:56-71.
    """
    return jnp.any(x.astype(jnp.float32) < threshold, axis=-1)


def nan_to_zero(val: jnp.ndarray) -> jnp.ndarray:
    """Map NaN to 0.0 (reference: listwise_loss_from_batch.py:74-86)."""
    return jnp.where(jnp.isnan(val), jnp.zeros_like(val), val)


def first_occurrence_mask(group_ids: jnp.ndarray) -> jnp.ndarray:
    """(B,) bool: True where sample i is the first with its group value."""
    g = jnp.reshape(group_ids, (-1,))
    b = g.shape[0]
    same = g[:, None] == g[None, :]
    earlier = jnp.arange(b)[None, :] < jnp.arange(b)[:, None]
    return jnp.logical_not(jnp.any(jnp.logical_and(same, earlier), axis=1))


class ListwiseBatch(NamedTuple):
    """Static-shape listwise view of a batch.

    All fields are (B, B) except ``row_valid`` (B,).  Row i is the group
    anchored at sample i; only rows with ``row_valid[i]`` participate in
    the loss.  This replaces the reference's dynamically-shaped
    ``(num_valid_group, B)`` triple (listwise_loss_from_batch.py:102-105).
    """
    mask: jnp.ndarray        # bool — group membership
    labels: jnp.ndarray      # float — row-normalized label distribution
    logits: jnp.ndarray      # float — member logits, others masked
    row_valid: jnp.ndarray   # bool (B,)


def to_listwise_sample(group_ids: jnp.ndarray,
                       labels: jnp.ndarray,
                       logits: jnp.ndarray,
                       do_mask_logits: bool = True,
                       value_of_masked_logit: float = -1e9,
                       pos_neg_th: float = 0.5) -> ListwiseBatch:
    """Extract listwise samples from a batch (fixed shape).

    A group is valid only if it has at least one positive
    (label > pos_neg_th) and one negative (label < pos_neg_th) sample,
    mirroring reference listwise_loss_from_batch.py:135-137.

    Args:
        group_ids: (B,) group ids (e.g. user ids).
        labels: (B,) labels, positives > pos_neg_th.
        logits: (B,) model outputs (pre-sigmoid).
        do_mask_logits: replace non-member logits with
            ``value_of_masked_logit`` so they vanish from the softmax.
        value_of_masked_logit: the mask value.
        pos_neg_th: positive/negative threshold.

    Returns:
        :class:`ListwiseBatch` with (B, B) matrices and a (B,) row mask.
    """
    g = jnp.reshape(group_ids, (-1,))
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    logits = jnp.reshape(logits, (-1,))

    member = g[:, None] == g[None, :]                       # (B, B)
    member_f = member.astype(jnp.float32)

    dense_labels = labels[None, :] * member_f               # (B, B)
    if do_mask_logits:
        dense_logits = jnp.where(member, logits[None, :],
                                 jnp.asarray(value_of_masked_logit,
                                             dtype=logits.dtype))
    else:
        dense_logits = jnp.broadcast_to(logits[None, :], member.shape)

    has_pos = row_has_value_greater_than(dense_labels, pos_neg_th)
    # reference computes has-neg on the dense (labels - th) matrix whose
    # non-member entries are 0 (listwise_loss_from_batch.py:136): a
    # member with label < th yields a negative entry.
    has_neg = row_has_value_less_than((labels[None, :] - pos_neg_th)
                                      * member_f, 0.0)
    row_valid = jnp.logical_and(first_occurrence_mask(g),
                                jnp.logical_and(has_pos, has_neg))

    label_sum = jnp.sum(dense_labels, axis=-1, keepdims=True)
    norm_labels = dense_labels / jnp.where(label_sum == 0.0, 1.0, label_sum)
    norm_labels = jax.lax.stop_gradient(norm_labels)

    return ListwiseBatch(mask=member, labels=norm_labels,
                         logits=dense_logits, row_valid=row_valid)


def listwise_loss_via_softmax_cross_entropy_with_logits(
        labels_for_softmax: jnp.ndarray,
        logits_for_softmax: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        do_reduce: bool = True,
        row_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax-CE listwise loss over (optionally masked) group rows.

    Reference: listwise_loss_from_batch.py:151-173.  ``row_valid`` plays
    the role the reference's ``boolean_mask`` row-drop played: invalid
    rows contribute to neither numerator nor denominator.

    Args:
        labels_for_softmax: (G, B) label distributions (rows sum to 1).
        logits_for_softmax: (G, B) logits.
        weights: optional per-row weights (G,).
        do_reduce: reduce to the scalar mean over (valid) rows, with the
            0-valid-rows case mapped to 0.0 instead of NaN.
        row_valid: optional (G,) bool row validity.

    Returns:
        Scalar loss if ``do_reduce`` else per-row losses (G,).
    """
    labels_for_softmax = jax.lax.stop_gradient(labels_for_softmax)
    log_probs = jax.nn.log_softmax(logits_for_softmax, axis=-1)
    losses = -jnp.sum(labels_for_softmax * log_probs, axis=-1)   # (G,)
    if weights is not None:
        losses = losses * weights
    if row_valid is not None:
        valid_f = row_valid.astype(losses.dtype)
        losses = losses * valid_f
        if do_reduce:
            denom = jnp.sum(valid_f)
            loss = jnp.sum(losses) / jnp.where(denom == 0.0, 1.0, denom)
            return jnp.where(denom == 0.0, 0.0, loss)
        return losses
    if do_reduce:
        return nan_to_zero(jnp.mean(losses))
    return losses


def listwise_loss(group_ids: jnp.ndarray,
                  labels: jnp.ndarray,
                  logits: jnp.ndarray,
                  pos_neg_th: float = 0.5,
                  value_of_masked_logit: float = -1e9,
                  use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """End-to-end in-batch listwise loss: extract groups then softmax-CE.

    Convenience composition of :func:`to_listwise_sample` and
    :func:`listwise_loss_via_softmax_cross_entropy_with_logits`; on TPU
    (default logit-mask value) it dispatches to the Pallas kernel with
    O(B) HBM traffic (ops/pallas/listwise_kernel.py).
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and value_of_masked_logit == -1e9)
    if use_pallas:
        from rec_now_tpu.ops.pallas.listwise_kernel import (
            listwise_loss_pallas)
        return listwise_loss_pallas(group_ids, labels, logits,
                                    pos_neg_th=pos_neg_th)
    # bounded-memory fallback off the kernel path: never materialize the
    # (B, B) listwise matrices at production batch sizes
    from rec_now_tpu.losses.pairwise import BLOCKED_MIN_BATCH
    if jnp.reshape(group_ids, (-1,)).shape[0] >= BLOCKED_MIN_BATCH:
        from rec_now_tpu.losses.listwise_blocked import listwise_loss_blocked
        return listwise_loss_blocked(
            group_ids, labels, logits, pos_neg_th=pos_neg_th,
            value_of_masked_logit=value_of_masked_logit)
    lw = to_listwise_sample(group_ids, labels, logits,
                            do_mask_logits=True,
                            value_of_masked_logit=value_of_masked_logit,
                            pos_neg_th=pos_neg_th)
    return listwise_loss_via_softmax_cross_entropy_with_logits(
        lw.labels, lw.logits, row_valid=lw.row_valid)
