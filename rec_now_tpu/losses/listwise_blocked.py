"""Row-blocked in-batch listwise loss — O(block * B) memory.

Identical semantics to :func:`rec_now_tpu.losses.listwise.listwise_loss`
(anchor-row formulation of the reference's group extraction,
rec_now/rec_block/listwise_loss_from_batch.py:89): a ``lax.scan`` walks
anchor-row blocks; each step builds only a (R, B) membership slab,
normalizes labels, masks logits, and accumulates per-valid-row
softmax-CE.  Use for large single-shard batches.

Symbols: B batch, R = block_rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def listwise_loss_blocked(group_ids: jnp.ndarray,
                          labels: jnp.ndarray,
                          logits: jnp.ndarray,
                          block_rows: int = 1024,
                          pos_neg_th: float = 0.5,
                          value_of_masked_logit: float = -1e9
                          ) -> jnp.ndarray:
    """Blocked listwise softmax-CE loss.

    Args:
        group_ids: (B,) group ids.
        labels: (B,) labels (positives > pos_neg_th).
        logits: (B,) model outputs.
        block_rows: anchor rows per scan step.
        pos_neg_th: positive/negative threshold.
        value_of_masked_logit: logit filler for non-members.

    Returns:
        Scalar loss; 0.0 when no group has both classes.
    """
    g = jnp.reshape(group_ids, (-1,))
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    logits = jnp.reshape(logits, (-1,))
    b = g.shape[0]

    pad = -b % block_rows
    if pad:
        # padded anchors use an impossible group id so they are invalid
        sentinel = jnp.max(g) + 1
        g_anchor = jnp.concatenate(
            [g, jnp.full((pad,), sentinel, g.dtype)])
    else:
        g_anchor = g
    num_blocks = g_anchor.shape[0] // block_rows

    col_idx = jnp.arange(b)[None, :]

    def body(carry, i0):
        total, count = carry
        ga = jax.lax.dynamic_slice_in_dim(g_anchor, i0, block_rows)
        member = ga[:, None] == g[None, :]                 # (R, B)
        member_f = member.astype(jnp.float32)

        # first-occurrence anchors only: no column with the same group
        # before the anchor's global index
        row_idx = i0 + jnp.arange(block_rows)[:, None]
        earlier = jnp.logical_and(member, col_idx < row_idx)
        first_occ = jnp.logical_not(jnp.any(earlier, axis=1))
        in_range = (i0 + jnp.arange(block_rows)) < b

        dense_labels = labels[None, :] * member_f
        has_pos = jnp.any(dense_labels > pos_neg_th, axis=1)
        has_neg = jnp.any((labels[None, :] - pos_neg_th) * member_f < 0.0,
                          axis=1)
        row_valid = first_occ & has_pos & has_neg & in_range

        label_sum = jnp.sum(dense_labels, axis=1, keepdims=True)
        norm_labels = dense_labels / jnp.where(label_sum == 0.0, 1.0,
                                               label_sum)
        norm_labels = jax.lax.stop_gradient(norm_labels)

        masked_logits = jnp.where(member, logits[None, :],
                                  jnp.asarray(value_of_masked_logit,
                                              logits.dtype))
        log_probs = jax.nn.log_softmax(masked_logits, axis=-1)
        row_losses = -jnp.sum(norm_labels * log_probs, axis=1)   # (R,)
        valid_f = row_valid.astype(jnp.float32)
        total = total + jnp.sum(row_losses * valid_f)
        count = count + jnp.sum(valid_f)
        return (total, count), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        jnp.arange(num_blocks) * block_rows)
    loss = total / jnp.where(count == 0.0, 1.0, count)
    return jnp.where(count == 0.0, 0.0, loss)
