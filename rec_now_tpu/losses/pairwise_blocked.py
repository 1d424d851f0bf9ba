"""Row-blocked in-batch pairwise loss — O(block * B) memory.

Identical semantics to :func:`rec_now_tpu.losses.pairwise.pairwise_loss`
(and therefore to the reference, rec_now/rec_block/
pairwise_loss_from_batch.py:228), but the (B, B) pair structure is never
materialized: a ``lax.scan`` walks row blocks of size ``block_rows``,
each iteration forming only a (block, B) slab.  Use for large
single-shard batches (the dense form's (B, B) buffers reach GBs past
B ≈ 16k); under data-parallel ``shard_map`` the per-shard batch is
usually small enough for the dense form.

Two scans when occurrence weighting is on:

  pass 1: row_pair_count[k] = #valid pairs anchored at row k   (block, B)
          group_pair_count[i] = sum_k same_main(i, k) row_count[k]
  pass 2: per-pair losses, weighted by group_pair_count[i] ** power
          (a row-constant), summed.

Symbols: B batch, R = block_rows.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rec_now_tpu.losses.pairwise import (GroupLike, SMALL_POSITIVE_FLOAT,
                                         _as_vec)


def _normalize_groups(groups: GroupLike):
    if not isinstance(groups, (list, tuple)):
        groups = [groups]
    return [_as_vec(g) for g in groups]


def _block_pair_mask(i0, r, glist, labels, mask, outputs,
                     only_use_wrong_order_pair,
                     label_pair_to_weight_func):
    """(R, B) pair mask (+weights) for the row block starting at i0."""
    b = glist[0].shape[0]
    pm = None
    for g in glist:
        g_rows = jax.lax.dynamic_slice_in_dim(g, i0, r)
        one = g_rows[:, None] == g[None, :]
        pm = one if pm is None else jnp.logical_and(pm, one)
    # remove the diagonal (global column index == global row index)
    col = jnp.arange(b)[None, :]
    row_idx = i0 + jnp.arange(r)[:, None]
    pm = jnp.logical_and(pm, col != row_idx)
    if mask is not None:
        m = mask.astype(bool)
        m_rows = jax.lax.dynamic_slice_in_dim(m, i0, r)
        pm = jnp.logical_and(pm, jnp.logical_and(m_rows[:, None],
                                                 m[None, :]))
    lab_rows = jax.lax.dynamic_slice_in_dim(labels, i0, r)
    weights = None
    if label_pair_to_weight_func is None:
        cond = lab_rows[:, None] > labels[None, :]
    else:
        lab_mat = jnp.broadcast_to(lab_rows[:, None],
                                   (lab_rows.shape[0], b))
        lab_mat_t = jnp.broadcast_to(labels[None, :],
                                     (lab_rows.shape[0], b))
        weights = label_pair_to_weight_func(lab_mat, lab_mat_t)
        cond = weights > 0
    pm = jnp.logical_and(pm, cond)
    if only_use_wrong_order_pair:
        out_rows = jax.lax.dynamic_slice_in_dim(outputs, i0, r)
        pm = jnp.logical_and(pm, out_rows[:, None] < outputs[None, :])
    return pm, weights


def pairwise_loss_blocked(outputs: jnp.ndarray,
                          labels: jnp.ndarray,
                          groups: GroupLike,
                          block_rows: int = 1024,
                          factor: float = 1.0,
                          only_use_wrong_order_pair: bool = False,
                          return_num_pair: bool = False,
                          click_occurance_power: float = 0.0,
                          mask: Optional[jnp.ndarray] = None,
                          label_pair_to_weight_func: Optional[Callable]
                          = None,
                          reduce_mean: bool = True,
                          pairloss_func: Optional[Callable] = None):
    """Blocked pairwise loss; semantics == pairwise_loss (+ BPR default).

    Args:
        outputs, labels, groups, mask, label_pair_to_weight_func,
        only_use_wrong_order_pair, click_occurance_power,
        return_num_pair: as in :func:`pairwise_loss`.
        block_rows: rows per scan step (must divide the padded batch;
            the batch is padded with masked rows to a multiple).
        factor: BPR inverse temperature (ignored when ``pairloss_func``
            is given — bake a temperature into the callable instead).
        reduce_mean: divide by the pair count (+eps), like
            ``bpr_loss_func(reduce_mean=True)``.
        pairloss_func: optional custom elementwise pair-loss callable.
            Invoked once per (block, B) tile as
            ``fn(pos, neg, weights, pair_mask=m, reduce_mean=False)``
            and must return the SUM of per-pair losses over valid
            entries of the tile (the contract :func:`bpr_loss_func`
            satisfies) — losses must be elementwise in (pos, neg, w)
            for tile-wise summation to equal the dense result.  None =
            the inlined BPR fast path.

    Returns:
        scalar loss (and pair count when ``return_num_pair``).
    """
    outputs = _as_vec(outputs)
    labels = _as_vec(labels).astype(jnp.float32)
    glist = _normalize_groups(groups)
    b = outputs.shape[0]

    pad = -b % block_rows
    if pad:
        outputs = jnp.pad(outputs, (0, pad))
        labels = jnp.pad(labels, (0, pad))
        glist = [jnp.pad(g, (0, pad)) for g in glist]
        pad_mask = jnp.concatenate(
            [jnp.ones(b, bool) if mask is None else mask.astype(bool),
             jnp.zeros(pad, bool)])
        mask = pad_mask
    elif mask is not None:
        mask = mask.astype(bool)
    bp = outputs.shape[0]
    num_blocks = bp // block_rows

    need_occ = click_occurance_power != 0.0
    g_main = glist[0]

    if need_occ:
        def count_body(carry, i0):
            pm, _ = _block_pair_mask(i0, block_rows, glist, labels,
                                     mask, outputs,
                                     only_use_wrong_order_pair,
                                     label_pair_to_weight_func)
            return carry, jnp.sum(pm.astype(jnp.float32), axis=1)
        _, counts = jax.lax.scan(
            count_body, 0, jnp.arange(num_blocks) * block_rows)
        row_count = counts.reshape(-1)                    # (Bp,)

        def gpc_body(carry, i0):
            g_rows = jax.lax.dynamic_slice_in_dim(g_main, i0, block_rows)
            same = (g_rows[:, None] == g_main[None, :]).astype(jnp.float32)
            return carry, same @ row_count                # (R,)
        _, gpc = jax.lax.scan(
            gpc_body, 0, jnp.arange(num_blocks) * block_rows)
        group_pair_count = gpc.reshape(-1)                # (Bp,)
        occ_w = jnp.where(group_pair_count > 0,
                          jnp.power(group_pair_count,
                                    click_occurance_power), 0.0)
    else:
        occ_w = None

    def loss_body(carry, i0):
        total, n = carry
        pm, weights = _block_pair_mask(i0, block_rows, glist, labels,
                                       mask, outputs,
                                       only_use_wrong_order_pair,
                                       label_pair_to_weight_func)
        out_rows = jax.lax.dynamic_slice_in_dim(outputs, i0, block_rows)
        if occ_w is not None:
            occ_rows = jax.lax.dynamic_slice_in_dim(
                occ_w, i0, block_rows)[:, None]
        pmf = jax.lax.stop_gradient(pm.astype(jnp.float32))
        if pairloss_func is not None:
            # custom elementwise pair loss: evaluate the tile densely
            # and take its masked SUM — same bounded O(R * B) footprint
            w = weights
            if occ_w is not None:
                w = occ_rows if w is None else w * occ_rows
            if w is not None:
                w = jax.lax.stop_gradient(
                    jnp.broadcast_to(w, pm.shape).astype(jnp.float32))
            pos = jnp.broadcast_to(out_rows[:, None], pm.shape)
            neg = jnp.broadcast_to(outputs[None, :], pm.shape)
            total = total + pairloss_func(pos, neg, w, pair_mask=pmf,
                                          reduce_mean=False)
        else:
            logits = (out_rows[:, None] - outputs[None, :]) * factor
            losses = jax.nn.softplus(-logits)
            if weights is not None:
                losses = losses * jax.lax.stop_gradient(weights)
            if occ_w is not None:
                losses = losses * jax.lax.stop_gradient(occ_rows)
            total = total + jnp.sum(losses * pmf)
        n = n + jnp.sum(pmf)
        return (total, n), None

    (total, n), _ = jax.lax.scan(
        loss_body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        jnp.arange(num_blocks) * block_rows)

    loss = total / (n + SMALL_POSITIVE_FLOAT) if reduce_mean else total
    if return_num_pair:
        return loss, n
    return loss
