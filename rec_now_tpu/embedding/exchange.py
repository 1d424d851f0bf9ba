"""Static-shape dedup + owner-bucketed routing for sharded lookups.

The reference deduplicates ids before hitting the parameter server
(rec_now/rec_block/embedding_util.py:306-311, ``tf.unique`` before
``embedding_func``); on TPU the same idea cuts the collective payload of
the sharded table exchange.  The naive exchange all_gathers every
shard's ids and rows (O(B·D) per shard, n-fold redundant); the routed
exchange sends each shard only the ids it owns:

    sort-dedup local ids  ->  bucket by owner shard (static capacity)
    ->  all_to_all ids    ->  local gather on the owner
    ->  all_to_all rows back  ->  un-dedup to the original order

Everything here is fixed-shape (XLA requirement): dedup is sort-based
with ``BIG`` sentinels, buckets have a static per-owner capacity
``cap``, and ids that overflow a bucket spill to a small ``ov_cap``
side-buffer that travels by all_gather (the old path, restricted to the
spill).  Payload per shard becomes O(b·factor·D + n·ov_cap·D) instead
of O(n·b·D) — the win grows linearly with the mesh.

Only ids that overflow BOTH buffers (per-owner skew beyond
``cap`` AND total spill beyond ``ov_cap``) are dropped; ``RoutePlan``
carries a ``dropped`` counter so callers can observe this (it requires
adversarially non-uniform ids — hashed id spaces land ~1/n per owner).

Symbols: b flat ids per shard, n shards, cap per-owner bucket capacity,
ov_cap overflow buffer length, D embedding dim.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.int32(2 ** 30)   # sentinel id: sorts last, drops out of bounds


class RoutePlan(NamedTuple):
    """Owner-bucketed routing of one shard's unique ids.

    ``send_ids``/``ov_ids`` are what travels; ``ret_slot``/``ov_slot``
    say, for each unique slot, where its row will sit in the returned
    buffers (-1 = not there).
    """
    send_ids: jnp.ndarray   # (n*cap,) int32, block s = ids owned by shard s
    ret_slot: jnp.ndarray   # (b,) position of unique slot in send buffer | -1
    ov_ids: jnp.ndarray     # (ov_cap,) overflow ids (BIG padded)
    ov_slot: jnp.ndarray    # (b,) position of unique slot in overflow | -1
    dropped: jnp.ndarray    # () int32 ids lost to double overflow


def sort_dedup(flat: jnp.ndarray):
    """Static-shape unique: (b,) ids -> ((b,) uid, (b,) slot).

    ``uid[k]`` is the k-th distinct id (ascending) or ``BIG`` past the
    distinct count; ``slot[i]`` maps item i to its unique slot, so
    ``rows_unique[slot]`` un-dedups a per-unique result.
    """
    b = flat.shape[0]
    order = jnp.argsort(flat)
    sid = flat[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    upos = jnp.cumsum(first.astype(jnp.int32)) - 1       # (b,)
    uid = jnp.full((b,), BIG, flat.dtype).at[upos].set(sid)
    slot = jnp.zeros((b,), jnp.int32).at[order].set(upos)
    return uid, slot


def plan_route(uid: jnp.ndarray, n: int, cap: int,
               ov_cap: int) -> RoutePlan:
    """Bucket unique ids by owner shard (``id % n``), static capacity.

    Args:
        uid: (b,) unique ids with ``BIG`` sentinels (from sort_dedup).
        n: shard count.
        cap: per-owner bucket capacity in the all_to_all buffer.
        ov_cap: overflow (all_gather fallback) buffer length.
    """
    b = uid.shape[0]
    valid = uid < BIG
    owner = jnp.where(valid, uid % n, n)
    oorder = jnp.argsort(owner, stable=True)   # sentinels sort last
    o_s = owner[oorder]
    uid_s = uid[oorder]
    pos = jnp.arange(b, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), o_s[1:] != o_s[:-1]])
    group_start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    pib = pos - group_start                    # position in bucket
    real = o_s < n
    in_main = real & (pib < cap)
    row = jnp.where(in_main, o_s * cap + pib, n * cap)
    send_ids = jnp.full((n * cap,), BIG, uid.dtype
                        ).at[row].set(uid_s, mode="drop")

    is_ov = real & (pib >= cap)
    ov_rank = jnp.cumsum(is_ov.astype(jnp.int32)) - 1
    in_ov = is_ov & (ov_rank < ov_cap)
    ov_row = jnp.where(in_ov, ov_rank, ov_cap)
    ov_ids = jnp.full((ov_cap,), BIG, uid.dtype
                      ).at[ov_row].set(uid_s, mode="drop")

    # map each unique slot (sorted-by-id order) to its buffer position
    ret_slot = jnp.full((b,), -1, jnp.int32).at[oorder].set(
        jnp.where(in_main, row, -1).astype(jnp.int32))
    ov_slot = jnp.full((b,), -1, jnp.int32).at[oorder].set(
        jnp.where(in_ov, ov_rank, -1).astype(jnp.int32))
    dropped = jnp.sum((is_ov & ~in_ov).astype(jnp.int32))
    return RoutePlan(send_ids=send_ids, ret_slot=ret_slot,
                     ov_ids=ov_ids, ov_slot=ov_slot, dropped=dropped)


def gather_planned(plan: RoutePlan, recv_rows: jnp.ndarray,
                   ov_rows: jnp.ndarray, slot: jnp.ndarray
                   ) -> jnp.ndarray:
    """Assemble per-item rows from the returned buffers.

    Args:
        plan: the route used to send.
        recv_rows: (n*cap, D) rows returned by the second all_to_all
            (position k = the row for ``send_ids[k]``).
        ov_rows: (ov_cap, D) rows for the overflow ids.
        slot: (b,) item -> unique slot map from :func:`sort_dedup`.

    Returns:
        (b, D) rows in original item order (dropped ids read zero).
    """
    main = jnp.where(plan.ret_slot[:, None] >= 0,
                     recv_rows[jnp.maximum(plan.ret_slot, 0)], 0.0)
    ov = jnp.where(plan.ov_slot[:, None] >= 0,
                   ov_rows[jnp.maximum(plan.ov_slot, 0)], 0.0)
    rows_unique = main + ov                    # disjoint by construction
    return rows_unique[slot]


def scatter_planned(plan: RoutePlan, vals_unique: jnp.ndarray):
    """Place per-unique-slot values into the send + overflow buffers.

    Args:
        plan: the route (from the same ids).
        vals_unique: (b, D) values per unique slot (e.g. summed grads).

    Returns:
        ((n*cap, D) send buffer, (ov_cap, D) overflow buffer); positions
        without an id hold zeros.
    """
    n_cap = plan.send_ids.shape[0]
    ov_cap = plan.ov_ids.shape[0]
    d = vals_unique.shape[1]
    send = jnp.zeros((n_cap, d), vals_unique.dtype).at[
        jnp.where(plan.ret_slot >= 0, plan.ret_slot, n_cap)
    ].set(vals_unique, mode="drop")
    ov = jnp.zeros((ov_cap, d), vals_unique.dtype).at[
        jnp.where(plan.ov_slot >= 0, plan.ov_slot, ov_cap)
    ].set(vals_unique, mode="drop")
    return send, ov
