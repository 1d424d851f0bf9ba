"""In-batch pairwise loss construction — fixed-shape, XLA-native.

Re-design of the reference's flagship feature (rec_now/rec_block/
pairwise_loss_from_batch.py:228 ``pairwise_loss``): group a mini-batch by
one or more IDs (e.g. user ID), extract valid (positive, negative) sample
pairs, and compute a BPR-style loss over the pairs.

The reference materializes the valid pairs with ``tf.boolean_mask``
(pairwise_loss_from_batch.py:217) and counts per-group pairs with
``tf.unique_with_counts`` (:146) — both produce *dynamic* shapes, which
XLA cannot compile efficiently (every batch would trigger recompilation or
host sync).  Here the whole computation is a fixed-shape ``(B, B)`` masked
reduction:

* the pair mask is a float/bool ``(B, B)`` matrix (same-group AND
  label-order AND sample-validity AND optional wrong-order), never
  gathered;
* per-pair losses are computed densely and reduced as
  ``sum(mask * w * loss) / (sum(mask) + eps)`` — numerically identical to
  the reference's gather-then-mean;
* the per-group pair-count weight (``occurance_power_weight``,
  reference :130-151) becomes a masked segment count computed with one
  extra ``(B, B)`` matmul against the same-main-group matrix.

Everything is differentiable, jit-able, shardable with ``pjit`` over the
batch axis (the ``(B, B)`` matrix is formed per data-parallel shard, which
matches the reference's per-replica in-batch semantics), and runs on the
MXU/VPU with no host round-trips.

Symbols: B = batch size.
"""
from __future__ import annotations

import functools
import inspect
import warnings
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

SMALL_POSITIVE_FLOAT = 1.0e-10

# Past this batch size the dense path's (B, B) f32 slabs (several live at
# once in fwd+bwd) are routed to the O(block * B) scan form instead —
# at B=8192 each slab is ~268 MB.
BLOCKED_MIN_BATCH = 4096

GroupLike = Union[jnp.ndarray, Sequence[jnp.ndarray]]


def _as_vec(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten to (B,)."""
    return jnp.reshape(x, (-1,))


def _blocked_capable(fn: Callable) -> Optional[bool]:
    """Whether a pair-loss callable satisfies the blocked-tile contract.

    The O(block * B) scan form evaluates the callable once per tile as
    ``fn(pos, neg, w, pair_mask=m, reduce_mean=False)`` and sums tile
    results, so the callable must (a) accept those two keywords and
    (b) be elementwise per pair with a sum-decomposable reduction —
    (a) is checkable, (b) is not: a callable whose reduction couples
    pairs across tiles (row-normalized, max-based ...) would silently
    produce different numbers under tiling.  The authoritative signal
    is therefore an EXPLICIT opt-in: set ``fn.blocked_capable = True``
    (or False to force the dense path).  Returns that attribute when
    present; otherwise falls back to signature sniffing — requiring
    explicit named ``pair_mask``/``reduce_mean`` parameters (a bare
    ``**kwargs`` would swallow ``reduce_mean=False`` without honoring
    it) — and the caller warns once about the inference.
    """
    declared = getattr(fn, "blocked_capable", None)
    if isinstance(fn, functools.partial) and declared is None:
        declared = getattr(fn.func, "blocked_capable", None)
    if declared is not None:
        return bool(declared)
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    if "pair_mask" in params and "reduce_mean" in params:
        return None          # capable by signature only — caller warns
    return False


def _callable_reduces(fn: Callable) -> bool:
    """The effective ``reduce_mean`` a bare ``fn(pos, neg, w, mask)``
    call would use (partial bindings override the signature default)."""
    while isinstance(fn, functools.partial):
        if "reduce_mean" in fn.keywords:
            return bool(fn.keywords["reduce_mean"])
        fn = fn.func
    try:
        p = inspect.signature(fn).parameters.get("reduce_mean")
    except (TypeError, ValueError):
        return True
    if p is None or p.default is inspect.Parameter.empty:
        return True
    return bool(p.default)


def _generate_pair_mask(group: jnp.ndarray,
                        only_upper_band: bool = False) -> jnp.ndarray:
    """(B, B) bool mask of same-group, off-diagonal sample pairs.

    Reference: pairwise_loss_from_batch.py:16-40.
    """
    g = _as_vec(group)
    same = g[:, None] == g[None, :]
    eye = jnp.eye(g.shape[0], dtype=bool)
    mask = jnp.logical_and(same, jnp.logical_not(eye))
    if only_upper_band:
        # keep the main diagonal band plus one superdiagonal, matching
        # tf.linalg.band_part(mask, 0, 1) in the reference (:39).
        b = g.shape[0]
        rows = jnp.arange(b)[:, None]
        cols = jnp.arange(b)[None, :]
        band = jnp.logical_and(cols - rows >= 0, cols - rows <= 1)
        mask = jnp.logical_and(mask, band)
    return mask


def generate_pair_mask(group_tensor_or_list: GroupLike,
                       only_upper_band: bool = False) -> jnp.ndarray:
    """(B, B) bool mask marking valid same-group pairs.

    Multiple group conditions are AND-combined, mirroring the reference
    (pairwise_loss_from_batch.py:43-74).

    Example:
        groups = [1, 1, 2, 2, 2] marks pairs within {0,1} and {2,3,4}.
    """
    if not isinstance(group_tensor_or_list, (list, tuple)):
        group_tensor_or_list = [group_tensor_or_list]
    pair_mask = None
    for group in group_tensor_or_list:
        one = _generate_pair_mask(group, only_upper_band)
        pair_mask = one if pair_mask is None else jnp.logical_and(pair_mask, one)
    return pair_mask


def vec_to_matrix_pair(vec: jnp.ndarray):
    """Column-broadcast a (B,) vector into (B, B) ``mat`` and its transpose.

    Reference: pairwise_loss_from_batch.py:77-93.  In JAX this is pure
    broadcasting — no materialized tile.
    """
    v = _as_vec(vec)
    b = v.shape[0]
    mat = jnp.broadcast_to(v[:, None], (b, b))
    return mat, jnp.transpose(mat)


def bpr_loss_func(outputs_pos: jnp.ndarray,
                  outputs_neg: jnp.ndarray,
                  weights: Optional[jnp.ndarray] = None,
                  factor: float = 1.0,
                  reduce_mean: bool = True,
                  pair_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BPR loss: sigmoid-CE on the positive-minus-negative logit gap.

    Reference: pairwise_loss_from_batch.py:96-127.  Unlike the reference,
    which receives dynamically-gathered 1-D pos/neg vectors, this accepts
    dense ``(B, B)`` matrices plus a ``pair_mask``; masked-out entries
    contribute nothing to either numerator or denominator.

    Args:
        outputs_pos: positive-sample logits, any shape.
        outputs_neg: negative-sample logits, same shape.
        weights: optional per-pair weights, same shape.
        factor: inverse-temperature multiplier on the logit gap.
        reduce_mean: divide by the number of (valid) pairs.
        pair_mask: optional bool/float validity mask, same shape.  When
            None every entry is treated as valid.

    Returns:
        Scalar loss.
    """
    logits = outputs_pos - outputs_neg
    if factor != 1.0:
        logits = logits * factor
    # sigmoid_cross_entropy(labels=1, logits=x) == softplus(-x)
    losses = jax.nn.softplus(-logits)
    if weights is not None:
        losses = losses * weights
    if pair_mask is not None:
        m = pair_mask.astype(losses.dtype)
        losses = losses * m
        num = jnp.sum(m)
    else:
        num = jnp.asarray(losses.size, dtype=losses.dtype)
    loss = jnp.sum(losses)
    if reduce_mean:
        loss = loss / (num + SMALL_POSITIVE_FLOAT)
    return loss


# elementwise per pair + sum-decomposable reduction: safe to evaluate
# per tile in the blocked O(block*B) scan form (the explicit opt-in
# custom callables should copy — see _blocked_capable)
bpr_loss_func.blocked_capable = True


def occurance_power_weight(group_id: jnp.ndarray,
                           power: float = 0.0) -> jnp.ndarray:
    """Per-sample weight = (#samples sharing the group value) ** power.

    Reference: pairwise_loss_from_batch.py:130-151, which uses
    ``tf.unique_with_counts`` (dynamic).  Here the count is an O(B^2)
    equality reduction — static shape, MXU/VPU friendly, and exact.

    Example:
        occurance_power_weight([1, 2, 2], power=1.0) == [1.0, 2.0, 2.0]
    """
    g = _as_vec(group_id)
    same = (g[:, None] == g[None, :]).astype(jnp.float32)
    counts = jnp.sum(same, axis=1)
    if power != 1.0:
        counts = jnp.power(counts, power)
    return counts


def _apply_sample_mask(pair_mask: jnp.ndarray,
                       mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """AND the pair mask with per-sample validity (both sides of the pair).

    Reference: pairwise_loss_from_batch.py:154-172.
    """
    if mask is None:
        return pair_mask
    m = _as_vec(mask).astype(bool)
    return jnp.logical_and(pair_mask,
                           jnp.logical_and(m[:, None], m[None, :]))


def _calc_label_cond_and_weights(labels: jnp.ndarray,
                                 label_pair_to_weight_func, **kwargs):
    """Label-order condition and optional per-pair weights from labels.

    Reference: pairwise_loss_from_batch.py:175-194.
    """
    label_matrix, label_matrix_t = vec_to_matrix_pair(labels)
    if label_pair_to_weight_func is None:
        label_cond = label_matrix > label_matrix_t
        weights_mat = None
    else:
        weights_mat = label_pair_to_weight_func(label_matrix, label_matrix_t,
                                                **kwargs)
        label_cond = weights_mat > 0
    return label_cond, weights_mat


def _pair_occurance_weights(groups: GroupLike,
                            click_occurance_power: float,
                            pair_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, B) matrix of per-pair group-pair-count ** power weights.

    The reference (pairwise_loss_from_batch.py:282-291) gathers the main
    group id of every valid pair and runs ``unique_with_counts`` over that
    dynamic vector: each pair is weighted by (number of valid pairs whose
    positive sample carries the same main-group *value*) ** power.

    Static-shape equivalent: with ``row_count[k] = sum_l mask[k, l]``
    (valid pairs anchored at row k) the per-value pair count for row i is
    ``sum_k same_main_group(i, k) * row_count[k]`` — one (B, B) x (B,)
    matvec.  Every valid pair (i, j) then gets weight
    ``count[i] ** power`` (the pair's group value is its row's group).
    """
    group = groups[0] if isinstance(groups, (list, tuple)) else groups
    g = _as_vec(group)
    mask_f = pair_mask.astype(jnp.float32)
    row_count = jnp.sum(mask_f, axis=1)                       # (B,)
    same_main = (g[:, None] == g[None, :]).astype(jnp.float32)  # (B, B)
    group_pair_count = same_main @ row_count                  # (B,)
    w = jnp.power(group_pair_count, click_occurance_power)
    # rows with zero valid pairs produce 0 ** power (inf for negative
    # power); they are masked out anyway, so sanitize.
    w = jnp.where(group_pair_count > 0, w, 0.0)
    return jnp.broadcast_to(w[:, None], pair_mask.shape)


def pairwise_loss(outputs: jnp.ndarray,
                  labels: jnp.ndarray,
                  groups: GroupLike,
                  pairloss_func: Callable = bpr_loss_func,
                  only_use_wrong_order_pair: bool = False,
                  return_num_pair: bool = False,
                  click_occurance_power: float = 0.0,
                  mask: Optional[jnp.ndarray] = None,
                  label_pair_to_weight_func: Optional[Callable] = None,
                  use_pallas: Optional[bool] = None,
                  binary_labels: bool = False,
                  **kwargs):
    """In-batch pairwise loss (reference: pairwise_loss_from_batch.py:228).

    Args:
        outputs: per-sample logits, shape (B,) or (B, 1).
        labels: per-sample labels, same size.
        groups: group-id array (B,) or list of arrays; multiple conditions
            are AND-ed.  The first entry is the *main* group used for the
            occurrence weighting.
        pairloss_func: callable ``(pos, neg, weights, pair_mask=...)`` over
            dense (B, B) matrices; defaults to :func:`bpr_loss_func`.
            At B >= 4096 callables that also accept ``reduce_mean`` and
            are elementwise per pair (the :func:`bpr_loss_func`
            contract) run through the O(block * B)-memory scan form;
            callables without those keywords fall back to the dense
            path, which materializes (B, B) f32 slabs — supply the
            keywords for production batch sizes.
        only_use_wrong_order_pair: keep only mis-ordered pairs (negative
            scored above positive).
        return_num_pair: also return the number of valid pairs.
        click_occurance_power: weight each pair by
            (#valid pairs in its main group) ** power.
        mask: optional (B,) per-sample validity.
        label_pair_to_weight_func: optional callable mapping the (B, B)
            positive/negative label matrices to a per-pair weight matrix;
            pairs with weight <= 0 are dropped.
        binary_labels: caller's declaration that labels are in {0, 1}
            (CTR clicks) — lets the TPU kernel path compute the
            occurrence weighting in a single O(B^2) sweep
            (ops/pallas/pairwise_kernel.py); numerically identical,
            ignored off the kernel path.

    Returns:
        Scalar loss (and the pair count if ``return_num_pair``).
    """
    # kernel path: the default-BPR configuration (one or more AND-combined
    # group conditions, default label ordering) runs as a Pallas kernel on
    # TPU with O(B) HBM traffic (ops/pallas/pairwise_kernel.py)
    kernel_ok = (label_pair_to_weight_func is None
                 and pairloss_func is bpr_loss_func
                 and not kwargs)
    if use_pallas is None:
        use_pallas = kernel_ok and jax.default_backend() == "tpu"
    if use_pallas and kernel_ok:
        from rec_now_tpu.ops.pallas.pairwise_kernel import (
            pairwise_loss_pallas)
        return pairwise_loss_pallas(
            outputs, labels, groups,
            only_use_wrong_order_pair=only_use_wrong_order_pair,
            return_num_pair=return_num_pair,
            click_occurance_power=click_occurance_power, mask=mask,
            binary_labels=binary_labels)

    # bounded-memory fallback: option combinations the kernel does not
    # cover (custom label-pair weight fn, custom pair-loss callable)
    # still must not materialize (B, B) slabs at production batch
    # sizes — route to the blocked scan form, which is numerically
    # identical (tests/losses/test_blocked.py).  Custom pair-loss
    # callables qualify when they honor the tile contract
    # (:func:`_blocked_capable`): accept ``pair_mask``/``reduce_mean``
    # keywords and be elementwise per pair.  Callables without the
    # keywords fall through to the dense path — at B >= 4096 that
    # path lives several ~B^2 x 4-byte slabs in fwd+bwd.
    capable = (True if pairloss_func is bpr_loss_func
               else _blocked_capable(pairloss_func))
    route_blocked = (_as_vec(outputs).shape[0] >= BLOCKED_MIN_BATCH
                     and capable is not False)
    if route_blocked and capable is None:
        # signature-sniffed only: the callable declares the tile
        # keywords but never asserted the sum-decomposable contract
        # (fn.blocked_capable = True).  Route it — the keywords are the
        # documented opt-in surface — but say so once, because a
        # non-decomposable reduction would silently change numbers.
        # (No warning below the size gate: the dense path runs there.)
        warnings.warn(
            "pairwise_loss: routing custom pairloss_func "
            f"{getattr(pairloss_func, '__name__', pairloss_func)!r} "
            "through the blocked O(block*B) path because it declares "
            "pair_mask/reduce_mean keywords; if its reduction is not a "
            "sum over pairs (e.g. row-normalized or max-based), set "
            "fn.blocked_capable = False to keep the dense path, or "
            "True to silence this warning.", stacklevel=2)
    if route_blocked:
        from rec_now_tpu.losses.pairwise_blocked import pairwise_loss_blocked
        weight_fn = label_pair_to_weight_func
        if weight_fn is not None and kwargs:
            weight_fn = functools.partial(weight_fn, **kwargs)
        custom = (None if pairloss_func is bpr_loss_func
                  else pairloss_func)
        return pairwise_loss_blocked(
            outputs, labels, groups,
            only_use_wrong_order_pair=only_use_wrong_order_pair,
            return_num_pair=return_num_pair,
            click_occurance_power=click_occurance_power, mask=mask,
            label_pair_to_weight_func=weight_fn,
            pairloss_func=custom,
            reduce_mean=(True if custom is None
                         else _callable_reduces(pairloss_func)))

    pair_mask = generate_pair_mask(groups)
    pair_mask = _apply_sample_mask(pair_mask, mask)
    outputs_matrix, outputs_matrix_t = vec_to_matrix_pair(outputs)
    label_cond, weights_mat = _calc_label_cond_and_weights(
        labels, label_pair_to_weight_func, **kwargs)

    pair_mask = jnp.logical_and(pair_mask, label_cond)
    if only_use_wrong_order_pair:
        pair_mask = jnp.logical_and(pair_mask,
                                    outputs_matrix < outputs_matrix_t)
    pair_mask = jax.lax.stop_gradient(pair_mask)

    weights = weights_mat
    if click_occurance_power != 0.0:
        occ = _pair_occurance_weights(groups, click_occurance_power,
                                      pair_mask)
        weights = occ if weights is None else weights * occ

    if weights is not None:
        weights = jax.lax.stop_gradient(weights)

    loss = pairloss_func(outputs_matrix, outputs_matrix_t, weights,
                         pair_mask=pair_mask)
    if return_num_pair:
        n_pair = jnp.sum(pair_mask.astype(jnp.float32))
        return loss, n_pair
    return loss
