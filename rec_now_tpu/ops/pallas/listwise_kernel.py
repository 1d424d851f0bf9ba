"""In-batch listwise softmax-CE loss as Pallas TPU kernels.

Anchor-row formulation of losses/listwise.py with the same tiling
architecture as ops/pallas/pairwise_kernel.py: the grid walks anchor-row
blocks; all (B,) column vectors stay VMEM-resident; per-block (R, B)
membership/softmax slabs never touch HBM.

Forward accumulates ``(sum of valid rows' CE, valid-row count)``;
backward emits ``dlogits[j] = sum_i valid_i * (softmax_ij - p_ij)``
purely as column accumulation (logits enter only as columns).
Label distributions are constants (reference stop_gradient).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rec_now_tpu.ops.pallas.pairwise_kernel import (_blocked, _full,
                                                    _interpret, _row_tile,
                                                    _rows2d, _cols2d)

_NEG = -1e9


def _tile_rows(g_rows, g_cols, lab_cols, x_cols, i0, pos_neg_th):
    """Per-block listwise row quantities.

    Returns (valid (R,), p (R, B), z (R, B) masked logits).
    """
    r = g_rows.shape[0]
    b = g_cols.shape[0]
    member = g_rows[:, None] == g_cols[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (r, b), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, b), 0) + i0
    member_f = member.astype(jnp.float32)

    # all row reductions keep dims: Mosaic's relayout of 1-D (R,)
    # vectors out of 2-D reductions is buggy/unsupported — (R, 1)
    # shapes stay in natural layouts (mirrors pairwise_kernel.py)
    earlier = jnp.logical_and(member, col < row)
    first_occ = jnp.logical_not(jnp.any(earlier, axis=1, keepdims=True))
    lab_row = lab_cols[None, :] * member_f
    has_pos = jnp.any(lab_row > pos_neg_th, axis=1, keepdims=True)
    has_neg = jnp.any((lab_cols[None, :] - pos_neg_th) * member_f < 0.0,
                      axis=1, keepdims=True)
    valid = first_occ & has_pos & has_neg                  # (R, 1)

    lsum = jnp.sum(lab_row, axis=1, keepdims=True)
    p = lab_row / jnp.where(lsum == 0.0, 1.0, lsum)
    z = jnp.where(member, x_cols[None, :], _NEG)
    return valid, p, z


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def listwise_loss_sum(logits, labels, groups, pos_neg_th: float = 0.5):
    """(sum of valid anchor rows' softmax-CE, valid-row count)."""
    loss, cnt, _ = _lw_fused_impl(logits, labels, groups, pos_neg_th)
    return loss, cnt


def _lw_fused_impl(logits, labels, groups, pos_neg_th):
    """ONE O(B^2) sweep: loss sum, valid count AND d/d logits.

    The r4 layout ran separate fwd and bwd sweeps that both rebuild the
    identical membership/softmax tile; emitting the column-accumulated
    gradient from the forward halves the listwise O(B^2) work (same
    fusion as pairwise_kernel._pair_loss_fused_impl).
    """
    b = logits.shape[0]
    tile = _row_tile(b)

    def kernel(gr, xf, lf, gf, loss_ref, cnt_ref, dcol_ref):
        step = pl.program_id(0)
        i0 = step * tile
        valid, p, z = _tile_rows(gr[0, 0], gf[0], lf[0], xf[0], i0,
                                 pos_neg_th)
        zmax = jnp.max(z, axis=1, keepdims=True)
        ez = jnp.exp(z - zmax)
        sez = jnp.sum(ez, axis=1, keepdims=True)           # (R, 1)
        lse = jnp.log(sez) + zmax                          # (R, 1)
        ce = lse - jnp.sum(p * z, axis=1, keepdims=True)   # (R, 1)
        soft = ez / sez                                    # (R, B)
        vf = valid.astype(jnp.float32)                     # (R, 1)

        @pl.when(step == 0)
        def _():
            loss_ref[0, 0] = 0.0
            cnt_ref[0, 0] = 0.0
            dcol_ref[...] = jnp.zeros_like(dcol_ref)
        loss_ref[0, 0] += jnp.sum(ce * vf)
        cnt_ref[0, 0] += jnp.sum(vf)
        dcol_ref[...] += jnp.sum((soft - p) * vf, axis=0,
                                 keepdims=True)            # (1, B)

    loss, cnt, dcol = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[_blocked(tile)] + [_full(b)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [_full(b)],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((1, b), jnp.float32)],
        interpret=_interpret(),
    )(_rows2d(groups.astype(jnp.int32), tile),
      _cols2d(logits.astype(jnp.float32)),
      _cols2d(labels.astype(jnp.float32)),
      _cols2d(groups.astype(jnp.int32)))
    return loss[0, 0], cnt[0, 0], dcol.reshape(b)


def _lw_fwd(logits, labels, groups, pos_neg_th):
    loss, cnt, dx = _lw_fused_impl(logits, labels, groups, pos_neg_th)
    return (loss, cnt), (dx.astype(logits.dtype),)


def _lw_bwd(pos_neg_th, residuals, cotangents):
    (dx,) = residuals
    g_loss, _ = cotangents
    # keep the cotangent in the logits dtype (bf16 dx would promote)
    return ((dx * g_loss).astype(dx.dtype), None, None)


listwise_loss_sum.defvjp(_lw_fwd, _lw_bwd)


def listwise_loss_pallas(group_ids, labels, logits,
                         pos_neg_th: float = 0.5,
                         reduce_mean: bool = True):
    """Kernel-backed in-batch listwise loss (reference semantics).

    Returns the mean CE over valid groups (0.0 when none) like
    :func:`rec_now_tpu.losses.listwise.listwise_loss`; with
    ``reduce_mean=False`` returns (sum, count) for cross-shard pooling.
    """
    g = jnp.reshape(group_ids, (-1,))
    labels = jnp.reshape(labels, (-1,))
    logits = jnp.reshape(logits, (-1,))
    b0 = logits.shape[0]
    tile = _row_tile(b0) if b0 % 8 == 0 else 8
    pad = -b0 % max(tile, 8)
    if pad:
        # padded anchors get a unique sentinel group with no members ->
        # invalid rows
        logits = jnp.pad(logits, (0, pad), constant_values=0.0)
        labels = jnp.pad(labels, (0, pad))
        g = jnp.pad(g.astype(jnp.int32), (0, pad),
                    constant_values=jnp.int32(2 ** 30))

    loss_sum, cnt = listwise_loss_sum(logits, labels, g, pos_neg_th)
    cnt = jax.lax.stop_gradient(cnt)
    if not reduce_mean:
        return loss_sum, cnt
    loss = loss_sum / jnp.where(cnt == 0.0, 1.0, cnt)
    return jnp.where(cnt == 0.0, 0.0, loss)
