"""Pallas TPU kernels: streaming dense-apply embedding-optimizer passes.

The dense-apply update (embedding/sharded.py) scatters the batch's
grads into a dense per-shard buffer, then runs whole-table elementwise
optimizer passes.  In XLA the adagrad pass runs ~10x below HBM
streaming bandwidth at the bench shapes (4.5 ms for a 166 MB local
shard on v5e): the lane-packed layout stores ``pack`` rows per 128-lane
line, so the per-row reductions (mean of squared grads over the
embedding dim) and the scale broadcast become cross-lane reshapes that
Mosaic/XLA serialize.

These kernels stream (table, state, grads) tiles through VMEM once and
express the within-line group reductions as tiny MXU matmuls against a
constant (W, P) group-indicator matrix:

    sq_sum  = (g * g) @ M        # (T, W) @ (W, P) -> (T, P)
    scale_w = scale  @ M^T       # (T, P) @ (P, W) -> (T, W)

so everything stays in natural (8, 128) vector registers — no
cross-lane shuffles.  One pass, HBM-bound.

Used by ShardedEmbeddingTable's dense update mode on TPU; the XLA
elementwise path remains as the interpret-mode/CPU fallback and the
numerical reference (tests assert exact agreement).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(pack: int, dim: int) -> np.ndarray:
    """(W, P) indicator: column p marks the p-th ``dim``-wide group."""
    w = pack * dim
    m = np.zeros((w, pack), np.float32)
    for p in range(pack):
        m[p * dim:(p + 1) * dim, p] = 1.0
    return m


def _adagrad_kernel(table_ref, acc_ref, g_ref, m_ref, mt_ref,
                    new_table_ref, new_acc_ref, *, lr, dim, eps):
    g = g_ref[...].astype(jnp.float32)                    # (T, W)
    sq = jax.lax.dot_general(
        g * g, m_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) / dim          # (T, P)
    new_acc = acc_ref[...] + sq
    scale = lr / jnp.sqrt(jnp.maximum(new_acc, eps))       # (T, P)
    scale_w = jax.lax.dot_general(
        scale, mt_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # (T, W)
    new_table_ref[...] = table_ref[...] - scale_w * g
    new_acc_ref[...] = new_acc


def _adam_kernel(table_ref, m_ref, v_ref, g_ref, cnt_ref, t_ref,
                 gm_ref, gmt_ref, new_table_ref, new_m_ref, new_v_ref,
                 *, lr, b1, b2, eps):
    g = g_ref[...].astype(jnp.float32)                    # (T, W)
    touched = (cnt_ref[...] > 0).astype(jnp.float32)      # (T, P)
    tw = jax.lax.dot_general(
        touched, gmt_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)               # (T, W) 0/1
    m_old = m_ref[...]
    v_old = v_ref[...]
    m_new = m_old + tw * ((b1 - 1.0) * m_old + (1.0 - b1) * g)
    v_new = v_old + tw * ((b2 - 1.0) * v_old + (1.0 - b2) * g * g)
    t = t_ref[0].astype(jnp.float32)
    c1 = 1.0 - jnp.exp(t * np.log(b1))                    # 1 - b1^t
    c2 = 1.0 - jnp.exp(t * np.log(b2))
    mhat = m_new / c1
    vhat = v_new / c2
    upd = tw * (lr * mhat / (jnp.sqrt(vhat) + eps))
    new_table_ref[...] = table_ref[...] - upd
    new_m_ref[...] = m_new
    new_v_ref[...] = v_new


def _vma(x):
    """Varying-manual-axes of ``x`` (so the kernels work in shard_map)."""
    try:
        return jax.typeof(x).vma
    except AttributeError:  # older jax: no vma tracking
        return None


def _out_struct(shape, dtype, vma):
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _pick_tile(vp: int, width: int, wide_bufs: int,
               vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Rows per tile given ``wide_bufs`` (T, W) blocks in flight.

    Budget covers the x2 of pipelined double buffering (the scoped-vmem
    limit is 16 MB).  The grid is ``ceil(vp / tile)``; Pallas masks the
    ragged edge block (partial writes are dropped, padded reads feed
    ops that cannot produce NaN here), so no divisibility constraint.
    """
    tile = 4096
    while tile > 8:
        if wide_bufs * tile * width * 4 * 2 <= vmem_budget:
            return min(tile, vp)
        tile //= 2
    return tile


def adagrad_dense_pass(table: jnp.ndarray, acc: jnp.ndarray,
                       dense_g: jnp.ndarray, *, lr: float, pack: int,
                       dim: int, eps: float = 1e-12):
    """One streaming adagrad pass over a lane-packed table shard.

    Args:
        table: (VP, W) packed table, W = pack * dim.
        acc: (VP, P) per-row accumulators.
        dense_g: (VP, W) densified grads (zeros where untouched).
        lr, pack, dim, eps: hyper-params / layout.

    Returns:
        (new_table, new_acc); exact match of the XLA elementwise pass.
    """
    vp, w = table.shape
    tile = _pick_tile(vp, w, wide_bufs=3)  # table/g in + table out
    m = jnp.asarray(_group_matrix(pack, dim))
    grid = pl.cdiv(vp, tile)
    row_spec = pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((tile, pack), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_adagrad_kernel, lr=lr, dim=float(dim),
                          eps=eps),
        grid=(grid,),
        in_specs=[row_spec, acc_spec, row_spec,
                  full(w, pack), full(pack, w)],
        out_specs=(row_spec, acc_spec),
        out_shape=(_out_struct((vp, w), table.dtype, _vma(table)),
                   _out_struct((vp, pack), acc.dtype, _vma(acc))),
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=2 * vp * w * pack * 2 + 6 * vp * w,
            bytes_accessed=(3 * vp * w + 2 * vp * pack) * 4,
            transcendentals=vp * pack),
        interpret=jax.default_backend() != "tpu",
    )(table, acc, dense_g, m, m.T)


def adam_dense_pass(table: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                    dense_g: jnp.ndarray, cnt: jnp.ndarray,
                    step: jnp.ndarray, *, lr: float, b1: float,
                    b2: float, eps: float, pack: int, dim: int):
    """One streaming lazy-Adam pass (moments decay only where touched).

    Args:
        table/m/v: (VP, W) packed table and moments.
        dense_g: (VP, W) densified grads.
        cnt: (VP, P) touched counts (> 0 where a row was updated).
        step: scalar int step count (for bias correction).

    Returns:
        (new_table, new_m, new_v).
    """
    vp, w = table.shape
    tile = _pick_tile(vp, w, wide_bufs=7)  # t/m/v/g in + t/m/v out
    gm = jnp.asarray(_group_matrix(pack, dim))
    grid = pl.cdiv(vp, tile)
    row_spec = pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((tile, pack), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    step_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=(grid,),
        in_specs=[row_spec, row_spec, row_spec, row_spec, cnt_spec,
                  step_spec, full(w, pack), full(pack, w)],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=(_out_struct((vp, w), table.dtype, _vma(table)),
                   _out_struct((vp, w), m.dtype, _vma(m)),
                   _out_struct((vp, w), v.dtype, _vma(v))),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * vp * w * pack * 2 + 14 * vp * w,
            bytes_accessed=(7 * vp * w + vp * pack) * 4,
            transcendentals=2 * vp),
        interpret=jax.default_backend() != "tpu",
    )(table, m, v, dense_g, cnt, step.reshape(1).astype(jnp.int32),
      gm, gm.T)
