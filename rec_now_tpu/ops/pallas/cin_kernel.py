"""Fused CIN layer as a Pallas TPU kernel.

The CIN hidden layer (rec_now/layers/cin_layer.py:103-108) is

    out[m, k] = sum_{f, h} W[k, f, h] * x0[m, f] * prev[m, h]

with m ranging over the flattened (B, D) positions.  Any XLA pairwise
contraction order materializes an (M, F, H) or (M, F, K) intermediate in
HBM — ~F x the activation size (e.g. 872 MB at B=8192, D=16, F=26,
H=K=64).  This kernel tiles M and keeps the (TM, F*K) intermediate in
VMEM, computing the whole tile as THREE MXU dots with zero lane
shuffles:

    T[m, fK+k] = sum_h prev[m, h] * Wr[h, fK+k]     (MXU)   main dot
    X[m, fK+k] = x0[m, f]          = x0 @ R         (MXU)   broadcast
    out[m, k]  = sum_f T*X [m, fK+k] = (T.X) @ SEL  (MXU)   reduction

where ``Wr`` is W reshaped to (H, F*K) and ``R`` (F, F*K) /
``SEL`` (F*K, K) are constant 0/1 matrices (R[f, fK+k] = 1,
SEL[fK+k', k] = [k'==k]).  Strided-lane slicing (``t[:, f*K:(f+1)*K]``)
is NOT used anywhere: on TPU a non-128-aligned lane slice lowers to a
whole-register lane rotate, and F of them per tile cost more than the
matmuls themselves (measured: a slice-based epilogue made the kernel
~6x slower than this all-MXU form).  Broadcast/reduction by 0/1 matmul
rides the otherwise idle MXU instead.

The backward reuses the same identities (T is recomputed — one dot —
rather than staged through HBM):

    Gt    = g @ SEL^T            (TM, F*K)   g broadcast along F
    dT    = Gt . X               dX = Gt . T
    dx0   = dX @ R^T             (TM, F)
    dprev = dT @ Wr^T            (TM, H)
    dWr  += prev^T @ dT          (H, F*K)    grid-summed
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bf16 single-pass MXU: the CIN contraction feeds a channel sum + logit
# head; bf16 mantissa noise is far below the loss's statistical floor
# (AUC parity is re-verified end-to-end in tools/measure_auc_parity.py).
_PREC = jax.lax.Precision.DEFAULT


def _dot(a, b, dims):
    # Explicit bf16 operands: Mosaic lowers f32 dots to multi-pass MXU
    # even at DEFAULT precision; bf16-in/f32-accumulate is the native
    # single-pass mode (~6x the f32 rate on v5e).
    return jax.lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               (dims, ((), ())), precision=_PREC,
                               preferred_element_type=jnp.float32)


def _broadcast_mat(f: int, k: int) -> np.ndarray:
    """R (F, F*K): X = x0 @ R repeats each x0 column K times."""
    r = np.zeros((f, f * k), np.float32)
    for i in range(f):
        r[i, i * k:(i + 1) * k] = 1.0
    return r


def _select_mat(f: int, k: int) -> np.ndarray:
    """SEL (F*K, K): out = t @ SEL sums lanes with equal k (mod K)."""
    return np.tile(np.eye(k, dtype=np.float32), (f, 1))


def _cin_tile_kernel(x0_ref, prev_ref, wr_ref, r_ref, sel_ref, out_ref):
    """One M-tile forward: three MXU dots, everything in VMEM.

    x0_ref: (TM, F), prev_ref: (TM, H), wr_ref: (H, F*K),
    r_ref: (F, F*K), sel_ref: (F*K, K), out_ref: (TM, K).
    """
    t2 = _dot(prev_ref[:], wr_ref[:], (((1,), (0,))))   # (TM, F*K)
    x = _dot(x0_ref[:], r_ref[:], (((1,), (0,))))       # (TM, F*K)
    out = _dot(t2 * x, sel_ref[:], (((1,), (0,))))      # (TM, K)
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_tile_m(m: int, f: int, h: int, k: int, n_temps: int,
                 vmem_budget: int = 13 * 1024 * 1024) -> int:
    """Largest power-of-two M tile fitting the VMEM budget.

    Dominant buffers: ``n_temps`` (TM, F*K) intermediates, the resident
    (H|F, F*K) constant matrices, and the double-buffered i/o blocks.
    """
    fk = f * k
    tile = 1024
    while tile > 8:
        need = (tile * fk * 4 * n_temps          # T/X/... temporaries
                + (2 * h + f + k) * fk * 4       # Wr(+dWr), R, SEL
                + tile * (2 * f + 2 * h + 2 * k) * 4 * 2)  # i/o blocks x2
        if need <= vmem_budget:
            return tile
        tile //= 2
    return tile


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cin_flat(x0: jnp.ndarray, prev: jnp.ndarray,
             weight: jnp.ndarray) -> jnp.ndarray:
    """Fused CIN contraction over flattened positions.

    Args:
        x0: (M, F) layer-0 features per position.
        prev: (M, H) previous hidden per position.
        weight: (K, F, H).

    Returns:
        (M, K).
    """
    return _cin_flat_fwd_impl(x0, prev, weight)


def _weight_to_wr(weight):
    """(K, F, H) -> (H, F*K) with Wr[h, f*K + k] = W[k, f, h]."""
    k, f, h = weight.shape
    return jnp.transpose(weight, (2, 1, 0)).reshape(h, f * k)


def _cin_flat_fwd_impl(x0, prev, weight):
    m, f = x0.shape
    h = prev.shape[1]
    k = weight.shape[0]
    wr = _weight_to_wr(weight)                          # (H, F*K)
    r = jnp.asarray(_broadcast_mat(f, k))
    sel = jnp.asarray(_select_mat(f, k))

    tile_m = _pick_tile_m(m, f, h, k, n_temps=3)
    pad = -m % tile_m
    if pad:
        x0 = jnp.pad(x0, ((0, pad), (0, 0)))
        prev = jnp.pad(prev, ((0, pad), (0, 0)))
    mp = x0.shape[0]

    out = pl.pallas_call(
        _cin_tile_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f * k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), x0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * f * k * (h + f + k),
            bytes_accessed=(mp * f + mp * h + k * f * h + mp * k) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0, prev, wr, r, sel)
    if pad:
        out = out[:m]
    return out


def _cin_flat_fwd(x0, prev, weight):
    return _cin_flat_fwd_impl(x0, prev, weight), (x0, prev, weight)


def _cin_bwd_tile_kernel(x0_ref, prev_ref, g_ref, wr_ref, r_ref, sel_ref,
                         dx0_ref, dprev_ref, dwr_ref):
    """One M-tile of the CIN backward: six MXU dots, all in VMEM.

    x0_ref: (TM, F), prev_ref: (TM, H), g_ref: (TM, K),
    wr_ref: (H, F*K), r_ref: (F, F*K), sel_ref: (F*K, K),
    dx0_ref: (TM, F), dprev_ref: (TM, H), dwr_ref: (H, F*K) grid-summed.
    """
    x0 = x0_ref[:]                                      # (TM, F)
    prev = prev_ref[:]                                  # (TM, H)
    g = g_ref[:]                                        # (TM, K)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwr_ref[:] = jnp.zeros_like(dwr_ref)

    t2 = _dot(prev, wr_ref[:], (((1,), (0,))))          # recompute T
    x = _dot(x0, r_ref[:], (((1,), (0,))))              # (TM, F*K)
    gt = _dot(g, sel_ref[:], (((1,), (1,))))            # g tiled over F
    dt2 = gt * x                                        # (TM, F*K)
    dx0_ref[:] = _dot(gt * t2, r_ref[:], (((1,), (1,)))
                      ).astype(dx0_ref.dtype)           # (TM, F)
    dprev_ref[:] = _dot(dt2, wr_ref[:], (((1,), (1,)))
                        ).astype(dprev_ref.dtype)       # (TM, H)
    dwr_ref[:] += _dot(prev, dt2, (((0,), (0,)))
                       ).astype(dwr_ref.dtype)          # (H, F*K)


def _cin_flat_bwd(residuals, g):
    """Pallas-fused backward: per tile, everything stays in VMEM and dWr
    accumulates across the (sequential) TPU grid."""
    x0, prev, weight = residuals
    m, f = x0.shape
    h = prev.shape[1]
    k = weight.shape[0]
    wr = _weight_to_wr(weight)                          # (H, F*K)
    r = jnp.asarray(_broadcast_mat(f, k))
    sel = jnp.asarray(_select_mat(f, k))

    tile_m = _pick_tile_m(m, f, h, k, n_temps=5)
    pad = -m % tile_m
    if pad:
        x0p = jnp.pad(x0, ((0, pad), (0, 0)))
        prevp = jnp.pad(prev, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
    else:
        x0p, prevp, gp = x0, prev, g
    mp = x0p.shape[0]

    dx0, dprev, dwr = pl.pallas_call(
        _cin_bwd_tile_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, f * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f * k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, f), x0.dtype),
            jax.ShapeDtypeStruct((mp, h), prev.dtype),
            jax.ShapeDtypeStruct((h, f * k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * mp * f * k * (h + f + k),
            bytes_accessed=(mp * (2 * f + 2 * h + 2 * k)
                            + 2 * k * f * h) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0p, prevp, gp, wr, r, sel)
    if pad:
        dx0 = dx0[:m]
        dprev = dprev[:m]
    dw = jnp.transpose(dwr.reshape(h, f, k), (2, 1, 0)).astype(weight.dtype)
    return dx0, dprev, dw


cin_flat.defvjp(_cin_flat_fwd, _cin_flat_bwd)


def cin_pallas(x0: jnp.ndarray, prev: jnp.ndarray,
               weight: jnp.ndarray) -> jnp.ndarray:
    """One CIN hidden layer, Pallas-fused.

    Args:
        x0: (B, D, F); prev: (B, D, H); weight: (K, F, H).

    Returns:
        (B, D, K).
    """
    b, d, f = x0.shape
    h = prev.shape[2]
    out = cin_flat(x0.reshape(b * d, f), prev.reshape(b * d, h), weight)
    return out.reshape(b, d, -1)
