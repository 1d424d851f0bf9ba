"""Fused CIN layer as a Pallas TPU kernel.

The CIN hidden layer (rec_now/layers/cin_layer.py:103-108) is

    out[m, k] = sum_{f, h} W[k, f, h] * x0[m, f] * prev[m, h]

with m ranging over the flattened (B, D) positions.  Any XLA pairwise
contraction order materializes an (M, K, F) or (M, F, H) intermediate in
HBM — ~F x the activation size (e.g. 872 MB at B=8192, D=16, F=26,
H=K=64).  This kernel tiles M and computes each tile's contraction as a
statically unrolled sum over the H axis,

    out_tile = sum_h  diag(prev[:, h]) @ (x0_tile @ W[:, :, h]^T)

i.e. H small MXU matmuls with a broadcast column scale — nothing but
lane-aligned dots, slices and broadcasts, so Mosaic lowers it for ANY
(F, H, K), including lane-unaligned ones like F=H=26 (a flattened
``(TM, F*H)`` outer-product formulation needs a vector shape-cast
Mosaic does not support).  The (M, F, H) intermediate never exists, in
HBM or VMEM; HBM traffic is the theoretical minimum (read x0/prev
tile, write out tile, W stays resident).

The backward pass (``_cin_flat_bwd``) uses the same loop structure per
tile:

    dx0   += prev[:, h] * (g @ W_h)          per h   (TM, F)
    dprev[:, h] = rowsum((x0 @ W_h^T) * g)   per h   (TM,)
    dW_h  += (x0 * prev[:, h])^T @ g         per h   (F, K), grid-summed

with dprev columns assembled by one-hot outer products (no lane
stores) and dW accumulated across the sequential TPU grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def _cin_tile_kernel(x0_ref, prev_ref, w_ref, out_ref):
    """One M-tile: H broadcast-scaled MXU matmuls in VMEM.

    x0_ref: (TM, F), prev_ref: (TM, H), w_ref: (H, F, K),
    out_ref: (TM, K).
    """
    x0 = x0_ref[:]                                    # (TM, F)
    prev = prev_ref[:]                                # (TM, H)
    tm = x0.shape[0]
    h = prev.shape[1]
    k = out_ref.shape[1]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)

    def body(j, acc):
        # fori_loop (not Python unroll): one iteration's lane-padded
        # temporaries live at a time — an unrolled loop keeps all H of
        # them on the VMEM stack and OOMs for H ~ 26.  Column j of prev
        # is extracted by a one-hot lane reduction (dynamic lane slices
        # don't lower in Mosaic).
        wj = w_ref[j]                                 # (F, K)
        xw = jax.lax.dot_general(
            x0, wj, (((1,), (0,)), ((), ())),
            precision=_HIGH,
            preferred_element_type=jnp.float32)       # (TM, K)
        onehot = (lanes == j).astype(jnp.float32)     # (1, H)
        pj = jnp.sum(prev * onehot, axis=1, keepdims=True)
        return acc + pj * xw

    acc = jax.lax.fori_loop(0, h, body, jnp.zeros((tm, k), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


def _pick_tile_m(m: int, fh: int, k: int, dtype_bytes: int = 4,
                 vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest power-of-two M tile whose buffers fit the VMEM budget
    (x2 for pipelined double buffering)."""
    tile = 1024
    while tile > 8:
        need = (tile * fh * dtype_bytes * 2 + tile * k * dtype_bytes) * 2
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


def _cin_flat_fwd_impl(x0, prev, weight):
    m, f = x0.shape
    h = prev.shape[1]
    k = weight.shape[0]
    w_hfk = jnp.transpose(weight, (2, 1, 0))          # (H, F, K)

    tile_m = _pick_tile_m(m, f * h, k)
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
            pl.BlockSpec((h, f, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), x0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * f * h * k + 2 * mp * h * k,
            bytes_accessed=(mp * f + mp * h + k * f * h + mp * k) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0, prev, w_hfk)
    if pad:
        out = out[:m]
    return out


def _cin_flat_fwd(x0, prev, weight):
    return _cin_flat_fwd_impl(x0, prev, weight), (x0, prev, weight)


def _cin_bwd_tile_kernel(x0_ref, prev_ref, g_ref, w_ref,
                         dx0_ref, dprev_ref, dw_ref):
    """One M-tile of the CIN backward, fully fused in VMEM.

    x0_ref: (TM, F), prev_ref: (TM, H), g_ref: (TM, K),
    w_ref: (H, F, K),
    dx0_ref: (TM, F), dprev_ref: (TM, H), dw_ref: (H, F, K) grid-summed.
    """
    x0 = x0_ref[:]                                    # (TM, F)
    prev = prev_ref[:]                                # (TM, H)
    g = g_ref[:]                                      # (TM, K)
    tm, f = x0.shape
    h = prev.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)

    def body(j, carry):
        dx0, dprev = carry
        wj = w_ref[j]                                 # (F, K)
        onehot = (lanes == j).astype(jnp.float32)     # (1, H)
        pj = jnp.sum(prev * onehot, axis=1, keepdims=True)
        # dx0 += prev[:, j] * (g @ wj^T)
        gw = jax.lax.dot_general(
            g, wj, (((1,), (1,)), ((), ())),
            precision=_HIGH,
            preferred_element_type=jnp.float32)       # (TM, F)
        dx0 = dx0 + pj * gw
        # dprev[:, j] = rowsum((x0 @ wj) * g); placed via one-hot row
        xw = jax.lax.dot_general(
            x0, wj, (((1,), (0,)), ((), ())),
            precision=_HIGH,
            preferred_element_type=jnp.float32)       # (TM, K)
        q = jnp.sum(xw * g, axis=1, keepdims=True)    # (TM, 1)
        dprev = dprev + q * onehot                    # (TM, H)
        # dW_j += (x0 * prev[:, j])^T @ g
        dwj = jax.lax.dot_general(
            x0 * pj, g, (((0,), (0,)), ((), ())),
            precision=_HIGH,
            preferred_element_type=jnp.float32)       # (F, K)
        dw_ref[j] += dwj.astype(dw_ref.dtype)
        return dx0, dprev

    dx0, dprev = jax.lax.fori_loop(
        0, h, body, (jnp.zeros((tm, f), jnp.float32),
                     jnp.zeros((tm, h), jnp.float32)))
    dx0_ref[:] = dx0.astype(dx0_ref.dtype)
    dprev_ref[:] = dprev.astype(dprev_ref.dtype)


def _cin_flat_bwd(residuals, g):
    """Pallas-fused backward: per tile, everything stays in VMEM and dW
    accumulates across the (sequential) TPU grid."""
    x0, prev, weight = residuals
    m, f = x0.shape
    h = prev.shape[1]
    k = weight.shape[0]
    w_hfk = jnp.transpose(weight, (2, 1, 0))          # (H, F, K)

    tile_m = _pick_tile_m(m, f * h, k)
    pad = -m % tile_m
    if pad:
        x0p = jnp.pad(x0, ((0, pad), (0, 0)))
        prevp = jnp.pad(prev, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
    else:
        x0p, prevp, gp = x0, prev, g
    mp = x0p.shape[0]

    dx0, dprev, dw_hfk = pl.pallas_call(
        _cin_bwd_tile_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, f, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, f), x0.dtype),
            jax.ShapeDtypeStruct((mp, h), prev.dtype),
            jax.ShapeDtypeStruct((h, f, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * mp * f * h * k,
            bytes_accessed=(mp * (2 * f + 2 * h + 2 * k)
                            + 2 * k * f * h) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0p, prevp, gp, w_hfk)
    if pad:
        dx0 = dx0[:m]
        dprev = dprev[:m]
    dw = jnp.transpose(dw_hfk, (2, 1, 0)).astype(weight.dtype)
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
