"""Fused CIN layer as a Pallas TPU kernel.

The CIN hidden layer (rec_now/layers/cin_layer.py:103-108) is

    out[m, k] = sum_{f, h} W[k, f, h] * x0[m, f] * prev[m, h]

with m ranging over the flattened (B, D) positions.  Any XLA pairwise
contraction order materializes an (M, K, F) or (M, F, H) intermediate in
HBM — ~F x the activation size (e.g. 872 MB at B=8192, D=16, F=26,
H=K=64).  This kernel tiles M, forms each tile's (TM, F*H) outer
product in VMEM, and contracts it against the reshaped (F*H, K) weight
on the MXU — the outer product never leaves VMEM, so HBM traffic is the
theoretical minimum (read x0/prev tile, write out tile, W stays
resident).

The backward pass reuses the same fused structure (see
``_cin_flat_bwd``): dW is one (F*H, TM)x(TM, K) matmul per tile and
dx0/dprev contract the incoming grad with W before a cheap elementwise
reduction — again with only (TM, F, H)-sized VMEM intermediates, XLA
fusing those two einsums without an M-sized 4-D tensor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cin_tile_kernel(x0_ref, prev_ref, w_ref, out_ref):
    """One M-tile: outer product in VMEM + one MXU matmul.

    x0_ref: (TM, F), prev_ref: (TM, H), w_ref: (K, F*H) flattened,
    out_ref: (TM, K).
    """
    x0 = x0_ref[:]                                    # (TM, F)
    prev = prev_ref[:]                                # (TM, H)
    tm, f = x0.shape
    h = prev.shape[1]
    outer = x0[:, :, None] * prev[:, None, :]         # (TM, F, H) in VMEM
    v = outer.reshape(tm, f * h)                      # (TM, F*H)
    out_ref[:] = jax.lax.dot_general(
        v, w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)                           # (TM, K)


def _pick_tile_m(m: int, fh: int, k: int, dtype_bytes: int = 4,
                 vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two M tile whose buffers fit the VMEM budget."""
    tile = 1024
    while tile > 8:
        need = tile * fh * dtype_bytes * 2 + tile * k * dtype_bytes
        if need <= vmem_budget and m % tile == 0:
            return tile
        if need <= vmem_budget and tile <= m:
            # allow non-dividing tile; grid uses cdiv with padding
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
    w_flat = weight.reshape(k, f * h)

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
            pl.BlockSpec((k, f * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), x0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * f * h * k + mp * f * h,
            bytes_accessed=(mp * f + mp * h + k * f * h + mp * k) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0, prev, w_flat)
    if pad:
        out = out[:m]
    return out


def _cin_flat_fwd(x0, prev, weight):
    return _cin_flat_fwd_impl(x0, prev, weight), (x0, prev, weight)


def _cin_bwd_tile_kernel(x0_ref, prev_ref, g_ref, w_ref,
                         dx0_ref, dprev_ref, dw_ref):
    """One M-tile of the CIN backward, fully fused in VMEM.

    t = g_tile @ W_flat                    (TM, F*H)      MXU
    dx0[m, f]  = sum_h t[m, f, h] prev[m, h]              VPU reduce
    dprev[m,h] = sum_f t[m, f, h] x0[m, f]                VPU reduce
    dW        += outer(x0, prev)^T @ g_tile (F*H, K)      MXU, grid-summed
    """
    x0 = x0_ref[:]                                    # (TM, F)
    prev = prev_ref[:]                                # (TM, H)
    g = g_ref[:]                                      # (TM, K)
    tm, f = x0.shape
    h = prev.shape[1]

    t = jax.lax.dot_general(
        g, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (TM, F*H)
    t3 = t.reshape(tm, f, h)
    dx0_ref[:] = jnp.sum(t3 * prev[:, None, :], axis=2).astype(
        dx0_ref.dtype)                                # (TM, F)
    dprev_ref[:] = jnp.sum(t3 * x0[:, :, None], axis=1).astype(
        dprev_ref.dtype)                              # (TM, H)

    outer = (x0[:, :, None] * prev[:, None, :]).reshape(tm, f * h)
    dw_part = jax.lax.dot_general(
        outer, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (F*H, K)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
    dw_ref[:] += dw_part.astype(dw_ref.dtype)


def _cin_flat_bwd(residuals, g):
    """Pallas-fused backward: per tile, everything stays in VMEM and dW
    accumulates across the (sequential) TPU grid."""
    x0, prev, weight = residuals
    m, f = x0.shape
    h = prev.shape[1]
    k = weight.shape[0]
    w_flat = weight.reshape(k, f * h)

    tile_m = _pick_tile_m(m, f * h, k)
    pad = -m % tile_m
    if pad:
        x0p = jnp.pad(x0, ((0, pad), (0, 0)))
        prevp = jnp.pad(prev, ((0, pad), (0, 0)))
        gp = jnp.pad(g, ((0, pad), (0, 0)))
    else:
        x0p, prevp, gp = x0, prev, g
    mp = x0p.shape[0]

    dx0, dprev, dw_flat = pl.pallas_call(
        _cin_bwd_tile_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f * h, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, f), x0.dtype),
            jax.ShapeDtypeStruct((mp, h), prev.dtype),
            jax.ShapeDtypeStruct((f * h, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * mp * f * h * k,
            bytes_accessed=(mp * (2 * f + 2 * h + 2 * k)
                            + 2 * k * f * h) * 4,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0p, prevp, gp, w_flat)
    if pad:
        dx0 = dx0[:m]
        dprev = dprev[:m]
    dw = jnp.transpose(dw_flat).reshape(k, f, h).astype(weight.dtype)
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
