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
    # bf16 operands on TPU (native single-pass MXU, f32 accumulate);
    # full f32 in interpret mode so CPU golden tests stay bit-tight.
    # astype is a no-op for operands already bf16 (the resident
    # constants are pre-cast OUTSIDE the kernel — a convert traced here
    # would re-execute on every grid iteration).
    if jax.default_backend() == "tpu":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())), precision=_PREC,
                               preferred_element_type=jnp.float32)


def _const_dtype(a):
    """Resident constant operands in MXU-native bf16 on TPU."""
    if jax.default_backend() == "tpu":
        return a.astype(jnp.bfloat16)
    return a


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
    wr = _const_dtype(_weight_to_wr(weight))            # (H, F*K)
    r = _const_dtype(jnp.asarray(_broadcast_mat(f, k)))
    sel = _const_dtype(jnp.asarray(_select_mat(f, k)))

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
    wr = _const_dtype(_weight_to_wr(weight))            # (H, F*K)
    r = _const_dtype(jnp.asarray(_broadcast_mat(f, k)))
    sel = _const_dtype(jnp.asarray(_select_mat(f, k)))

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


# ---------------------------------------------------------------------------
# Fully-fused CIN stack for the sum_channel=True path (the flagship
# config-#3 shape).  On a bandwidth-bound chip the per-layer kernel still
# round-trips every hidden activation (M, K) plus its gradient through
# HBM — ~160 MB/step at B=8192, D=16.  Fusing the whole stack + channel
# sum reads x0 once and writes a single (M, 1) output; the backward
# recomputes the hiddens in VMEM (flash-attention-style) and writes only
# dx0 + the weight grads.  HBM traffic drops ~10x.
#
# Last-layer collapse (exact): the channel sum makes the final layer's
# K_n-wide FK-domain dots redundant —
#
#     sum_k sum_{f,h} W_n[k,f,h] x0[m,f] prev[m,h]
#   = sum_{f,h} Wc[h,f] x0[m,f] prev[m,h],   Wc = (sum_k W_n)^T
#
# i.e. one tiny (TM,H)x(H,F) dot + a masked rowsum instead of the
# 2*M*F*K*(H+K) main/reduction dots; likewise dW_n[k] = dWc for every k
# and dprev flows through Wc alone.  This removes the single largest
# dot of both passes (~1.8x total-FLOP cut for the 2x64-layer config).
# ---------------------------------------------------------------------------


def _stack_consts(f, ks):
    """Per-distinct-K broadcast/select matrices, shared across layers."""
    uniq = sorted(set(ks))
    r = {k: jnp.asarray(_broadcast_mat(f, k)) for k in uniq}
    sel = {k: jnp.asarray(_select_mat(f, k)) for k in uniq}
    return uniq, r, sel


def _stack_fwd_kernel(n_layers, ks, kidx, output_input,
                      x0_ref, *refs):
    """Forward: x0 -> sum over all concatenated channels, one tile.

    refs: wr_1..wr_{n-1}, wc, r_(uniq), sel_(uniq), out_ref, where
    ``wc`` (H_{n-1}, F) is the channel-collapsed last-layer weight and
    uniq ranges over ks[:-1] (the layers that still need FK buffers).
    """
    n_mid = n_layers - 1
    n_uniq = len(set(ks[:n_mid]))
    wr_refs = refs[:n_mid]
    wc_ref = refs[n_mid]
    r_refs = refs[n_mid + 1:n_mid + 1 + n_uniq]
    sel_refs = refs[n_mid + 1 + n_uniq:n_mid + 1 + 2 * n_uniq]
    out_ref = refs[-1]

    x0 = x0_ref[:]                                      # (TM, F)
    acc = (jnp.sum(x0, axis=1, keepdims=True) if output_input
           else jnp.zeros((x0.shape[0], 1), jnp.float32))
    xs = {}                                             # X per distinct K
    prev = x0
    for i in range(n_mid):
        ki = kidx[i]
        if ki not in xs:
            xs[ki] = _dot(x0, r_refs[ki][:], (((1,), (0,))))
        t = _dot(prev, wr_refs[i][:], (((1,), (0,))))   # (TM, F*K_i)
        tx = t * xs[ki]
        acc = acc + jnp.sum(tx, axis=1, keepdims=True)
        prev = _dot(tx, sel_refs[ki][:], (((1,), (0,))))  # h_i
    # collapsed last layer: sum_k of its channels in one (H, F) dot
    z = _dot(prev, wc_ref[:], (((1,), (0,))))           # (TM, F)
    acc = acc + jnp.sum(x0 * z, axis=1, keepdims=True)
    out_ref[:] = acc.astype(out_ref.dtype)


def _stack_bwd_kernel(n_layers, ks, kidx, output_input,
                      x0_ref, g_ref, *refs):
    """Backward: recompute hiddens in VMEM, emit dx0 + per-layer dWr.

    refs: wr_1..wr_{n-1}, wc, r_(uniq), sel_(uniq),
          dx0_ref, dwr_1..dwr_{n-1}, dwc_ref — the last layer
    contributes only through the collapsed ``wc`` (H_{n-1}, F);
    ``dwc_ref`` is its (F, H_{n-1}) grad (equal for every channel k).
    """
    n_mid = n_layers - 1
    n_uniq = len(set(ks[:n_mid]))
    wr_refs = refs[:n_mid]
    wc_ref = refs[n_mid]
    r_refs = refs[n_mid + 1:n_mid + 1 + n_uniq]
    sel_refs = refs[n_mid + 1 + n_uniq:n_mid + 1 + 2 * n_uniq]
    dx0_ref = refs[n_mid + 1 + 2 * n_uniq]
    dwr_refs = refs[n_mid + 2 + 2 * n_uniq:n_mid + 2 + 2 * n_uniq + n_mid]
    dwc_ref = refs[-1]

    x0 = x0_ref[:]                                      # (TM, F)
    g = g_ref[:]                                        # (TM, 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for dwr in dwr_refs:
            dwr[:] = jnp.zeros_like(dwr)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)

    # forward recompute of the (small) hiddens
    xs = {}
    prevs = [x0]
    for i in range(n_mid):
        ki = kidx[i]
        if ki not in xs:
            xs[ki] = _dot(x0, r_refs[ki][:], (((1,), (0,))))
        t = _dot(prevs[i], wr_refs[i][:], (((1,), (0,))))
        prevs.append(_dot(t * xs[ki], sel_refs[ki][:], (((1,), (0,)))))

    dx0 = g * jnp.ones_like(x0) if output_input else jnp.zeros_like(x0)
    # collapsed last layer: acc += rowsum(x0 * (prev @ wc))
    p_last = prevs[-1]                                  # (TM, H_{n-1})
    z = _dot(p_last, wc_ref[:], (((1,), (0,))))         # (TM, F)
    dx0 = dx0 + g * z
    dwc_ref[:] += _dot(x0 * g, p_last, (((0,), (0,)))
                       ).astype(dwc_ref.dtype)          # (F, H_{n-1})
    dprev = g * _dot(x0, wc_ref[:], (((1,), (1,))))     # (TM, H_{n-1})
    if n_mid == 0:
        dx0 = dx0 + dprev                               # prev is x0
    dh = dprev                                          # grad into h_i
    for i in range(n_mid - 1, -1, -1):
        ki = kidx[i]
        # total grad wrt tx_i in the FK domain: the rowsum term is g on
        # every lane; the feed-forward term comes via SEL^T.
        t = _dot(prevs[i], wr_refs[i][:], (((1,), (0,))))  # recompute T_i
        gt = (_dot(dh, sel_refs[ki][:], (((1,), (1,))))
              + g * jnp.ones_like(t))
        dt = gt * xs[ki]                                # (TM, F*K_i)
        dx0 = dx0 + _dot(gt * t, r_refs[ki][:], (((1,), (1,))))
        dwr_refs[i][:] += _dot(prevs[i], dt, (((0,), (0,)))
                               ).astype(dwr_refs[i].dtype)
        dprev = _dot(dt, wr_refs[i][:], (((1,), (1,))))  # (TM, H_{i-1})
        if i == 0:
            dx0 = dx0 + dprev                           # prev_0 is x0
        else:
            dh = dprev
    dx0_ref[:] = dx0.astype(dx0_ref.dtype)


def _stack_prep(x0, weights):
    m, f = x0.shape
    ks = [int(w.shape[0]) for w in weights]
    hs = [f] + ks[:-1]
    # only the non-last layers need FK-domain constants; the last layer
    # is channel-collapsed to wc (H_{n-1}, F)
    uniq, r_map, sel_map = _stack_consts(f, ks[:-1])
    kidx = [uniq.index(k) for k in ks[:-1]]
    wrs = [_const_dtype(_weight_to_wr(w)) for w in weights[:-1]]
    wc = _const_dtype(
        jnp.transpose(jnp.sum(weights[-1], axis=0), (1, 0)))  # (H, F)
    rs = [_const_dtype(r_map[k]) for k in uniq]
    sels = [_const_dtype(sel_map[k]) for k in uniq]
    return m, f, ks, hs, uniq, kidx, wrs, wc, rs, sels


def _const_spec(a):
    return _const_spec_shape(a.shape)


def _const_spec_shape(shape):
    return pl.BlockSpec(tuple(shape), lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _stack_weight_bytes(f, ks, hs):
    """f32 bytes of the weights the stack kernels actually load.

    Non-last layers load the full (K, F, H) weight; the last layer only
    loads the channel-collapsed (H_{n-1}, F) ``wc``.
    """
    return (sum(k * f * h for k, h in zip(ks[:-1], hs[:-1]))
            + hs[-1] * f) * 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cin_stack_sum(x0: jnp.ndarray, weights, output_input: bool = True
                  ) -> jnp.ndarray:
    """Whole CIN stack + channel sum, one fused kernel.

    Args:
        x0: (M, F) flattened (B*D, F) layer-0 features.
        weights: tuple of per-layer (K_i, F, H_{i-1}) weights, H_0 = F.
        output_input: include sum over x0's channels (reference
            cin_layer.py:115-118 with output_input=True).

    Returns:
        (M,) channel-summed CIN output.
    """
    return _cin_stack_fwd_impl(x0, tuple(weights), output_input)


def _cin_stack_fwd_impl(x0, weights, output_input):
    m, f, ks, hs, uniq, kidx, wrs, wc, rs, sels = _stack_prep(x0, weights)
    kmax = max(ks[:-1], default=1)
    tile_m = _pick_tile_m(m, f, kmax, kmax, n_temps=3)
    pad = -m % tile_m
    x0p = jnp.pad(x0, ((0, pad), (0, 0))) if pad else x0
    mp = x0p.shape[0]

    kern = functools.partial(_stack_fwd_kernel, len(ks), tuple(ks),
                             tuple(kidx), output_input)
    out = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=([pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + [_const_spec(a) for a in wrs + [wc] + rs + sels]),
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), x0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * mp * sum(f * k * (h + f + k)
                                for k, h in zip(ks[:-1], hs[:-1]))
                   + 2 * mp * hs[-1] * f),
            bytes_accessed=((mp * f + mp) * 4
                            + _stack_weight_bytes(f, ks, hs)),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0p, *wrs, wc, *rs, *sels)
    return out[:m, 0]


def _cin_stack_fwd(x0, weights, output_input):
    return _cin_stack_fwd_impl(x0, tuple(weights), output_input), \
        (x0, tuple(weights))


def _cin_stack_bwd(output_input, residuals, g):
    x0, weights = residuals
    m, f, ks, hs, uniq, kidx, wrs, wc, rs, sels = _stack_prep(x0, weights)
    kmax = max(ks[:-1], default=1)
    tile_m = _pick_tile_m(m, f, kmax, kmax, n_temps=4 + len(uniq))
    pad = -m % tile_m
    if pad:
        x0p = jnp.pad(x0, ((0, pad), (0, 0)))
        gp = jnp.pad(g.reshape(m, 1), ((0, pad), (0, 0)))
    else:
        x0p, gp = x0, g.reshape(m, 1)
    mp = x0p.shape[0]

    kern = functools.partial(_stack_bwd_kernel, len(ks), tuple(ks),
                             tuple(kidx), output_input)
    outs = pl.pallas_call(
        kern,
        grid=(mp // tile_m,),
        in_specs=([pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
                  + [_const_spec(a) for a in wrs + [wc] + rs + sels]),
        out_specs=([pl.BlockSpec((tile_m, f), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
                   + [_const_spec(a) for a in wrs]
                   + [_const_spec_shape((f, hs[-1]))]),
        out_shape=([jax.ShapeDtypeStruct((mp, f), x0.dtype)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                      for w in wrs]
                   + [jax.ShapeDtypeStruct((f, hs[-1]), jnp.float32)]),
        cost_estimate=pl.CostEstimate(
            flops=(6 * mp * sum(f * k * (h + f + k)
                                for k, h in zip(ks[:-1], hs[:-1]))
                   + 6 * mp * hs[-1] * f),
            bytes_accessed=(mp * (2 * f + 1) * 4
                            + 2 * _stack_weight_bytes(f, ks, hs)),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x0p, gp, *wrs, wc, *rs, *sels)
    dx0 = outs[0][:m]
    dws = tuple(
        jnp.transpose(dwr.reshape(h, f, k), (2, 1, 0)).astype(w.dtype)
        for dwr, w, k, h in zip(outs[1:-1], weights[:-1], ks[:-1],
                                hs[:-1]))
    # every channel of the last layer shares the collapsed grad
    dwc = outs[-1]                                      # (F, H_{n-1})
    dw_last = jnp.broadcast_to(
        dwc[None, ...].astype(weights[-1].dtype), weights[-1].shape)
    return dx0, dws + (dw_last,)


cin_stack_sum.defvjp(_cin_stack_fwd, _cin_stack_bwd)


def cin_stack_sum_pallas(emb: jnp.ndarray, weights,
                         output_input: bool = True) -> jnp.ndarray:
    """Fused CIN stack + channel sum on (B, D, F) inputs -> (B, D)."""
    b, d, f = emb.shape
    out = cin_stack_sum(emb.reshape(b * d, f), tuple(weights),
                        output_input)
    return out.reshape(b, d)
