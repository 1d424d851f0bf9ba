"""Fused CIN contraction.

Reference hot loop (rec_now/layers/cin_layer.py:103-108): per hidden
layer, an explicit outer product ``einsum('bdf,bdh->bdfh')`` materializes
a (B, D, F, H) tensor in HBM before contracting it with the layer weight.
That intermediate is the canonical fusion target (SURVEY.md §3.5).

TPU-native formulation: the whole layer is the triple contraction

    out[b, d, k] = sum_{f, h} W[k, f, h] * x0[b, d, f] * prev[b, d, h]

evaluated as two chained MXU matmuls per (b, d) tile with the (F, H)
outer product living only in VMEM/registers:

    t[b, d, k, f] = sum_h prev[b, d, h] * W[k, f, h]      (MXU)
    out[b, d, k]  = sum_f t[b, d, k, f] * x0[b, d, f]     (MXU)

The XLA path expresses this as a single ``einsum`` with an explicit
contraction order; the Pallas kernel (ops/pallas/cin_kernel.py) tiles it
over (B, D) so no (B, D, K, F) intermediate ever reaches HBM.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def cin_contract_xla(x0: jnp.ndarray,
                     prev: jnp.ndarray,
                     weight: jnp.ndarray) -> jnp.ndarray:
    """One CIN hidden layer via XLA einsum.

    Args:
        x0: (B, D, F) transposed layer-0 field embeddings.
        prev: (B, D, H) previous hidden layer.
        weight: (K, F, H) layer weight (K = this layer's channel count).

    Returns:
        (B, D, K).
    """
    # Contract H first (prev x W), then F (with x0): both steps are
    # batched matmuls; XLA fuses the elementwise scale-free chain and
    # never round-trips (B, D, F, H) through HBM.
    return jnp.einsum("bdh,kfh,bdf->bdk", prev, weight, x0,
                      optimize=[(0, 1), (0, 1)],
                      preferred_element_type=jnp.float32
                      ).astype(x0.dtype)


def cin_contract(x0: jnp.ndarray,
                 prev: jnp.ndarray,
                 weight: jnp.ndarray,
                 use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """One CIN hidden layer; auto-dispatch Pallas kernel on TPU."""
    import jax
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from rec_now_tpu.ops.pallas.cin_kernel import cin_pallas
        return cin_pallas(x0, prev, weight)
    return cin_contract_xla(x0, prev, weight)
