"""DCN-mix (DCN-V2) low-rank mixture-of-experts cross layer.

Reference: rec_now/layers/dcn_mix_layer.py:12-151.  Per layer, N experts
each project (B, D) into an S-dim subspace, transform, project back, gate
with a softmax over experts, and multiply elementwise with x0.

All per-layer expert kernels are stored stacked over (L, N, ...) and each
expert contraction is one batched MXU matmul (``dot_general`` with the
expert axis as batch).  The layer loop is sequential by construction
(each layer consumes the previous output), so it stays a Python loop over
static L.

Symbols: B batch, D in-dim, S subspace dim, N experts, L layers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation, get_initializer,
                                     glorot_uniform_nd)


class DCNMixLayer(nn.Module):
    """DCN-V2 mixture-of-low-rank-experts cross network."""
    dim_sub_space: int
    num_layer: int = 1
    num_expert: int = 2
    activation_inner: Activation = "tanh"
    activation_outer: Activation = "tanh"
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Apply the DCN-mix stack.

        Args:
            inputs: (B, D).

        Returns:
            (B, D).
        """
        d = inputs.shape[-1]
        s = self.dim_sub_space
        n = self.num_expert
        kinit = (glorot_uniform_nd(2, 3) if isinstance(self.kernel_init, str)
                 and self.kernel_init == "glorot_uniform"
                 else get_initializer(self.kernel_init))
        # stacked over layers: (L, N, D, S), (L, N, S, S), (L, N, S, D),
        # biases (L, 1, N, D), gates (L, D, N).
        origin_to_sub = self.param("origin_to_sub_kernels", kinit,
                                   (self.num_layer, n, d, s))
        sub_to_sub = self.param("sub_to_sub_kernels", kinit,
                                (self.num_layer, n, s, s))
        sub_to_origin = self.param("sub_to_origin_kernels", kinit,
                                   (self.num_layer, n, s, d))
        biases = self.param("biases", get_initializer(self.bias_init),
                            (self.num_layer, 1, n, d))
        gate_kernels = self.param(
            "gate_kernels", get_initializer("glorot_uniform"),
            (self.num_layer, d, n))
        act_in = get_activation(self.activation_inner)
        act_out = get_activation(self.activation_outer)

        x0 = inputs[:, None, :]                           # (B, 1, D)
        x = inputs                                        # (B, D)
        for li in range(self.num_layer):
            sub = jnp.einsum("bd,nds->bns", x, origin_to_sub[li],
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)            # (B, N, S)
            sub = act_in(sub)
            sub = jnp.einsum("bns,nst->bnt", sub, sub_to_sub[li],
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)            # (B, N, S)
            sub = act_out(sub)
            origin = jnp.einsum("bns,nsd->bnd", sub, sub_to_origin[li],
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype)         # (B, N, D)
            origin = origin + biases[li]                  # (B, N, D)
            origin = x0 * origin                          # (B, N, D)

            gates = x @ gate_kernels[li]                  # (B, N)
            gates = jax.nn.softmax(gates, axis=-1)        # (B, N)
            x = jnp.einsum("bnd,bn->bd", origin, gates,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)              # (B, D)
        return x
