"""Compressed Interaction Network (CIN) layer — xDeepFM.

Reference: rec_now/layers/cin_layer.py:12-122.  Per hidden layer k the
reference materializes the (B, D, F, H_{k-1}) outer product in HBM
(:103) before contracting with the (H_k, F*H_{k-1}) weight (:108).  Here
each layer is the fused triple contraction in
:func:`rec_now_tpu.ops.cin_contract` (XLA chained matmuls, or the Pallas
kernel on TPU) — the outer product never leaves VMEM.

Symbols: B batch, D embedding dim, F fields, Hs hidden channel sizes.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Initializer, get_initializer
from rec_now_tpu.ops.cin_op import cin_contract


class CINLayer(nn.Module):
    """CIN with per-layer weights (H_k, F, H_{k-1})."""
    hidden_sizes: Sequence[int]
    embedding_dim: int = -1
    initializer: Initializer = "glorot_uniform"
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, List[jnp.ndarray]],
                 output_input: bool = True,
                 sum_channel: bool = True) -> jnp.ndarray:
        """Compute the CIN.

        Args:
            inputs: list of F field embeddings each (B, D), or (B, F, D),
                or flat (B, F*D) (requires ``embedding_dim``).
            output_input: include layer 0 (the input) in the output.
            sum_channel: sum over the channel axis (True -> (B, D));
                otherwise channels are flattened with D.

        Returns:
            sum_channel=True:  (B, D)
            sum_channel=False: (B, sum(Hs)*D) — plus F*D more when
                ``output_input``.
        """
        if isinstance(inputs, (list, tuple)):
            emb = jnp.stack(inputs, axis=1)               # (B, F, D)
        elif inputs.ndim == 3:
            emb = inputs                                  # (B, F, D)
        else:
            if self.embedding_dim <= 0:
                raise ValueError(
                    "embedding_dim must be set when inputs is a flat "
                    "(B, F*D) matrix")
            emb = jnp.reshape(
                inputs, (-1, inputs.shape[-1] // self.embedding_dim,
                         self.embedding_dim))             # (B, F, D)
        num_field = emb.shape[1]

        x0 = jnp.transpose(emb, (0, 2, 1))                # (B, D, F)
        extended = [num_field] + list(self.hidden_sizes)
        init = get_initializer(self.initializer)
        weights = []
        for layer_idx in range(1, len(extended)):
            num_channel = extended[layer_idx]
            num_prev = extended[layer_idx - 1]
            # the reference shape (1, 1, H_k, F*H_{k-1}) (cin_layer.py:61)
            # is stored unflattened as (H_k, F, H_{k-1}) for the fused
            # contraction; glorot fan matches the flattened 2-D view.
            weights.append(self.param(
                f"weight_of_layer{layer_idx}",
                _flat_fan_init(init, num_channel, num_field * num_prev),
                (num_channel, num_field, num_prev)))

        import jax
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas and sum_channel and weights:
            # whole stack + channel sum in one kernel: reads x0 once,
            # writes (B, D) — ~10x less HBM traffic than per-layer
            from rec_now_tpu.ops.pallas.cin_kernel import (
                cin_stack_sum_pallas)
            return cin_stack_sum_pallas(x0, tuple(weights),
                                        output_input=output_input)

        layers = [x0]
        for weight in weights:
            hidden = cin_contract(x0, layers[-1], weight,
                                  use_pallas=use_pallas)   # (B, D, H_k)
            layers.append(hidden)

        if not output_input:
            layers = layers[1:]
        output = jnp.concatenate(layers, axis=-1)         # (B, D, sum(Hs))
        if sum_channel:
            return jnp.sum(output, axis=-1)               # (B, D)
        output = jnp.transpose(output, (0, 2, 1))         # (B, sum(Hs), D)
        merged = output.shape[1] * output.shape[2]
        return jnp.reshape(output, (-1, merged))          # (B, sum(Hs)*D)


def _flat_fan_init(base_init, num_channel: int, fan_in: int):
    """Initialize (K, F, H) with the fan of its flattened (K, F*H) view."""
    def init(key, shape, dtype=jnp.float32):
        flat = base_init(key, (shape[1] * shape[2], shape[0]), dtype)
        return jnp.reshape(jnp.transpose(flat), shape)
    return init
