"""Multi-gate Mixture-of-Experts (MMoE) layer.

Reference: rec_now/layers/mmoe_layer.py:14-126.  N experts run as one
:class:`MultiDenseLayer` batched contraction; the T per-task gates run as
one more (N-in, T-out) MultiDense + softmax; the combine is a single
einsum ``(N, B, U) x (T, B, N) -> (T, B, U)`` instead of the reference's
broadcast-multiply-reduce (:116-117) — same math, one MXU contraction.

Symbols: B batch, D in-dim, N experts, T tasks, U expert out-dim.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Activation, Initializer
from rec_now_tpu.layers.multi_dense_layer import MultiDenseLayer


class MMOELayer(nn.Module):
    """MMoE: shared expert bank + per-task softmax gates."""
    num_task: int
    num_experts: int
    dnn_dims: Sequence[int]
    use_bias: bool = True
    activation: Activation = "relu"
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, merge_output: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        """Compute MMoE.

        Args:
            inputs: (B, D).
            merge_output: True -> one (T, B, U) tensor; False -> list of
                T tensors (B, U).

        Returns:
            (T, B, U) or [(B, U)] * T.
        """
        # expert bank: stacked MultiDense layers, last layer linear
        # (reference mmoe_layer.py:71-73).
        x = inputs
        for layer_idx, dim in enumerate(self.dnn_dims):
            is_last = layer_idx == len(self.dnn_dims) - 1
            x = MultiDenseLayer(
                units=dim, num_dnn=self.num_experts,
                use_bias=self.use_bias,
                activation=None if is_last else self.activation,
                kernel_init=self.kernel_init, bias_init=self.bias_init,
                name=f"experts/MultiDenseLayer_{layer_idx}")(x)
        experts_output = x                                # (N, B, U)

        # T parallel gates, each projecting D -> N, as one MultiDense
        # bank (reference mmoe_layer.py:59-61).
        gate_logits = MultiDenseLayer(
            units=self.num_experts, num_dnn=self.num_task,
            name="gates/MultiDenseLayer")(inputs)         # (T, B, N)
        gates_output = jax.nn.softmax(gate_logits, axis=-1)  # (T, B, N)

        output = jnp.einsum("nbu,tbn->tbu", experts_output, gates_output,
                            preferred_element_type=jnp.float32
                            ).astype(inputs.dtype)        # (T, B, U)
        if merge_output:
            return output
        return [output[t] for t in range(self.num_task)]
