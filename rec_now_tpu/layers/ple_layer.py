"""Progressive Layered Extraction (PLE) layer.

Reference: rec_now/layers/ple_layer.py:16-321.  Structure is preserved
exactly — per extraction layer, each (shared + task-specific) task owns a
:class:`MultiDenseLayer` expert bank; non-shared tasks read their own +
the shared experts through a softmax gate; the last layer drops the
shared-task gates.  All expert banks run as batched MXU contractions.

Symbols: B batch, D in-dim, T tasks, Ts shared tasks, N experts (varies
per task/layer), U per-layer out-dim.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Activation, Initializer, get_initializer
from rec_now_tpu.layers.multi_dense_layer import MultiDenseLayer


def _extend_int_list(list_or_int: Union[int, List[int]],
                     size_extend: int) -> List[int]:
    """Broadcast-extend an int or list to ``size_extend`` entries.

    Reference: ple_layer.py:52-80.
    """
    # tuples included: flax freezes nn.Module list attributes to tuples
    if not isinstance(list_or_int, (int, list, tuple)):
        raise TypeError("`list_or_int` must be of type `int` or `list of "
                        "int`, but got `%s`" % type(list_or_int))
    if isinstance(list_or_int, int):
        list_or_int = [list_or_int]
    if not list_or_int:
        raise ValueError("list can not be empty")
    list_or_int = list(list_or_int)
    while len(list_or_int) < size_extend:
        list_or_int.append(list_or_int[-1])
    return list_or_int


class PLELayer(nn.Module):
    """PLE multi-task extraction network."""
    num_task: int
    list_of_dnn_dims: Sequence[Any]
    list_of_num_experts_per_task: Any
    num_shared_task: int = 1
    use_bias: bool = True
    activation: Activation = "relu"
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    def _normalized(self):
        """Normalize config (reference ple_layer.py:82-113).

        Returns (list_of_dnn_dims, list_of_num_experts_per_task,
        is_shared_tasks, task_names); shared tasks come first.
        """
        if not isinstance(self.list_of_dnn_dims, (list, tuple)):
            raise TypeError("`list_of_dnn_dims` must be a list or list[list]")
        num_total = self.num_task + self.num_shared_task
        num_layer = len(self.list_of_dnn_dims)
        experts = _extend_int_list(
            self.list_of_num_experts_per_task
            if isinstance(self.list_of_num_experts_per_task, (int,))
            else list(self.list_of_num_experts_per_task), num_layer)
        experts = [_extend_int_list(n, num_total) for n in experts]
        dnn_dims = [_extend_int_list(d, 1) if isinstance(d, int)
                    else list(d) for d in self.list_of_dnn_dims]
        is_shared = [True] * self.num_shared_task + [False] * self.num_task
        names = ([f"shared_{i}" for i in range(self.num_shared_task)]
                 + [f"special_{i}" for i in range(self.num_task)])
        return dnn_dims, experts, is_shared, names

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> List[jnp.ndarray]:
        """Compute PLE.

        Args:
            inputs: (B, D).

        Returns:
            list of ``num_task`` task outputs, each (B, U_last).
        """
        dnn_dims_per_layer, experts_per_layer, is_shared, names = \
            self._normalized()
        num_layer = len(dnn_dims_per_layer)
        num_total = self.num_task + self.num_shared_task

        last_outputs: List[jnp.ndarray] = []
        for layer_idx in range(num_layer):
            is_first = layer_idx == 0
            is_last = layer_idx == num_layer - 1
            dnn_dims = dnn_dims_per_layer[layer_idx]
            num_experts_per_task = experts_per_layer[layer_idx]
            num_shared_experts = sum(
                n for shared, n in zip(is_shared, num_experts_per_task)
                if shared)
            num_total_experts = sum(num_experts_per_task)

            # ---- expert banks -------------------------------------------------
            dnn_outputs, task_inputs = [], []
            for task_idx in range(num_total):
                shared = is_shared[task_idx]
                if is_first:
                    dnn_input = inputs
                elif shared:
                    dnn_input = jnp.concatenate(last_outputs, axis=-1)
                else:
                    parts = [last_outputs[task_idx]] + [
                        o for o, sh in zip(last_outputs, is_shared) if sh]
                    dnn_input = jnp.concatenate(parts, axis=-1)
                task_inputs.append(dnn_input)

                x = dnn_input
                for idx, dim in enumerate(dnn_dims):
                    last_dnn = idx == len(dnn_dims) - 1
                    x = MultiDenseLayer(
                        units=dim, num_dnn=num_experts_per_task[task_idx],
                        use_bias=self.use_bias,
                        activation=None if last_dnn else self.activation,
                        kernel_init=self.kernel_init,
                        bias_init=self.bias_init,
                        name=(f"ple_layer_{layer_idx}/task_"
                              f"{names[task_idx]}/MultiDenseLayer_{idx}"),
                    )(x)                                   # (N_t, B, U)
                dnn_outputs.append(x)

            # ---- gates --------------------------------------------------------
            gated_outputs: List[jnp.ndarray] = []
            for task_idx in range(num_total):
                shared = is_shared[task_idx]
                if shared and is_last:
                    gated_outputs.append(None)
                    continue
                if shared:
                    gate_dim = num_total_experts
                    gate_input_experts = jnp.concatenate(dnn_outputs, axis=0)
                else:
                    gate_dim = (num_experts_per_task[task_idx]
                                + num_shared_experts)
                    parts = [dnn_outputs[task_idx]] + [
                        o for o, sh in zip(dnn_outputs, is_shared) if sh]
                    gate_input_experts = jnp.concatenate(parts, axis=0)
                gate = nn.Dense(
                    gate_dim,
                    kernel_init=get_initializer("glorot_uniform"),
                    name=(f"ple_gate_{layer_idx}/task_{names[task_idx]}/"
                          "dense"))(task_inputs[task_idx])  # (B, N)
                gate = jax.nn.softmax(gate, axis=-1)
                # (N, B, U) x (B, N) -> (B, U)
                out = jnp.einsum("nbu,bn->bu", gate_input_experts, gate,
                                 preferred_element_type=jnp.float32
                                 ).astype(inputs.dtype)
                gated_outputs.append(out)

            last_outputs = gated_outputs

        return [o for o in last_outputs if o is not None]
