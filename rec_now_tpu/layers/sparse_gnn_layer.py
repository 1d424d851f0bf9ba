"""Sparse field-graph convolution layer.

Reference: rec_now/layers/sparse_gnn_layer.py:18-261.  A hand-specified
directed field-adjacency graph; each GNN layer learns one weight per edge,
densifies them into an (F, F) matrix and computes
``out = act(out + out @ W)``.

TPU-native detail: F is tiny (tens), so the "sparse" structure is best
expressed as a *static scatter* of the (E,) edge-weight vector into a
dense (F, F) matrix at trace time (``zeros.at[rows, cols].set(w)``) —
XLA constant-folds the index plumbing and the matmul runs dense on the
MXU, which beats any sparse format at this size.

Symbols: B batch, D dim, F fields, E edges.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, get_activation,
                                     constant_initializer)

DEFAULT_NEIGHBOR_INITIAL_WEIGHT = 0.1


def list_of_edge_to_neighbors(list_of_edge, directed: bool = True) -> Dict:
    """Convert an edge list to the neighbor-dict form.

    Each edge is (node_to, node_from): node_to aggregates node_from.
    Reference: sparse_gnn_layer.py:236-261.
    """
    field2neighbors: Dict[Any, set] = {}

    def add_pair(node_to, node_from):
        field2neighbors.setdefault(node_to, set()).add(node_from)

    for pair in list_of_edge:
        node_to, node_from = pair[0], pair[1]
        add_pair(node_to, node_from)
        if not directed:
            add_pair(node_from, node_to)
    return field2neighbors


class SparseGNNLayer(nn.Module):
    """Graph convolution over a static field graph with learned edges."""
    fields: Sequence[Any]
    field2neighbors: Any
    initial_weight: float = DEFAULT_NEIGHBOR_INITIAL_WEIGHT
    num_layers: int = 1
    share_weights_between_layers: bool = True
    activation: Activation = "tanh"

    # expose for parity with the reference's staticmethod
    list_of_edge_to_neighbors = staticmethod(list_of_edge_to_neighbors)

    def _neighbors_dict(self) -> Dict:
        f2n = self.field2neighbors
        if isinstance(f2n, (list, set, tuple)):
            return list_of_edge_to_neighbors(f2n)
        # Flax wraps dict attributes in FrozenDict; accept any Mapping.
        from collections.abc import Mapping
        if not isinstance(f2n, Mapping):
            raise TypeError(
                "field2neighbors must be one of `list of pairs`, `set of "
                f"pairs`, `dict of neighbors`, but get {type(f2n)}")
        return dict(f2n)

    def _validate(self, f2n: Dict):
        fields = list(self.fields)
        set_fields = set(fields)
        if len(set_fields) != len(fields):
            raise ValueError(
                f"{len(fields) - len(set_fields)} duplicated fields in "
                "fields.")
        for field, neighbors in f2n.items():
            if field not in set_fields:
                raise ValueError(
                    f"field `{field}` in field2neighbors but not in fields.")
            for n in neighbors:
                if n not in set_fields:
                    raise ValueError(
                        f"field `{n}` in field2neighbors but not in fields.")

    def _edge_indices(self, f2n: Dict):
        """Static (E, 2) [neighbor_idx, node_idx] indices, sorted like the
        reference (sparse_gnn_layer.py:122-133)."""
        field2idx = {f: i for i, f in enumerate(self.fields)}
        indices = []
        for idx, field in enumerate(self.fields):
            for neighbor in f2n.get(field, []):
                indices.append([field2idx[neighbor], idx])
        indices = sorted(indices)
        return np.asarray(indices, dtype=np.int32)

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, List[jnp.ndarray]],
                 return_all_layers: bool = False,
                 transpose_outputs: bool = True,
                 flattern_outputs: bool = True):
        """Run the stacked graph convolutions.

        Args:
            inputs: (B, F, D) or (B, D, F) or (B, F*D) or list of F
                (B, D) embeddings.  A 3-D input whose middle axis equals
                F is treated as (B, F, D), like the reference.
            return_all_layers: return every layer's output.
            transpose_outputs: return (B, F, D) layout instead of
                (B, D, F).
            flattern_outputs: flatten the last two axes.

        Returns:
            (B, F*D) by default; list when ``return_all_layers``.
        """
        f2n = self._neighbors_dict()
        self._validate(f2n)
        num_nodes = len(self.fields)
        indices = self._edge_indices(f2n)
        num_edges = len(indices)
        num_weight_sets = (1 if self.share_weights_between_layers
                           else self.num_layers)
        gnn_weights = [
            self.param(f"weights_{i}",
                       constant_initializer(self.initial_weight),
                       (num_edges,))
            for i in range(num_weight_sets)
        ]
        act = get_activation(self.activation)

        # normalize input to (B, D, F)
        if isinstance(inputs, (list, tuple)):
            inputs = jnp.concatenate(inputs, axis=-1)     # (B, F*D)
        if inputs.ndim == 2:
            all_dim = inputs.shape[-1]
            if all_dim % num_nodes != 0:
                raise ValueError(
                    f"can not determine embedding_dim! {all_dim} can not "
                    f"be divided by {num_nodes}.")
            inputs = jnp.reshape(inputs,
                                 (-1, num_nodes, all_dim // num_nodes))
        if inputs.shape[1] == num_nodes:
            inputs = jnp.transpose(inputs, (0, 2, 1))     # (B, D, F)

        outputs = inputs
        all_outputs = []
        for i in range(self.num_layers):
            w = gnn_weights[i % num_weight_sets]
            dense_w = jnp.zeros((num_nodes, num_nodes),
                                dtype=w.dtype
                                ).at[indices[:, 0], indices[:, 1]].set(w)
            conved = outputs @ dense_w                    # (B, D, F)
            outputs = act(outputs + conved)               # (B, D, F)
            all_outputs.append(outputs)

        def _finish(x):
            if transpose_outputs:
                x = jnp.transpose(x, (0, 2, 1))           # (B, F, D)
            if flattern_outputs:
                x = jnp.reshape(x, (x.shape[0], x.shape[1] * x.shape[2]))
            return x

        if return_all_layers:
            return [_finish(x) for x in all_outputs]
        return _finish(outputs)
