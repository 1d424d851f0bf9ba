"""Config plumbing shared by all modules.

The reference reuses ``keras.layers.Dense`` subclassing purely to inherit
initializer/regularizer/activation constructor handling (e.g.
rec_now/layers/dcn_layer.py:12,30, senet_layer.py:14,38).  In JAX/Flax we
replace that inheritance idiom with small resolver functions: modules
accept strings or callables and resolve them here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Activation = Optional[Union[str, Callable]]
Initializer = Union[str, Callable]

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": jax.nn.softmax,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def get_activation(act: Activation) -> Callable:
    """Resolve an activation name/callable/None to a callable."""
    if act is None:
        return lambda x: x
    if callable(act):
        return act
    key = str(act).lower()
    if key not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {act!r}")
    return _ACTIVATIONS[key]


def get_initializer(init: Initializer) -> Callable:
    """Resolve an initializer name/callable to a Flax initializer."""
    if callable(init):
        return init
    key = str(init).lower()
    if key in ("glorot_uniform", "xavier_uniform"):
        return nn.initializers.glorot_uniform()
    if key in ("glorot_normal", "xavier_normal"):
        return nn.initializers.glorot_normal()
    if key == "he_uniform":
        return nn.initializers.he_uniform()
    if key == "he_normal":
        return nn.initializers.he_normal()
    if key == "lecun_normal":
        return nn.initializers.lecun_normal()
    if key == "zeros":
        return nn.initializers.zeros_init()
    if key == "ones":
        return nn.initializers.ones_init()
    if key == "uniform":
        return nn.initializers.uniform()
    if key == "normal":
        return nn.initializers.normal()
    raise ValueError(f"unknown initializer {init!r}")


def constant_initializer(value: float) -> Callable:
    """Initializer filling with a constant (e.g. sparse-GNN edge weights)."""
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype=dtype)
    return init


def glorot_uniform_nd(in_axis: Any, out_axis: Any) -> Callable:
    """Glorot-uniform for >2-D kernels with explicit fan axes.

    Flax's default glorot treats the leading axes as receptive field;
    batched-expert kernels of shape (N, D, U) need fan computed per
    expert (in=D, out=U), matching how the reference initializes each
    expert's (D, U) kernel independently
    (rec_now/layers/multi_dense_layer.py:39-46).
    """
    return nn.initializers.variance_scaling(
        1.0, "fan_avg", "uniform", in_axis=in_axis, out_axis=out_axis)
