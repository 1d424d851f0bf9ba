"""Pointwise losses (new scope — the reference delegates pointwise losses
to raw TF ops in user code; the training loop here needs them first-class).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def sigmoid_cross_entropy_with_logits(labels: jnp.ndarray,
                                      logits: jnp.ndarray) -> jnp.ndarray:
    """Elementwise numerically-stable sigmoid cross-entropy."""
    labels = labels.astype(logits.dtype)
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_loss(labels: jnp.ndarray, logits: jnp.ndarray,
             weights: Optional[jnp.ndarray] = None,
             reduce_mean: bool = True) -> jnp.ndarray:
    """Binary cross-entropy-with-logits, optionally weighted and reduced."""
    losses = sigmoid_cross_entropy_with_logits(labels, logits)
    if weights is not None:
        losses = losses * weights
        if reduce_mean:
            denom = jnp.sum(weights) + 1e-10
            return jnp.sum(losses) / denom
    if reduce_mean:
        return jnp.mean(losses)
    return losses
