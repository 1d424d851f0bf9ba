"""Focal loss (reference: rec_now/rec_block/focal_loss.py:12-66)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _sigmoid_ce(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sigmoid cross-entropy, the stable TF formulation:
    max(x, 0) - x*z + log1p(exp(-|x|)).
    """
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_crossentropy_loss(labels: jnp.ndarray,
                            logits: jnp.ndarray,
                            alpha: Optional[float] = 0.25,
                            gamma: Optional[float] = 2.0,
                            stop_weight_gradient: bool = False,
                            return_mean: bool = True) -> jnp.ndarray:
    """Focal loss for class-imbalanced binary classification.

    loss = alpha_factor * (1 - p_t) ** gamma * sigmoid_CE(labels, logits)

    Args:
        labels: (B,) 0/1 labels.
        logits: (B,) model logits.
        alpha: positive-class weight in (0, 1); negatives get 1 - alpha.
            None disables the alpha factor.
        gamma: focusing exponent >= 0.  None disables modulation.
        stop_weight_gradient: stop gradients through the modulating factor.
        return_mean: reduce to the scalar mean.

    Returns:
        Scalar (mean) or per-sample (B,) focal loss.
    """
    if alpha and (alpha <= 0.0 or alpha >= 1.0):
        raise ValueError(
            "Value of alpha should be greater than zero and less than one.")
    if gamma and gamma < 0:
        raise ValueError(
            "Value of gamma should be greater than or equal to zero.")

    labels = labels.astype(logits.dtype)
    loss = _sigmoid_ce(labels, logits)

    if alpha:
        alpha = jnp.asarray(alpha, dtype=labels.dtype)
        alpha_factor = labels * alpha + (1 - labels) * (1 - alpha)
        loss = alpha_factor * loss

    if gamma:
        pred_prob = jax.nn.sigmoid(logits)
        pred_sim = labels * pred_prob + (1 - labels) * (1 - pred_prob)
        modulating = jnp.power(1.0 - pred_sim, gamma)
        if stop_weight_gradient:
            modulating = jax.lax.stop_gradient(modulating)
        loss = modulating * loss

    if return_mean:
        loss = jnp.mean(loss)
    return loss
