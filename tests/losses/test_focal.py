"""Tests for focal loss."""
import numpy as np
import jax.numpy as jnp
import pytest

from rec_now_tpu.losses.focal import focal_crossentropy_loss


def naive_focal(labels, logits, alpha=0.25, gamma=2.0):
    p = 1.0 / (1.0 + np.exp(-logits))
    ce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    if alpha:
        ce = ce * (labels * alpha + (1 - labels) * (1 - alpha))
    if gamma:
        pt = labels * p + (1 - labels) * (1 - p)
        ce = ce * (1 - pt) ** gamma
    return ce


class TestFocalLoss:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        labels = (rng.rand(32) > 0.5).astype(np.float64)
        logits = rng.randn(32)
        got = focal_crossentropy_loss(jnp.array(labels), jnp.array(logits),
                                      return_mean=False)
        np.testing.assert_allclose(np.asarray(got),
                                   naive_focal(labels, logits),
                                   rtol=1e-4, atol=1e-6)

    def test_mean(self):
        labels = jnp.array([1.0, 0.0])
        logits = jnp.array([2.0, -1.0])
        full = focal_crossentropy_loss(labels, logits, return_mean=False)
        mean = focal_crossentropy_loss(labels, logits, return_mean=True)
        assert float(mean) == pytest.approx(float(jnp.mean(full)), rel=1e-6)

    def test_no_alpha_no_gamma_is_bce(self):
        labels = np.array([1.0, 0.0, 1.0])
        logits = np.array([0.3, -0.2, 2.0])
        got = focal_crossentropy_loss(jnp.array(labels), jnp.array(logits),
                                      alpha=None, gamma=None,
                                      return_mean=False)
        np.testing.assert_allclose(
            np.asarray(got), naive_focal(labels, logits, None, None),
            rtol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            focal_crossentropy_loss(jnp.zeros(2), jnp.zeros(2), alpha=1.5)
        with pytest.raises(ValueError):
            focal_crossentropy_loss(jnp.zeros(2), jnp.zeros(2), gamma=-1.0)
