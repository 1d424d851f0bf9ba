"""Blocked listwise loss must match the dense form exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses.listwise import listwise_loss
from rec_now_tpu.losses.listwise_blocked import listwise_loss_blocked


def _mk(b, seed=0, n_groups=6):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randint(0, n_groups, b)),
            jnp.array((rng.rand(b) > 0.5), jnp.float32),
            jnp.array(rng.randn(b), jnp.float32))


class TestBlockedListwise:
    @pytest.mark.parametrize("block", [8, 16, 64])
    def test_matches_dense(self, block):
        g, l, s = _mk(48)
        dense = listwise_loss(g, l, s)
        blocked = listwise_loss_blocked(g, l, s, block_rows=block)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    @pytest.mark.slow
    def test_padding(self):
        g, l, s = _mk(45, seed=1)
        dense = listwise_loss(g, l, s)
        blocked = listwise_loss_blocked(g, l, s, block_rows=16)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    def test_no_valid_groups(self):
        g = jnp.array([1, 2, 3])
        l = jnp.ones(3)
        s = jnp.array([0.5, -0.1, 0.2])
        assert float(listwise_loss_blocked(g, l, s, block_rows=2)) == 0.0

    @pytest.mark.slow
    def test_gradients_match(self):
        g, l, s = _mk(40, seed=2)
        gd = jax.grad(lambda x: listwise_loss(g, l, x))(s)
        gb = jax.grad(lambda x: listwise_loss_blocked(
            g, l, x, block_rows=8))(s)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                                   rtol=1e-4, atol=1e-6)
