"""Blocked pairwise loss must match the dense form exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses.pairwise import pairwise_loss
from rec_now_tpu.losses.pairwise_blocked import pairwise_loss_blocked


def _mk(b, seed=0, n_groups=5):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randn(b), jnp.float32),
            jnp.array((rng.rand(b) > 0.5), jnp.float32),
            jnp.array(rng.randint(0, n_groups, b)))


class TestBlockedEquivalence:
    @pytest.mark.parametrize("block", [8, 16, 64])
    def test_default(self, block):
        o, l, g = _mk(48)
        dense = pairwise_loss(o, l, g)
        blocked = pairwise_loss_blocked(o, l, g, block_rows=block)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    def test_padding_path(self):
        o, l, g = _mk(50)  # not a multiple of 16
        dense = pairwise_loss(o, l, g)
        blocked = pairwise_loss_blocked(o, l, g, block_rows=16)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    @pytest.mark.slow
    def test_occurance_power(self):
        o, l, g = _mk(40, seed=1)
        for p in (-1.0, 0.5):
            dense = pairwise_loss(o, l, g, click_occurance_power=p)
            blocked = pairwise_loss_blocked(o, l, g, block_rows=8,
                                            click_occurance_power=p)
            assert float(blocked) == pytest.approx(float(dense),
                                                   abs=1e-5), p

    def test_mask_and_wrong_order(self):
        o, l, g = _mk(32, seed=2)
        mask = jnp.array(np.random.RandomState(3).rand(32) > 0.3)
        dense = pairwise_loss(o, l, g, mask=mask,
                              only_use_wrong_order_pair=True)
        blocked = pairwise_loss_blocked(o, l, g, block_rows=8, mask=mask,
                                        only_use_wrong_order_pair=True)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    def test_custom_weight_and_multigroup(self):
        o, l, _ = _mk(24, seed=4)
        rng = np.random.RandomState(5)
        g1 = jnp.array(rng.randint(0, 3, 24))
        g2 = jnp.array(rng.randint(0, 2, 24))

        def wfn(lp, ln):
            return (lp > ln).astype(jnp.float32) * (lp - ln + 0.5)

        dense = pairwise_loss(o, l, [g1, g2],
                              label_pair_to_weight_func=wfn)
        blocked = pairwise_loss_blocked(o, l, [g1, g2], block_rows=8,
                                        label_pair_to_weight_func=wfn)
        assert float(blocked) == pytest.approx(float(dense), abs=1e-5)

    @pytest.mark.slow
    def test_num_pair(self):
        o, l, g = _mk(30, seed=6)
        _, n_d = pairwise_loss(o, l, g, return_num_pair=True)
        _, n_b = pairwise_loss_blocked(o, l, g, block_rows=8,
                                       return_num_pair=True)
        assert float(n_d) == float(n_b)

    @pytest.mark.slow
    def test_gradients_match(self):
        o, l, g = _mk(32, seed=7)
        gd = jax.grad(lambda x: pairwise_loss(
            x, l, g, click_occurance_power=-0.5))(o)
        gb = jax.grad(lambda x: pairwise_loss_blocked(
            x, l, g, block_rows=8, click_occurance_power=-0.5))(o)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                                   rtol=1e-4, atol=1e-6)

    def test_jit(self):
        o, l, g = _mk(32, seed=8)
        f = jax.jit(lambda o: pairwise_loss_blocked(o, l, g, block_rows=16))
        assert np.isfinite(float(f(o)))
