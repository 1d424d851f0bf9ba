"""Pallas pairwise kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses.pairwise import pairwise_loss
from rec_now_tpu.ops.pallas.pairwise_kernel import (
    pairwise_loss_pallas, pair_row_counts, same_group_matvec)


def _mk(b, seed=0, n_groups=5):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randn(b), jnp.float32),
            jnp.array((rng.rand(b) > 0.5), jnp.float32),
            jnp.array(rng.randint(0, n_groups, b), jnp.int32))


class TestRowCounts:
    def test_matches_dense(self):
        o, l, g = _mk(32)
        counts = pair_row_counts(o, l, g)
        same = np.asarray(g)[:, None] == np.asarray(g)[None, :]
        off = ~np.eye(32, dtype=bool)
        order = np.asarray(l)[:, None] > np.asarray(l)[None, :]
        expected = (same & off & order).sum(1)
        np.testing.assert_allclose(np.asarray(counts), expected)


class TestSameGroupMatvec:
    def test_matches_dense(self):
        _, _, g = _mk(32, seed=1)
        v = jnp.arange(32, dtype=jnp.float32)
        got = same_group_matvec(g, v)
        same = (np.asarray(g)[:, None] == np.asarray(g)[None, :])
        np.testing.assert_allclose(np.asarray(got),
                                   same @ np.asarray(v), rtol=1e-6)


class TestPairwiseKernel:
    @pytest.mark.parametrize("power", [0.0, -1.0, 0.5])
    def test_matches_xla(self, power):
        o, l, g = _mk(48, seed=2)
        xla = pairwise_loss(o, l, g, click_occurance_power=power,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g, click_occurance_power=power)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5), power

    def test_mask_and_wrong_order(self):
        o, l, g = _mk(32, seed=3)
        mask = jnp.array(np.random.RandomState(4).rand(32) > 0.3)
        xla = pairwise_loss(o, l, g, mask=mask,
                            only_use_wrong_order_pair=True,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g, mask=mask,
                                   only_use_wrong_order_pair=True)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5)

    def test_num_pair(self):
        o, l, g = _mk(40, seed=5)
        _, n_x = pairwise_loss(o, l, g, return_num_pair=True,
                               use_pallas=False)
        _, n_k = pairwise_loss_pallas(o, l, g, return_num_pair=True)
        assert float(n_x) == float(n_k)

    @pytest.mark.parametrize("power", [0.0, -0.5])
    def test_gradients_match(self, power):
        o, l, g = _mk(32, seed=6)
        gx = jax.grad(lambda x: pairwise_loss(
            x, l, g, click_occurance_power=power, use_pallas=False))(o)
        gk = jax.grad(lambda x: pairwise_loss_pallas(
            x, l, g, click_occurance_power=power))(o)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-4, atol=1e-6), power

    def test_degenerate_batch(self):
        o = jnp.array(np.random.RandomState(0).randn(16), jnp.float32)
        l = jnp.ones(16)
        g = jnp.zeros(16, jnp.int32)
        assert float(pairwise_loss_pallas(o, l, g)) == pytest.approx(0.0)
        gk = jax.grad(lambda x: pairwise_loss_pallas(x, l, g))(o)
        np.testing.assert_allclose(np.asarray(gk), 0.0, atol=1e-7)

    def test_non_power_of_two_batch(self):
        o, l, g = _mk(40, seed=7)  # 40 -> tile 8
        xla = pairwise_loss(o, l, g, use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5)

    def test_jit(self):
        o, l, g = _mk(32, seed=8)
        f = jax.jit(lambda x: pairwise_loss_pallas(x, l, g))
        assert np.isfinite(float(f(o)))

    def test_auto_dispatch_off_cpu(self):
        # on CPU the auto path must stay on XLA (no interpret overhead
        # in production code paths); explicit use_pallas=True still runs
        # the kernel via the interpreter.
        o, l, g = _mk(16, seed=9)
        a = pairwise_loss(o, l, g)                 # auto -> XLA on CPU
        b = pairwise_loss(o, l, g, use_pallas=True)
        assert float(a) == pytest.approx(float(b), abs=2e-5)
