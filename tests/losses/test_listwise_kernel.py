"""Pallas listwise kernel vs the XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses.listwise import listwise_loss
from rec_now_tpu.ops.pallas.listwise_kernel import listwise_loss_pallas


def _mk(b, seed=0, n_groups=6):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randint(0, n_groups, b), jnp.int32),
            jnp.array((rng.rand(b) > 0.5), jnp.float32),
            jnp.array(rng.randn(b), jnp.float32))


class TestListwiseKernel:
    @pytest.mark.parametrize("b", [32, 48, 40])
    def test_matches_xla(self, b):
        g, l, s = _mk(b)
        xla = listwise_loss(g, l, s)
        ker = listwise_loss_pallas(g, l, s)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5), b

    def test_no_valid_groups(self):
        g = jnp.array([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32)
        l = jnp.ones(8)
        s = jnp.array(np.random.RandomState(0).randn(8), jnp.float32)
        assert float(listwise_loss_pallas(g, l, s)) == 0.0

    @pytest.mark.slow
    def test_gradients_match(self):
        g, l, s = _mk(40, seed=2)
        gx = jax.grad(lambda x: listwise_loss(g, l, x))(s)
        gk = jax.grad(lambda x: listwise_loss_pallas(g, l, x))(s)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-4, atol=1e-6)

    def test_gradient_zero_when_invalid(self):
        g = jnp.array([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32)
        l = jnp.ones(8)
        s = jnp.array(np.random.RandomState(0).randn(8), jnp.float32)
        gk = jax.grad(lambda x: listwise_loss_pallas(g, l, x))(s)
        np.testing.assert_allclose(np.asarray(gk), 0.0, atol=1e-7)

    def test_sum_mode(self):
        g, l, s = _mk(32, seed=3)
        total, cnt = listwise_loss_pallas(g, l, s, reduce_mean=False)
        mean = listwise_loss_pallas(g, l, s)
        assert float(mean) == pytest.approx(float(total) / float(cnt),
                                            rel=1e-5)

    def test_jit(self):
        g, l, s = _mk(32, seed=4)
        f = jax.jit(lambda x: listwise_loss_pallas(g, l, x))
        assert np.isfinite(float(f(s)))
