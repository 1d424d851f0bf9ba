"""Pallas kernel correctness vs the XLA reference paths.

On CPU the kernels run in interpreter mode — slow but bit-accurate to
the TPU lowering's semantics; shapes are kept tiny.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rec_now_tpu.ops.cin_op import cin_contract_xla
from rec_now_tpu.ops.multi_dense_op import multi_dense_xla
from rec_now_tpu.ops.pallas.cin_kernel import cin_pallas, cin_flat
from rec_now_tpu.ops.pallas.multi_dense_kernel import multi_dense_pallas

KEY = jax.random.PRNGKey(0)


class TestCINKernel:
    def test_forward_matches_xla(self):
        b, d, f, h, k = 4, 8, 5, 6, 7
        x0 = jax.random.normal(KEY, (b, d, f))
        prev = jax.random.normal(jax.random.PRNGKey(1), (b, d, h))
        w = jax.random.normal(jax.random.PRNGKey(2), (k, f, h))
        got = cin_pallas(x0, prev, w)
        expected = cin_contract_xla(x0, prev, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_forward_padding_path(self):
        # M = b*d not a multiple of the tile -> exercises padding
        b, d, f, h, k = 3, 5, 4, 4, 4
        x0 = jax.random.normal(KEY, (b, d, f))
        prev = jax.random.normal(jax.random.PRNGKey(1), (b, d, h))
        w = jax.random.normal(jax.random.PRNGKey(2), (k, f, h))
        got = cin_pallas(x0, prev, w)
        expected = cin_contract_xla(x0, prev, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_backward_matches_xla_grads(self):
        m, f, h, k = 16, 3, 4, 5
        x0 = jax.random.normal(KEY, (m, f))
        prev = jax.random.normal(jax.random.PRNGKey(1), (m, h))
        w = jax.random.normal(jax.random.PRNGKey(2), (k, f, h))

        def loss_pallas(x0, prev, w):
            return jnp.sum(jnp.sin(cin_flat(x0, prev, w)))

        def loss_ref(x0, prev, w):
            out = jnp.einsum("mf,mh,kfh->mk", x0, prev, w)
            return jnp.sum(jnp.sin(out))

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x0, prev, w)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x0, prev, w)
        for a, b_ in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestCINStackKernel:
    """Fused whole-stack + channel-sum kernel vs per-layer XLA."""

    def _ref(self, x0_bdf, weights, output_input=True):
        layers = [x0_bdf]
        for w in weights:
            layers.append(cin_contract_xla(x0_bdf, layers[-1], w))
        if not output_input:
            layers = layers[1:]
        return jnp.sum(jnp.concatenate(layers, axis=-1), axis=-1)

    @pytest.mark.parametrize("output_input", [True, False])
    def test_forward_matches_per_layer(self, output_input):
        from rec_now_tpu.ops.pallas.cin_kernel import cin_stack_sum_pallas
        b, d, f = 3, 5, 4
        hidden = (6, 6)
        x0 = jax.random.normal(KEY, (b, d, f))
        ws = tuple(
            jax.random.normal(jax.random.PRNGKey(3 + i),
                              (k, f, h)) * 0.3
            for i, (k, h) in enumerate(zip(hidden, (f,) + hidden[:-1])))
        got = cin_stack_sum_pallas(x0, ws, output_input=output_input)
        expected = self._ref(x0, ws, output_input)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_backward_matches_per_layer(self):
        from rec_now_tpu.ops.pallas.cin_kernel import cin_stack_sum_pallas
        b, d, f = 2, 4, 3
        hidden = (5, 4)   # distinct Ks exercise the per-K constants
        x0 = jax.random.normal(KEY, (b, d, f))
        ws = tuple(
            jax.random.normal(jax.random.PRNGKey(7 + i),
                              (k, f, h)) * 0.3
            for i, (k, h) in enumerate(zip(hidden, (f,) + hidden[:-1])))

        def loss_pallas(x0, ws):
            return jnp.sum(jnp.sin(cin_stack_sum_pallas(x0, ws)))

        def loss_ref(x0, ws):
            return jnp.sum(jnp.sin(self._ref(x0, ws)))

        gp = jax.grad(loss_pallas, argnums=(0, 1))(x0, ws)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x0, ws)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                                   rtol=1e-4, atol=1e-5)
        for a, b_ in zip(gp[1], gr[1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("hidden", [(5,), (5, 4, 6)])
    def test_layer_counts_fwd_bwd(self, hidden):
        """1-layer (collapsed-only, no FK constants) and 3-layer stacks."""
        from rec_now_tpu.ops.pallas.cin_kernel import cin_stack_sum_pallas
        b, d, f = 2, 3, 4
        x0 = jax.random.normal(KEY, (b, d, f))
        ws = tuple(
            jax.random.normal(jax.random.PRNGKey(11 + i),
                              (k, f, h)) * 0.3
            for i, (k, h) in enumerate(zip(hidden, (f,) + hidden[:-1])))

        def loss_pallas(x0, ws):
            return jnp.sum(jnp.sin(cin_stack_sum_pallas(x0, ws)))

        def loss_ref(x0, ws):
            return jnp.sum(jnp.sin(self._ref(x0, ws)))

        np.testing.assert_allclose(
            np.asarray(loss_pallas(x0, ws)), np.asarray(loss_ref(x0, ws)),
            rtol=1e-4, atol=1e-5)
        gp = jax.grad(loss_pallas, argnums=(0, 1))(x0, ws)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x0, ws)
        # deep stacks accumulate f32 contraction-reorder noise (the
        # fused kernel sums in a different order); 5e-4 rel is pure
        # precision, not semantics
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                                   rtol=5e-4, atol=5e-4)
        for a, b_ in zip(gp[1], gr[1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-4, atol=5e-4)


class TestMultiDenseKernel:
    def test_matches_xla(self):
        n, b, d, u = 3, 16, 8, 5
        x = jax.random.normal(KEY, (n, b, d))
        w = jax.random.normal(jax.random.PRNGKey(1), (n, d, u))
        bias = jax.random.normal(jax.random.PRNGKey(2), (n, 1, u))
        got = multi_dense_pallas(x, w, bias, jax.nn.relu)
        expected = multi_dense_xla(x, w, bias, jax.nn.relu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_broadcast_input(self):
        n, b, d, u = 4, 8, 6, 3
        x = jax.random.normal(KEY, (1, b, d))
        w = jax.random.normal(jax.random.PRNGKey(1), (n, d, u))
        got = multi_dense_pallas(x, w, None, None)
        expected = multi_dense_xla(x, w, None, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)


class TestMultiDenseGrad:
    """The fused Pallas forward must be differentiable (custom VJP
    through the XLA formulation) — config #4 trains through it."""

    def test_grads_match_xla(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from rec_now_tpu.ops.multi_dense_op import (multi_dense_apply,
                                                    multi_dense_xla)

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 32, 16))
        w = jax.random.normal(key, (4, 16, 8)) * 0.3
        b = jax.random.normal(key, (4, 1, 8)) * 0.1

        def loss_pl(x, w, b):
            return jnp.mean(jnp.square(multi_dense_apply(
                x, w, b, activation=jnp.tanh, use_pallas=True)))

        def loss_x(x, w, b):
            return jnp.mean(jnp.square(multi_dense_xla(
                x, w, b, jnp.tanh)))

        gp = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-6)

    def test_grads_no_bias_shared_input(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from rec_now_tpu.ops.multi_dense_op import multi_dense_apply

        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (16, 8))      # shared 2-D input
        w = jax.random.normal(key, (3, 8, 4))

        def loss(x, w):
            return jnp.sum(multi_dense_apply(x, w, use_pallas=True))

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        assert np.all(np.isfinite(np.asarray(gx)))
        assert gx.shape == x.shape and gw.shape == w.shape
