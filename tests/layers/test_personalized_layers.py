"""Tests for StarDense, ParasiticStarDense, StackedDense, CAN layers."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rec_now_tpu.layers import (StarDenseLayer, ParasiticStarDenseLayer,
                                StackedDenseLayer, ParasiticStackedDenseLayer,
                                CANLayer)

KEY = jax.random.PRNGKey(0)


class TestStarDense:
    def test_ones_params_match_plain_dense(self):
        """star params initialized to ones must reproduce the trunk dense."""
        b, d, u = 3, 4, 5
        x = jax.random.normal(KEY, (b, d))
        size = StarDenseLayer.get_starnet_param_size(d, u)
        assert size == d * u + u
        star = jnp.ones((b, size))
        layer = StarDenseLayer(units=u)
        params = layer.init(KEY, x, star)
        out = layer.apply(params, x, star)
        kernel = np.asarray(params["params"]["kernel"])
        bias = np.asarray(params["params"]["bias"])
        # star kernel of ones multiplies to identity; star bias of ones
        # gets the -num_starnet correction -> matches plain dense.
        expected = np.asarray(x) @ kernel + bias
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_naive_per_sample(self):
        b, d, u = 2, 3, 2
        x = jax.random.normal(KEY, (b, d))
        star = jax.random.normal(jax.random.PRNGKey(1),
                                 (b, d * u + u)) + 1.0
        layer = StarDenseLayer(units=u, activation="tanh")
        params = layer.init(KEY, x, star)
        out = layer.apply(params, x, star)
        kernel = np.asarray(params["params"]["kernel"])
        bias = np.asarray(params["params"]["bias"])
        sk = np.asarray(star[:, :d * u]).reshape(b, d, u)
        sb = np.asarray(star[:, d * u:]).reshape(b, u)
        expected = np.zeros((b, u))
        for i in range(b):
            expected[i] = (np.asarray(x)[i] @ (kernel * sk[i])
                           + bias + sb[i] - 1.0)
        np.testing.assert_allclose(np.asarray(out), np.tanh(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_multiple_starnets(self):
        b, d, u = 2, 3, 2
        x = jax.random.normal(KEY, (b, d))
        s1 = jnp.ones((b, d * u + u))
        s2 = jnp.ones((b, d * u + u))
        layer = StarDenseLayer(units=u)
        params = layer.init(KEY, x, [s1, s2])
        out = layer.apply(params, x, [s1, s2])
        kernel = np.asarray(params["params"]["kernel"])
        bias = np.asarray(params["params"]["bias"])
        # ones*ones multiply -> trunk; 1+1 biases - 2 -> trunk
        expected = np.asarray(x) @ kernel + bias
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5)


class TestParasiticStarDense:
    def test_group_selection_and_trunk_only(self):
        b, d, u = 3, 4, 2
        x = jax.random.normal(KEY, (b, d))
        layer = ParasiticStarDenseLayer(units=u, num_groups=3)
        params = layer.init(KEY, x)
        # ones-init parasitic kernel -> same as trunk at start
        out0 = layer.apply(params, x, 0)
        out_trunk = layer.apply(params, x, None)
        out_neg = layer.apply(params, x, -1)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out_trunk),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out_neg),
                                   np.asarray(out_trunk), rtol=1e-5)

    def test_stop_trunk_grad_training(self):
        """3-step training with stop_trunk_grad: trunk stays frozen.

        Mirrors reference tests/layers/test_star_dense_layer.py:79-110.
        """
        b, d, u = 4, 3, 2
        x = jax.random.normal(KEY, (b, d))
        y = jax.random.normal(jax.random.PRNGKey(7), (b, u))
        layer = ParasiticStarDenseLayer(units=u, num_groups=2)
        params = layer.init(KEY, x)
        trunk_before = np.asarray(params["params"]["trunk_kernel"]).copy()

        tx = optax.adam(0.1)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = layer.apply(p, x, 1, True)  # group 1, stop grad
                return jnp.mean((out - y) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(3):
            params, opt_state, loss = step(params, opt_state)

        trunk_after = np.asarray(params["params"]["trunk_kernel"])
        np.testing.assert_allclose(trunk_after, trunk_before, atol=1e-7)
        # parasitic group 1 must have moved, group 0 untouched
        pk = np.asarray(params["params"]["parasitic_kernel"])
        assert np.any(np.abs(pk[1] - 1.0) > 1e-4)
        np.testing.assert_allclose(pk[0], 1.0, atol=1e-7)


class TestStackedDense:
    def test_zero_params_match_plain_dense(self):
        b, d, u = 3, 4, 5
        x = jax.random.normal(KEY, (b, d))
        size = StackedDenseLayer.get_resnet_param_size(d, u)
        res = jnp.zeros((b, size))
        layer = StackedDenseLayer(units=u)
        params = layer.init(KEY, x, res)
        out = layer.apply(params, x, res)
        kernel = np.asarray(params["params"]["kernel"])
        bias = np.asarray(params["params"]["bias"])
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(x) @ kernel + bias,
                                   rtol=1e-4, atol=1e-5)

    def test_resnet_weight_scaling(self):
        b, d, u = 2, 3, 2
        x = jax.random.normal(KEY, (b, d))
        res = jax.random.normal(jax.random.PRNGKey(2), (b, d * u + u))
        layer = StackedDenseLayer(units=u)
        params = layer.init(KEY, x, res)
        out_w0 = layer.apply(params, x, res, 0.0)
        out_plain = layer.apply(params, x, jnp.zeros_like(res))
        np.testing.assert_allclose(np.asarray(out_w0), np.asarray(out_plain),
                                   rtol=1e-5, atol=1e-6)


class TestParasiticStackedDense:
    def test_zero_init_matches_trunk(self):
        b, d, u = 3, 4, 2
        x = jax.random.normal(KEY, (b, d))
        layer = ParasiticStackedDenseLayer(units=u, num_groups=2)
        params = layer.init(KEY, x)
        out0 = layer.apply(params, x, 0)
        out_trunk = layer.apply(params, x, None)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out_trunk),
                                   rtol=1e-5)
        # additive parasitic params are zero-initialized
        np.testing.assert_allclose(
            np.asarray(params["params"]["parasitic_kernel"]), 0.0)


class TestCAN:
    def test_param_size(self):
        assert CANLayer.get_dnn_param_size(4, [4, 4], use_bias=True) \
            == (4 * 4 + 4) * 2
        assert CANLayer.get_dnn_param_size(3, [5], use_bias=False) == 15

    def test_naive_2d(self):
        b, d = 3, 4
        dnn_dims = [4, 4]
        size = CANLayer.get_dnn_param_size(d, dnn_dims, True)
        x = jax.random.normal(KEY, (b, d))
        p = jax.random.normal(jax.random.PRNGKey(1), (b, size))
        layer = CANLayer(dnn_dims=dnn_dims)
        out = layer.apply({}, x, p)
        assert out.shape == (b, 4)
        # naive per-sample MLP
        pn = np.asarray(p)
        xn = np.asarray(x)
        expected = np.zeros((b, 4))
        for i in range(b):
            h = xn[i]
            off = 0
            for li, dout in enumerate(dnn_dims):
                din = len(h)
                k = pn[i, off:off + din * dout].reshape(din, dout)
                off += din * dout
                bias = pn[i, off:off + dout]
                off += dout
                h = h @ k + bias
                if li < len(dnn_dims) - 1:
                    h = np.tanh(h)
            expected[i] = h
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                                   atol=1e-4)

    def test_3d_with_padding_mask_and_sum(self):
        b, L, d = 2, 3, 4
        dnn_dims = [4]
        size = CANLayer.get_dnn_param_size(d, dnn_dims, True)
        x = jax.random.normal(KEY, (b, L, d))
        x = x.at[0, 2].set(0.0)  # padding row
        p = jax.random.normal(jax.random.PRNGKey(1), (b, size))
        layer = CANLayer(dnn_dims=dnn_dims, output_combiner="sum")
        out = layer.apply({}, x, p)
        assert out.shape == (b, 4)
        # padded position contributes zero: recompute without it
        layer_none = CANLayer(dnn_dims=dnn_dims, output_combiner=None)
        per_pos = layer_none.apply({}, x, p)  # (B, L, 4)
        np.testing.assert_allclose(np.asarray(per_pos[0, 2]), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(per_pos.sum(axis=1)),
                                   rtol=1e-4, atol=1e-5)

    def test_auto_decide_dims(self):
        b, d = 2, 4
        # params sized for exactly 2 layers of d->d
        size = 2 * (d * d + d)
        x = jax.random.normal(KEY, (b, d))
        p = jax.random.normal(jax.random.PRNGKey(1), (b, size))
        out = CANLayer().apply({}, x, p)
        assert out.shape == (b, d)

    def test_size_mismatch_raises(self):
        x = jnp.ones((2, 4))
        p = jnp.ones((2, 7))
        with pytest.raises(ValueError):
            CANLayer(dnn_dims=[4]).apply({}, x, p)

    def test_res_net(self):
        b, d = 2, 3
        size = CANLayer.get_dnn_param_size(d, [d], True)
        x = jax.random.normal(KEY, (b, d))
        p = jnp.zeros((b, size))
        out = CANLayer(dnn_dims=[d], use_res_net=True,
                       mask_all_zero_embedding=False).apply({}, x, p)
        # zero params + resnet -> output == input
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-5)
