"""Tests for FM, InnerPNN, Pooling, FixLength, MultiDense, DCN layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.layers import (FMLayer, InnerPNNLayer, PoolingLayer,
                                FixLengthLayer, MultiDenseLayer, DCNLayer)

KEY = jax.random.PRNGKey(0)


class TestFMLayer:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        b, f, d = 4, 5, 3
        embs = [rng.randn(b, d).astype(np.float32) for _ in range(f)]
        out = FMLayer().apply({}, [jnp.array(e) for e in embs])
        # naive: 0.5 * sum over pairs (i<j) 2 * <ei, ej> per sample
        expected = np.zeros((b, 1))
        for i in range(f):
            for j in range(f):
                if i != j:
                    expected[:, 0] += 0.5 * np.sum(embs[i] * embs[j], axis=1)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5)

    def test_stacked_input(self):
        rng = np.random.RandomState(1)
        x = rng.randn(3, 4, 2).astype(np.float32)
        out_list = FMLayer().apply({}, [jnp.array(x[:, i]) for i in range(4)])
        out_stack = FMLayer().apply({}, jnp.array(x))
        np.testing.assert_allclose(np.asarray(out_list),
                                   np.asarray(out_stack), rtol=1e-5)


class TestInnerPNN:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        b, f, d = 3, 4, 5
        embs = [rng.randn(b, d).astype(np.float32) for _ in range(f)]
        out = InnerPNNLayer().apply({}, [jnp.array(e) for e in embs])
        expected = []
        for r in range(f - 1):
            for c in range(r + 1, f):
                expected.append(np.sum(embs[r] * embs[c], axis=1))
        expected = np.stack(expected, axis=1)  # (B, P)
        assert out.shape == (b, f * (f - 1) // 2)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5)


class TestPooling:
    def test_sum_axis0(self):
        x = jnp.array([[1.0, 2, 3], [10, 11, 12]])
        out = PoolingLayer(axis=0, keepdims=True, combiner="sum").apply({}, x)
        np.testing.assert_allclose(np.asarray(out), [[11, 13, 15]])

    def test_none_identity(self):
        x = jnp.array([1.0, 2.0])
        out = PoolingLayer(combiner=None).apply({}, x)
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0])

    def test_callable(self):
        x = jnp.array([[1.0, 2.0]])
        out = PoolingLayer(combiner=lambda t: t * 2).apply({}, x)
        np.testing.assert_allclose(np.asarray(out), [[2.0, 4.0]])

    def test_invalid(self):
        with pytest.raises(ValueError):
            PoolingLayer(combiner="bogus").apply({}, jnp.ones((2, 2)))


class TestFixLength:
    def test_truncate(self):
        x = jnp.arange(12.0).reshape(2, 6)
        out = FixLengthLayer(length=4, axis=1).apply({}, x)
        assert out.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(out), np.arange(12.0).reshape(2, 6)[:, :4])

    def test_pad(self):
        x = jnp.ones((2, 3, 2))
        out = FixLengthLayer(length=5, axis=1, constant_values=7).apply({}, x)
        assert out.shape == (2, 5, 2)
        np.testing.assert_allclose(np.asarray(out)[:, 3:], 7.0)

    def test_noop(self):
        x = jnp.ones((2, 3))
        out = FixLengthLayer(length=3, axis=1).apply({}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))


class TestMultiDense:
    def test_shared_input_matches_per_expert_dense(self):
        b, d, n, u = 4, 6, 3, 5
        x = jax.random.normal(KEY, (b, d))
        layer = MultiDenseLayer(units=u, num_dnn=n, activation="relu")
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        assert out.shape == (n, b, u)
        kernel = params["params"]["kernel"]
        bias = params["params"]["bias"]
        for i in range(n):
            expected = np.maximum(
                np.asarray(x) @ np.asarray(kernel[i]) + np.asarray(bias[i]),
                0.0)
            np.testing.assert_allclose(np.asarray(out[i]), expected,
                                       rtol=1e-4, atol=1e-5)

    def test_per_expert_input(self):
        b, d, n, u = 2, 3, 4, 2
        x = jax.random.normal(KEY, (n, b, d))
        layer = MultiDenseLayer(units=u, num_dnn=n)
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        kernel = params["params"]["kernel"]
        for i in range(n):
            expected = (np.asarray(x[i]) @ np.asarray(kernel[i])
                        + np.asarray(params["params"]["bias"][i]))
            np.testing.assert_allclose(np.asarray(out[i]), expected,
                                       rtol=1e-4, atol=1e-5)

    def test_wrong_rank_raises(self):
        layer = MultiDenseLayer(units=2, num_dnn=2)
        with pytest.raises(ValueError):
            layer.init(KEY, jnp.ones((2, 2, 2, 2)))


class TestDCN:
    def test_matches_naive(self):
        b, d, degree = 3, 4, 3
        x = jax.random.normal(KEY, (b, d))
        layer = DCNLayer(degree_of_cross=degree)
        params = layer.init(KEY, x)
        out = layer.apply(params, x)
        kernels = np.asarray(params["params"]["kernels"])
        biases = np.asarray(params["params"]["biases"])
        xi = np.asarray(x)
        cur = xi
        for li in range(degree):
            cross = cur @ kernels[li]          # (B, 1)
            cur = xi * cross + biases[li]
        np.testing.assert_allclose(np.asarray(out), cur, rtol=1e-4,
                                   atol=1e-5)

    def test_no_bias(self):
        x = jax.random.normal(KEY, (2, 3))
        layer = DCNLayer(degree_of_cross=2, use_bias=False)
        params = layer.init(KEY, x)
        assert "biases" not in params["params"]
        assert layer.apply(params, x).shape == (2, 3)
