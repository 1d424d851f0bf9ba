"""Tests for MultiHash, FastMultiHash, CartesianProduct layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.layers import (MultiHashLayer, FastMultiHashLayer,
                                CartesianProductLayer)
from rec_now_tpu.ops.hashing import salted_hash, combine_hash

KEY = jax.random.PRNGKey(0)


class TestHashing:
    def test_deterministic(self):
        ids = jnp.arange(100)
        h1 = salted_hash(ids, 1, 1000)
        h2 = salted_hash(ids, 1, 1000)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_different_salts_decorrelate(self):
        ids = jnp.arange(1000)
        h1 = np.asarray(salted_hash(ids, 1, 100))
        h2 = np.asarray(salted_hash(ids, 2, 100))
        assert np.mean(h1 == h2) < 0.05

    def test_distribution_roughly_uniform(self):
        ids = jnp.arange(100000)
        h = np.asarray(salted_hash(ids, 7, 64))
        counts = np.bincount(h, minlength=64)
        assert counts.min() > 100000 / 64 * 0.8
        assert counts.max() < 100000 / 64 * 1.2

    def test_range(self):
        ids = jnp.arange(10000)
        h = np.asarray(salted_hash(ids, 3, 17))
        assert h.min() >= 0 and h.max() < 17

    def test_combine_order_sensitive(self):
        a = jnp.arange(100)
        b = jnp.arange(100, 200)
        assert not np.array_equal(np.asarray(combine_hash(a, b)),
                                  np.asarray(combine_hash(b, a)))


class TestMultiHash:
    def test_embedding_shapes(self):
        ids = jnp.array([[1, 2], [3, 4]])
        layer = MultiHashLayer(num_bins=100, embedding_dim=8, num_hash=2)
        params = layer.init(KEY, ids)
        assert params["params"]["embedding_0"].shape == (100, 8)
        assert params["params"]["embedding_1"].shape == (100, 8)
        out = layer.apply(params, ids)
        assert out.shape == (2, 2, 8)
        out_c = layer.apply(params, ids, combiner="concat")
        assert out_c.shape == (2, 2, 16)
        out_m = layer.apply(params, ids, combiner="mean")
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out) / 2,
                                   rtol=1e-5)

    def test_no_embedding_returns_bins(self):
        ids = jnp.array([5, 6, 7])
        layer = MultiHashLayer(num_bins=10, num_hash=2)
        out = layer.apply({}, ids, combiner="concat")
        assert out.shape == (3, 2)
        assert np.asarray(out).max() < 10

    def test_get_pooling(self):
        ids = jnp.array([[1, 2, 3]])
        w = jnp.array([[1.0, 0.0, 2.0]])
        layer = MultiHashLayer(num_bins=50, embedding_dim=4, num_hash=2)
        params = layer.init(KEY, ids)
        emb = layer.apply(params, ids)           # (1, 3, 4)
        bound = layer.bind(params)
        pooled = bound.get_pooling(ids, w)
        expected = (np.asarray(emb) * np.asarray(w)[..., None]).sum(1)
        np.testing.assert_allclose(np.asarray(pooled), expected, rtol=1e-4)


class TestFastMultiHash:
    def test_single_table_with_offsets(self):
        ids = jnp.array([[1, 2], [3, 4]])
        layer = FastMultiHashLayer(num_bins=100, embedding_dim=8, num_hash=3)
        params = layer.init(KEY, ids)
        assert params["params"]["embedding"].shape == (300, 8)
        out = layer.apply(params, ids)
        assert out.shape == (2, 2, 8)

    def test_combiners(self):
        ids = jnp.array([7, 8])
        layer = FastMultiHashLayer(num_bins=10, embedding_dim=4, num_hash=2)
        params = layer.init(KEY, ids)
        s = layer.apply(params, ids, combiner="sum")
        m = layer.apply(params, ids, combiner="mean")
        c = layer.apply(params, ids, combiner="concat")
        raw = layer.apply(params, ids, combiner=None)
        assert s.shape == (2, 4) and m.shape == (2, 4)
        assert c.shape == (2, 8) and raw.shape == (2, 2, 4)
        np.testing.assert_allclose(np.asarray(s), np.asarray(m) * 2,
                                   rtol=1e-5)

    def test_get_pooling(self):
        ids = jnp.array([[1, 2, 3], [4, 5, 6]])
        layer = FastMultiHashLayer(num_bins=64, embedding_dim=4)
        params = layer.init(KEY, ids)
        bound = layer.bind(params)
        pooled = bound.get_pooling(ids)
        emb = layer.apply(params, ids)
        np.testing.assert_allclose(np.asarray(pooled),
                                   np.asarray(emb).sum(1), rtol=1e-4)


class TestCartesianProduct:
    def test_shapes(self):
        a = jnp.array([[1, 2], [3, 4]])       # (2, 2)
        b = jnp.array([[10, 20, 30], [40, 50, 60]])  # (2, 3)
        out = CartesianProductLayer().apply({}, [a, b])
        assert out.shape == (2, 6)

    def test_batch1_broadcast(self):
        a = jnp.array([[1, 2]])               # (1, 2) broadcast
        b = jnp.array([[10], [20], [30]])     # (3, 1)
        out = CartesianProductLayer().apply({}, [a, b])
        assert out.shape == (3, 2)

    def test_distinct_tuples_distinct_ids(self):
        a = jnp.arange(50)
        b = jnp.arange(50, 100)
        out = np.asarray(CartesianProductLayer().apply({}, [a, b]))
        assert len(np.unique(out)) == 50  # all (a_i, b_i) distinct

    def test_invalid_values(self):
        a = jnp.array([[0, 1]])
        b = jnp.array([[5]])
        out = CartesianProductLayer().apply(
            {}, [a, b], invalid_value_list=[0, None], default_result_id=0)
        arr = np.asarray(out)
        assert arr[0, 0] == 0          # tuple containing invalid 0
        assert arr[0, 1] != 0

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            CartesianProductLayer().apply(
                {}, [jnp.ones((1, 1), jnp.int32)],
                invalid_value_list=[1, 2])

    def test_order_matters(self):
        a = jnp.array([3])
        b = jnp.array([7])
        o1 = np.asarray(CartesianProductLayer().apply({}, [a, b]))
        o2 = np.asarray(CartesianProductLayer().apply({}, [b, a]))
        assert o1[0, 0] != o2[0, 0]
