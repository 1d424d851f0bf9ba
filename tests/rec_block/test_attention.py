"""Tests for attention blocks."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.rec_block.attention import (attention_by_dot_product,
                                             DNNAttention, attention_by_dnn)

KEY = jax.random.PRNGKey(0)


class TestDotProductAttention:
    def test_matches_naive(self):
        b, L, d = 3, 4, 5
        user = np.random.RandomState(0).randn(b, L, d).astype(np.float32)
        doc = np.random.RandomState(1).randn(b, d).astype(np.float32)
        attn, score_sum = attention_by_dot_product(jnp.array(user),
                                                   jnp.array(doc))
        scores = np.einsum("bld,bd->bl", user, doc)
        expected = np.einsum("bld,bl->bd", user, scores)
        np.testing.assert_allclose(np.asarray(attn), expected, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(score_sum),
                                   scores.sum(1, keepdims=True), rtol=1e-4,
                                   atol=1e-4)

    def test_filter_neg(self):
        b, L, d = 2, 3, 4
        user = np.random.RandomState(2).randn(b, L, d).astype(np.float32)
        doc = np.random.RandomState(3).randn(b, d).astype(np.float32)
        attn, score_sum = attention_by_dot_product(
            jnp.array(user), jnp.array(doc), filter_neg=True)
        scores = np.maximum(np.einsum("bld,bd->bl", user, doc), 0.0)
        expected = np.einsum("bld,bl->bd", user, scores)
        np.testing.assert_allclose(np.asarray(attn), expected, rtol=1e-4,
                                   atol=1e-4)


class TestDNNAttention:
    @pytest.mark.slow
    def test_shapes(self):
        b, L, d = 2, 5, 4
        user = jax.random.normal(KEY, (b, L, d))
        doc = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        module = DNNAttention(dnn_dims=[8, 1])
        params = module.init(KEY, user, doc)
        attn, score_sum = module.apply(params, user, doc)
        assert attn.shape == (b, d)
        assert score_sum.shape == (b, 1)

    def test_appends_final_unit_dim(self):
        b, L, d = 2, 3, 4
        user = jax.random.normal(KEY, (b, L, d))
        doc = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        module = DNNAttention(dnn_dims=[8])  # missing final 1 -> appended
        params = module.init(KEY, user, doc)
        attn, _ = module.apply(params, user, doc)
        assert attn.shape == (b, d)

    def test_mask_zeroes_positions(self):
        b, L, d = 2, 3, 4
        user = jax.random.normal(KEY, (b, L, d))
        doc = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        mask = jnp.array([[True, True, False], [True, False, False]])
        module = DNNAttention(dnn_dims=[4, 1])
        params = module.init(KEY, user, doc)
        attn_m, _ = module.apply(params, user, doc, mask)
        # zero out masked history rows manually -> same result
        user_zeroed = user * mask[..., None]
        attn_z, _ = module.apply(params, user_zeroed, doc, mask)
        np.testing.assert_allclose(np.asarray(attn_m), np.asarray(attn_z),
                                   rtol=1e-4, atol=1e-5)

    def test_functional_wrapper(self):
        b, L, d = 2, 3, 4
        user = jax.random.normal(KEY, (b, L, d))
        doc = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        attn, score, params = attention_by_dnn(user, doc, [4], rngs=KEY)
        attn2, score2, _ = attention_by_dnn(user, doc, [4], params=params)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(attn2),
                                   rtol=1e-6)
