"""Tests for the static-shape in-batch pairwise loss.

Strategy (mirrors the reference's golden-value style, SURVEY.md §4, but
with goldens derived from a naive O(B^2) Python loop instead of TF RNG
streams): every masked-matrix computation must match a direct enumeration
of valid pairs.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from rec_now_tpu.losses import pairwise as pw


def naive_pairs(outputs, labels, groups_list, mask=None,
                only_wrong_order=False, weight_func=None):
    """Enumerate valid (pos, neg) pairs the way the reference defines them."""
    b = len(outputs)
    pairs = []
    for i in range(b):
        for j in range(b):
            if i == j:
                continue
            if any(g[i] != g[j] for g in groups_list):
                continue
            if mask is not None and not (mask[i] and mask[j]):
                continue
            if weight_func is None:
                if not labels[i] > labels[j]:
                    continue
                w = 1.0
            else:
                w = weight_func(labels[i], labels[j])
                if not w > 0:
                    continue
            if only_wrong_order and not outputs[i] < outputs[j]:
                continue
            pairs.append((i, j, w))
    return pairs


def naive_bpr(pairs, outputs, groups_main=None, occ_power=0.0, factor=1.0):
    if not pairs:
        return 0.0
    if occ_power != 0.0:
        counts = {}
        for (i, j, w) in pairs:
            counts[groups_main[i]] = counts.get(groups_main[i], 0) + 1
    total = 0.0
    for (i, j, w) in pairs:
        logit = (outputs[i] - outputs[j]) * factor
        loss = math.log1p(math.exp(-logit))
        if occ_power != 0.0:
            w = w * counts[groups_main[i]] ** occ_power
        total += loss * w
    return total / (len(pairs) + 1e-10)


class TestPairMask:
    def test_basic_groups(self):
        groups = jnp.array([1, 1, 2, 2, 2])
        m = np.asarray(pw.generate_pair_mask(groups))
        expected = np.array([
            [False, True, False, False, False],
            [True, False, False, False, False],
            [False, False, False, True, True],
            [False, False, True, False, True],
            [False, False, True, True, False]])
        np.testing.assert_array_equal(m, expected)

    def test_multi_condition_and(self):
        g1 = jnp.array([1, 1, 1, 2])
        g2 = jnp.array([7, 7, 8, 8])
        m = np.asarray(pw.generate_pair_mask([g1, g2]))
        # only samples 0,1 share both conditions
        expected = np.zeros((4, 4), dtype=bool)
        expected[0, 1] = expected[1, 0] = True
        np.testing.assert_array_equal(m, expected)

    def test_upper_band(self):
        groups = jnp.array([1, 1, 1])
        m = np.asarray(pw.generate_pair_mask(groups, only_upper_band=True))
        # band_part(x, 0, 1): diagonal + first superdiagonal; diagonal is
        # already removed by the eye subtraction.
        expected = np.array([
            [False, True, False],
            [False, False, True],
            [False, False, False]])
        np.testing.assert_array_equal(m, expected)


class TestOccuranceWeight:
    def test_powers(self):
        g = jnp.array([1, 2, 2])
        np.testing.assert_allclose(
            np.asarray(pw.occurance_power_weight(g, 1.0)), [1.0, 2.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(pw.occurance_power_weight(g, 0.0)), [1.0, 1.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(pw.occurance_power_weight(g, -1.0)), [1.0, 0.5, 0.5])


class TestPairwiseLoss:
    def test_matches_naive_simple(self):
        outputs = np.array([0.5, -0.2, 1.0, 0.3, -0.7], np.float32)
        labels = np.array([1.0, 0.0, 1.0, 0.0, 1.0], np.float32)
        groups = np.array([1, 1, 2, 2, 2])
        loss = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                jnp.array(groups))
        pairs = naive_pairs(outputs, labels, [groups])
        expected = naive_bpr(pairs, outputs)
        assert np.abs(float(loss) - expected) < 1e-5

    def test_no_valid_pair_returns_zero(self):
        outputs = jnp.array([0.5, -0.2], jnp.float32)
        labels = jnp.array([1.0, 1.0], jnp.float32)  # no label order
        groups = jnp.array([1, 1])
        loss = pw.pairwise_loss(outputs, labels, groups)
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_sample_mask(self):
        rng = np.random.RandomState(0)
        b = 16
        outputs = rng.randn(b).astype(np.float32)
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        groups = rng.randint(0, 4, size=b)
        mask = rng.rand(b) > 0.3
        loss = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                jnp.array(groups), mask=jnp.array(mask))
        pairs = naive_pairs(outputs, labels, [groups], mask=mask)
        expected = naive_bpr(pairs, outputs)
        assert np.abs(float(loss) - expected) < 1e-5

    def test_wrong_order_only(self):
        rng = np.random.RandomState(1)
        b = 12
        outputs = rng.randn(b).astype(np.float32)
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        groups = rng.randint(0, 3, size=b)
        loss = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                jnp.array(groups),
                                only_use_wrong_order_pair=True)
        pairs = naive_pairs(outputs, labels, [groups],
                            only_wrong_order=True)
        expected = naive_bpr(pairs, outputs)
        assert np.abs(float(loss) - expected) < 1e-5

    def test_occurance_power(self):
        rng = np.random.RandomState(2)
        b = 20
        outputs = rng.randn(b).astype(np.float32)
        labels = (rng.rand(b) > 0.4).astype(np.float32)
        groups = rng.randint(0, 5, size=b)
        for power in (-1.0, 0.5, 1.0):
            loss = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                    jnp.array(groups),
                                    click_occurance_power=power)
            pairs = naive_pairs(outputs, labels, [groups])
            expected = naive_bpr(pairs, outputs, groups_main=groups,
                                 occ_power=power)
            assert np.abs(float(loss) - expected) < 1e-5, power

    def test_custom_weight_func_equivalence(self):
        # weight func replicating the default behavior must match the
        # default path (reference test style:
        # tests/rec_block/test_pairwise_loss_from_batch.py:33-74).
        rng = np.random.RandomState(3)
        b = 10
        outputs = rng.randn(b).astype(np.float32)
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        groups = rng.randint(0, 3, size=b)

        def weight_fn(lab_pos, lab_neg):
            return (lab_pos > lab_neg).astype(jnp.float32)

        l_default = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                     jnp.array(groups))
        l_custom = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                    jnp.array(groups),
                                    label_pair_to_weight_func=weight_fn)
        assert np.abs(float(l_default) - float(l_custom)) < 1e-6

    def test_return_num_pair(self):
        outputs = jnp.array([0.5, -0.2, 1.0], jnp.float32)
        labels = jnp.array([1.0, 0.0, 0.0], jnp.float32)
        groups = jnp.array([1, 1, 1])
        loss, n = pw.pairwise_loss(outputs, labels, groups,
                                   return_num_pair=True)
        assert float(n) == 2.0

    def test_multi_group_conditions(self):
        rng = np.random.RandomState(4)
        b = 14
        outputs = rng.randn(b).astype(np.float32)
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        g1 = rng.randint(0, 3, size=b)
        g2 = rng.randint(0, 2, size=b)
        loss = pw.pairwise_loss(jnp.array(outputs), jnp.array(labels),
                                [jnp.array(g1), jnp.array(g2)])
        pairs = naive_pairs(outputs, labels, [g1, g2])
        expected = naive_bpr(pairs, outputs)
        assert np.abs(float(loss) - expected) < 1e-5

    def test_gradient_flows_only_through_outputs(self):
        import jax
        outputs = jnp.array([0.5, -0.2, 1.0], jnp.float32)
        labels = jnp.array([1.0, 0.0, 0.0], jnp.float32)
        groups = jnp.array([1, 1, 1])
        g = jax.grad(lambda o: pw.pairwise_loss(o, labels, groups))(outputs)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)

    def test_jit_static_shape(self):
        import jax
        f = jax.jit(pw.pairwise_loss)
        outputs = jnp.array([0.5, -0.2, 1.0, 0.1], jnp.float32)
        labels = jnp.array([1.0, 0.0, 1.0, 0.0], jnp.float32)
        groups = jnp.array([1, 1, 2, 2])
        l1 = f(outputs, labels, groups)
        l2 = pw.pairwise_loss(outputs, labels, groups)
        assert np.abs(float(l1) - float(l2)) < 1e-6


class TestBprLossFunc:
    def test_factor_and_weights(self):
        pos = jnp.array([[1.0, 0.5]])
        neg = jnp.array([[0.2, 0.6]])
        w = jnp.array([[2.0, 1.0]])
        loss = pw.bpr_loss_func(pos, neg, w, factor=2.0)
        expected = (2 * math.log1p(math.exp(-1.6))
                    + math.log1p(math.exp(0.2))) / (2 + 1e-10)
        assert np.abs(float(loss) - expected) < 1e-6
