"""Tests for the static-shape in-batch listwise loss."""
import numpy as np
import jax.numpy as jnp
import pytest

from rec_now_tpu.losses import listwise as lw


def naive_listwise_loss(group_ids, labels, logits, pos_neg_th=0.5):
    """Reference-semantics listwise loss via a plain Python loop."""
    groups = {}
    for i, g in enumerate(group_ids):
        groups.setdefault(g, []).append(i)
    row_losses = []
    for g, idxs in groups.items():
        labs = np.array([labels[i] for i in idxs], np.float64)
        logs = np.array([logits[i] for i in idxs], np.float64)
        if not (np.any(labs > pos_neg_th) and np.any(labs < pos_neg_th)):
            continue
        p = labs / labs.sum()
        z = logs - logs.max()
        log_probs = z - np.log(np.exp(z).sum())
        row_losses.append(-(p * log_probs).sum())
    if not row_losses:
        return 0.0
    return float(np.mean(row_losses))


class TestRowPredicates:
    def test_row_not_all_zero(self):
        x = jnp.array([[0.0, 0.0], [0.0, 1.0]])
        np.testing.assert_array_equal(np.asarray(lw.row_not_all_zero(x)),
                                      [False, True])

    def test_greater_less(self):
        x = jnp.array([[0.2, 0.4], [0.9, 0.1]])
        np.testing.assert_array_equal(
            np.asarray(lw.row_has_value_greater_than(x, 0.5)), [False, True])
        np.testing.assert_array_equal(
            np.asarray(lw.row_has_value_less_than(x, 0.15)), [False, True])


class TestFirstOccurrence:
    def test_basic(self):
        g = jnp.array([3, 1, 3, 2, 1])
        np.testing.assert_array_equal(
            np.asarray(lw.first_occurrence_mask(g)),
            [True, True, False, True, False])


class TestToListwiseSample:
    def test_valid_rows(self):
        g = jnp.array([1, 1, 2, 2, 3])
        labels = jnp.array([1.0, 0.0, 1.0, 1.0, 0.0])
        logits = jnp.array([0.5, -0.5, 1.0, 2.0, 0.0])
        out = lw.to_listwise_sample(g, labels, logits)
        # group 1 has pos+neg -> valid; group 2 all pos -> invalid;
        # group 3 all neg -> invalid.
        np.testing.assert_array_equal(
            np.asarray(out.row_valid), [True, False, False, False, False])
        # member logits kept, non-member masked
        row0 = np.asarray(out.logits)[0]
        assert row0[0] == pytest.approx(0.5)
        assert row0[1] == pytest.approx(-0.5)
        assert row0[2] <= -1e8
        # labels normalized within the group
        row0_labels = np.asarray(out.labels)[0]
        assert row0_labels[0] == pytest.approx(1.0)
        assert row0_labels[1] == pytest.approx(0.0)

    def test_label_distribution_multi_pos(self):
        g = jnp.array([7, 7, 7])
        labels = jnp.array([1.0, 1.0, 0.0])
        logits = jnp.array([0.1, 0.2, 0.3])
        out = lw.to_listwise_sample(g, labels, logits)
        row = np.asarray(out.labels)[0]
        np.testing.assert_allclose(row, [0.5, 0.5, 0.0], atol=1e-6)


class TestListwiseLoss:
    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        b = 24
        groups = rng.randint(0, 6, size=b)
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        logits = rng.randn(b).astype(np.float32)
        loss = lw.listwise_loss(jnp.array(groups), jnp.array(labels),
                                jnp.array(logits))
        expected = naive_listwise_loss(groups, labels, logits)
        assert np.abs(float(loss) - expected) < 1e-5

    def test_zero_valid_groups_yields_zero_not_nan(self):
        # reference edge case:
        # tests/rec_block/test_listwise_loss_from_batch.py:36-51
        groups = jnp.array([1, 2, 3])
        labels = jnp.array([1.0, 1.0, 1.0])
        logits = jnp.array([0.5, 0.1, -0.3])
        loss = lw.listwise_loss(groups, labels, logits)
        assert float(loss) == pytest.approx(0.0)
        assert np.isfinite(float(loss))

    def test_gradient_finite(self):
        import jax
        groups = jnp.array([1, 1, 2, 2])
        labels = jnp.array([1.0, 0.0, 0.0, 1.0])
        logits = jnp.array([0.5, 0.2, -0.1, 0.9])
        g = jax.grad(lambda lg: lw.listwise_loss(groups, labels, lg))(logits)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_gradient_zero_when_no_valid_group(self):
        import jax
        groups = jnp.array([1, 2, 3])
        labels = jnp.array([1.0, 1.0, 1.0])
        logits = jnp.array([0.5, 0.1, -0.3])
        g = jax.grad(lambda lg: lw.listwise_loss(groups, labels, lg))(logits)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def test_jit(self):
        import jax
        f = jax.jit(lw.listwise_loss)
        groups = jnp.array([1, 1, 2, 2])
        labels = jnp.array([1.0, 0.0, 0.0, 1.0])
        logits = jnp.array([0.5, 0.2, -0.1, 0.9])
        assert np.abs(float(f(groups, labels, logits))
                      - float(lw.listwise_loss(groups, labels, logits))) < 1e-6


class TestNanToZero:
    def test_nan(self):
        assert float(lw.nan_to_zero(jnp.array(float("nan")))) == 0.0
        assert float(lw.nan_to_zero(jnp.array(1.5))) == 1.5
