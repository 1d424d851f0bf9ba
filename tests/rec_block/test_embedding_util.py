"""Tests for the static-shape slot/segment embedding utilities.

Golden values mirror the reference's documented examples
(rec_now/rec_block/embedding_util.py docstrings).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.rec_block import embedding_util as eu


class TestIsin:
    def test_doc_example(self):
        mat = [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
        got = eu.isin(jnp.array(mat), [1, 3, 5, 7, 9])
        expected = [[False, True, False, True, False],
                    [True, False, True, False, True]]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_mask_values(self):
        mat = [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
        got = eu.mask_values(jnp.array(mat), [1, 3, 5, 7, 9],
                             padding_value=-1)
        expected = [[-1, 1, -1, 3, -1], [5, -1, 7, -1, 9]]
        np.testing.assert_array_equal(np.asarray(got), expected)


class TestFirstOccurance:
    def test_doc_example(self):
        mat = [[0, 1, 1, 2, 3, 3], [1, 3, 3, 2, 5, 5]]
        got = eu.first_occurance_in_row(jnp.array(mat), padding_value=-1)
        expected = [[0, 1, -1, 2, 3, -1], [1, 3, -1, 2, 5, -1]]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_need_sort(self):
        mat = [[3, 1, 3, 1]]
        got = eu.first_occurance_in_row(jnp.array(mat), need_sort=True,
                                        padding_value=0)
        expected = [[1, 0, 3, 0]]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_rank_check(self):
        with pytest.raises(ValueError):
            eu.first_occurance_in_row(jnp.array([1, 2, 3]))


class TestBatchSegmentIds:
    def test_doc_example(self):
        slots = [[0, 1, 1, 2, 3, 3], [1, 3, 3, 2, 5, 5]]
        ids, num_rows, num_ids, num_segments = \
            eu.batch_segment_ids_of_targets(jnp.array(slots), [1, 3, 5])
        expected = [[-1, 0, 0, -1, 1, 1], [3, 4, 4, -1, 5, 5]]
        np.testing.assert_array_equal(np.asarray(ids), expected)
        assert num_rows == 2 and num_ids == 3 and num_segments == 6

    def test_sparse_variant(self):
        slots = [[0, 1, 1, 2, 3, 3], [1, 3, 3, 2, 5, 5]]
        mask, flat, num_rows, num_ids, num_segments = \
            eu.sparse_batch_segment_ids_of_targets(jnp.array(slots),
                                                   [1, 3, 5])
        expected_mask = [[False, True, True, False, True, True],
                         [True, True, True, False, True, True]]
        np.testing.assert_array_equal(np.asarray(mask), expected_mask)
        # valid entries carry batch segment ids; invalid -> drop bucket
        flat = np.asarray(flat).reshape(2, 6)
        assert flat[0, 1] == 0 and flat[0, 4] == 1
        assert flat[1, 0] == 3 and flat[1, 4] == 5
        assert flat[0, 0] == num_segments  # drop bucket


def _embedding_func(table):
    def f(ids):
        return jnp.take(jnp.asarray(table, jnp.float32),
                        jnp.asarray(ids), axis=0)
    return f


class TestEmbeddingPooled:
    def setup_method(self):
        # reference docstring example (embedding_util.py:248-289)
        self.params = np.array([[i, -i] for i in range(40)], np.float32)
        self.embedding_func = _embedding_func(self.params)
        self.ids = jnp.array([[0, 10, 20, 30], [21, 30, 31, 1]])
        self.slots = (np.asarray(self.ids) + 0.5) / 10.0
        self.slots = jnp.array(self.slots.astype(np.int32))
        self.target_slots = [1, 3]

    def test_weighted_sum(self):
        weights = jnp.asarray(self.ids, jnp.float32) * 10.0
        pooled = eu.embedding_using_sparse_batch_segment_ids(
            self.embedding_func, self.slots, self.target_slots, self.ids,
            weights=weights)
        expected = [[[1000., -1000.], [9000., -9000.]],
                    [[0., 0.], [18610., -18610.]]]
        np.testing.assert_allclose(np.asarray(pooled), expected, rtol=1e-5)

    def test_unweighted_sum(self):
        pooled = eu.embedding_using_sparse_batch_segment_ids(
            self.embedding_func, self.slots, self.target_slots, self.ids)
        expected = [[[10., -10.], [30., -30.]],
                    [[0., 0.], [61., -61.]]]
        np.testing.assert_allclose(np.asarray(pooled), expected, rtol=1e-5)

    def test_mean_pooling(self):
        slots = jnp.array([[1, 1, 2]])
        ids = jnp.array([[10, 12, 20]])
        pooled = eu.embedding_using_sparse_batch_segment_ids(
            self.embedding_func, slots, [1], ids, method="mean")
        np.testing.assert_allclose(np.asarray(pooled),
                                   [[[11., -11.]]], rtol=1e-5)


class TestEmbeddingSingleSlot:
    def test_doc_example(self):
        params = np.array([[i, -i] for i in range(40)], np.float32)
        f = _embedding_func(params)
        ids = jnp.array([[0, 10, 10, 30], [21, 22, 31, 1]])
        slots = jnp.array(((np.asarray(ids) + 0.5) / 10.0).astype(np.int32))
        weights = jnp.asarray(ids, jnp.float32) * 10.0
        emb, w, mask = eu.embedding_single_slot(f, slots, 2, ids, weights,
                                                ncols=2)
        np.testing.assert_allclose(
            np.asarray(emb),
            [[[0., 0.], [0., 0.]], [[21., -21.], [22., -22.]]], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(w), [[[0.], [0.]], [[210.], [220.]]], rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(mask),
            [[[False], [False]], [[True], [True]]])

    def test_truncation(self):
        params = np.eye(5, dtype=np.float32)
        f = _embedding_func(params)
        slots = jnp.array([[1, 1, 1]])
        ids = jnp.array([[0, 1, 2]])
        emb, _, mask = eu.embedding_single_slot(f, slots, 1, ids, ncols=2)
        assert emb.shape == (1, 2, 5)
        np.testing.assert_allclose(np.asarray(emb[0, 0]), params[0])
        np.testing.assert_allclose(np.asarray(emb[0, 1]), params[1])

    def test_requires_ncols(self):
        with pytest.raises(ValueError):
            eu.embedding_single_slot(lambda x: x, jnp.ones((1, 2)), 1,
                                     jnp.ones((1, 2)))


class TestPoolSlots:
    def test_doc_example(self):
        slots = jnp.array([[1, 2, 3, 0, 0], [2, 2, 4, 5, 0]])
        ids = slots * 10 + jnp.array([[0, 0, 0, 0, 0], [8, 0, 0, 0, 0]])
        weights = jnp.asarray(slots, jnp.float32) * 0.1
        pooled_ids, pooled_weights = eu.pool_slots(
            slots, [2, 3], ids, weights, drop_duplicate_slot=False)
        np.testing.assert_array_equal(np.asarray(pooled_ids),
                                      [[20, 30], [20, 0]])
        np.testing.assert_allclose(np.asarray(pooled_weights),
                                   [[0.2, 0.3], [0.4, 0.0]], rtol=1e-5)

    def test_drop_duplicate(self):
        slots = jnp.array([[1, 2, 3, 0, 0], [2, 2, 4, 5, 0]])
        ids = slots * 10 + jnp.array([[0, 0, 0, 0, 0], [8, 0, 0, 0, 0]])
        weights = jnp.asarray(slots, jnp.float32) * 0.1
        pooled_ids, _ = eu.pool_slots(slots, [2, 3], ids, weights,
                                      drop_duplicate_slot=True)
        np.testing.assert_array_equal(np.asarray(pooled_ids),
                                      [[20, 30], [28, 0]])

    def test_1d_slots(self):
        slots = jnp.array([1, 2, 2])
        ids = slots * 10
        pooled_ids, _ = eu.pool_slots(slots, [2], ids)
        np.testing.assert_array_equal(np.asarray(pooled_ids), [[20]])


class TestFetchSingleSlot:
    def test_doc_example(self):
        ids = jnp.array([[0, 10], [10, 20], [20, 21]])
        slots = jnp.array(((np.asarray(ids) + 0.5) / 10.0).astype(np.int32))
        weights = jnp.asarray(ids, jnp.float32) * 10.0
        slot_ids, slot_weights = eu.fetch_single_slot(
            slots, 2, ids, weights, default_id=0, ncols=2)
        np.testing.assert_array_equal(np.asarray(slot_ids),
                                      [[0, 0], [20, 0], [20, 21]])
        np.testing.assert_allclose(np.asarray(slot_weights),
                                   [[0., 0.], [200., 0.], [200., 210.]],
                                   rtol=1e-5)

    def test_default_values(self):
        slots = jnp.array([[1, 3]])
        ids = jnp.array([[7, 9]])
        got_ids, _ = eu.fetch_single_slot(slots, 2, ids, None,
                                          default_id=-5, ncols=3)
        np.testing.assert_array_equal(np.asarray(got_ids), [[-5, -5, -5]])


class TestPoolSingleSlot:
    def test_doc_example(self):
        slots = jnp.array([[1, 2, 3], [2, 3, 4]])
        ids = slots * 10
        weights = jnp.asarray(slots, jnp.float32) * 0.1
        with pytest.warns(UserWarning):
            pooled_ids, pooled_weights = eu.pool_single_slot(
                slots, 2, ids, weights)
        np.testing.assert_array_equal(np.asarray(pooled_ids), [[20], [20]])
        np.testing.assert_allclose(np.asarray(pooled_weights),
                                   [[0.2], [0.2]], rtol=1e-5)
