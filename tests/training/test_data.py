"""Tests for the synthetic Criteo generator."""
import numpy as np

from rec_now_tpu.training import SyntheticCriteo
from rec_now_tpu.training.metrics import StreamingGAUC


class TestSyntheticCriteo:
    def test_shapes_and_dtypes(self):
        data = SyntheticCriteo(rows_per_field=1000, num_users=100)
        batch = next(data.batches(64, 1))
        assert batch.dense.shape == (64, 13)
        assert batch.sparse_ids.shape == (64, 26)
        assert batch.labels.shape == (64,)
        assert batch.sparse_ids.dtype == np.int32
        assert set(np.unique(batch.labels)) <= {0.0, 1.0}
        assert batch.sparse_ids.max() < 1000
        assert batch.domain_idx.max() < 4

    def test_deterministic(self):
        data = SyntheticCriteo(rows_per_field=1000, seed=3)
        b1 = next(data.batches(32, 1, seed=7))
        b2 = next(data.batches(32, 1, seed=7))
        np.testing.assert_array_equal(b1.sparse_ids, b2.sparse_ids)
        np.testing.assert_array_equal(b1.labels, b2.labels)

    def test_planted_signal_learnable(self):
        """The planted logit must separate labels well above chance."""
        data = SyntheticCriteo(rows_per_field=1000, num_users=100)
        rng = np.random.RandomState(0)
        b = data.sample(5000, rng)
        lat = data.latent[np.arange(data.num_sparse)[None, :], b.sparse_ids]
        first = (lat.sum(-1) * data.field_w[None, :]).sum(-1)
        summed = lat.sum(1)
        inter = 0.5 * ((summed ** 2).sum(-1) - (lat ** 2).sum(-1).sum(-1))
        logit = (b.dense @ data.dense_w + first + 0.3 * inter
                 + data.user_bias[b.group_ids])
        auc = StreamingGAUC._auc(b.labels, logit)
        assert auc > 0.75, auc

    def test_groups_have_multiple_samples(self):
        data = SyntheticCriteo(rows_per_field=1000, num_users=50)
        b = next(data.batches(256, 1))
        _, counts = np.unique(b.group_ids, return_counts=True)
        assert counts.max() >= 2

    def test_cvr_subset_of_clicks(self):
        data = SyntheticCriteo(rows_per_field=1000)
        b = next(data.batches(512, 1))
        assert np.all(b.cvr_labels <= b.labels)
