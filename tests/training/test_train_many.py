"""Tests for the on-device scanned multi-step training loop."""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rec_now_tpu.models import FMModel, DCNv2Model, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

FC = FeatureConfig(rows_per_field=512, embedding_dim=4)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestTrainMany:
    def test_matches_stepwise(self, mesh):
        """One scan over S batches == S individual train_step calls."""
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batches = list(data.batches(64, 4, seed=3))

        t1 = Trainer(FMModel(), FC, TrainerConfig(), mesh=mesh)
        s1 = t1.init(jax.random.PRNGKey(0), batches[0])
        for b in batches:
            s1, m1 = t1.train_step(s1, *t1.put(b))

        t2 = Trainer(FMModel(), FC, TrainerConfig(), mesh=mesh)
        s2 = t2.init(jax.random.PRNGKey(0), batches[0])
        s2, mseq = t2.train_many(s2, batches)

        assert int(s2.step) == int(s1.step) == 4
        np.testing.assert_allclose(np.asarray(s2.table.table),
                                   np.asarray(s1.table.table), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(float(mseq["loss"][-1]),
                                   float(m1["loss"]), rtol=1e-5)

    def test_metrics_stacked(self, mesh):
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batches = list(data.batches(64, 5, seed=3))
        trainer = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), FC,
                          TrainerConfig(pairwise_weight=0.5), mesh=mesh)
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        state, mseq = trainer.train_many(state, batches)
        assert mseq["loss"].shape == (5,)
        assert np.all(np.isfinite(np.asarray(mseq["loss"])))
