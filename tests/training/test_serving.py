"""Tests for the serving scorer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rec_now_tpu.models import DCNv2Model, CANDCNModel, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.serving import build_scorer
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

FC = FeatureConfig(rows_per_field=512, embedding_dim=4)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestServing:
    def test_scorer_matches_eval_step(self, mesh):
        trainer = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), FC,
                          TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        dense, ids, *_ = trainer.put(batch)
        scorer = build_scorer(trainer)
        s1 = scorer(state, dense, ids)
        s2 = trainer.eval_step(state, dense, ids)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)

    def test_scorer_with_can_table(self, mesh):
        trainer = Trainer(
            CANDCNModel(history_fields=(0, 1), can_dnn_dims=(4,),
                        deep_dims=(8,), dcn_sub_dim=2),
            FC, TrainerConfig(can_param_field=3, can_dnn_dims=(4,)),
            mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        dense, ids, *_ = trainer.put(batch)
        scorer = build_scorer(trainer)
        logits = scorer(state, dense, ids)
        assert logits.shape == (64,)
        assert np.all(np.isfinite(np.asarray(logits)))
