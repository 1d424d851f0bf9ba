"""End-to-end test of benchmark config #5: CAN + DCN-v2 pipeline."""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rec_now_tpu.models import CANDCNModel, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

FC = FeatureConfig(num_dense=13, num_sparse=26, rows_per_field=1000,
                   embedding_dim=8)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestCANPipeline:
    def test_trains_with_joint_pairwise(self, mesh):
        data = SyntheticCriteo(rows_per_field=1000, num_users=200)
        cfg = TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                            dense_lr=0.01, can_param_field=8,
                            can_dnn_dims=(8,))
        model = CANDCNModel(history_fields=tuple(range(8)),
                            can_dnn_dims=(8,), deep_dims=(64, 32),
                            dcn_sub_dim=8)
        trainer = Trainer(model, FC, cfg, mesh=mesh)
        assert trainer.can_table is not None
        # param table dim = D*D + D for one 8->8 layer
        assert trainer.can_table.dim == 8 * 8 + 8

        batches = list(data.batches(512, 60, seed=1))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        assert state.can_table is not None
        state, metrics = trainer.fit(state, batches)
        assert np.isfinite(metrics["loss"])
        assert int(state.step) == 60

        res = trainer.evaluate(state, data.batches(512, 4, seed=99))
        assert res["auc"] > 0.6, res

    def test_can_table_updates(self, mesh):
        data = SyntheticCriteo(rows_per_field=1000, num_users=100)
        cfg = TrainerConfig(can_param_field=8, can_dnn_dims=(8,))
        model = CANDCNModel(history_fields=(0, 1), can_dnn_dims=(8,),
                            deep_dims=(16,), dcn_sub_dim=4)
        trainer = Trainer(model, FC, cfg, mesh=mesh)
        batch = next(data.batches(128, 1, seed=3))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        before = np.asarray(state.can_table.table).copy()
        state, _ = trainer.train_step(state, *trainer.put(batch))
        after = np.asarray(state.can_table.table)
        assert np.any(before != after)
