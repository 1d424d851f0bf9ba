"""End-to-end training tests on the 8-device virtual mesh."""
import jax
import numpy as np
import pytest

from rec_now_tpu.models import (FMModel, DCNv2Model, XDeepFMModel,
                                MultiTaskModel, FeatureConfig)
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

FC = FeatureConfig(num_dense=13, num_sparse=26, rows_per_field=1000,
                   embedding_dim=8)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def data():
    return SyntheticCriteo(rows_per_field=1000, num_users=200)


def _train(model, cfg, mesh, data, steps=80, batch=512, num_tasks=1):
    trainer = Trainer(model, FC, cfg, mesh=mesh)
    batches = list(data.batches(batch, steps, seed=1))
    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    state, metrics = trainer.fit(state, batches)
    res = trainer.evaluate(state, data.batches(batch, 4, seed=99))
    return trainer, state, metrics, res


class TestFMPointwise:
    @pytest.mark.slow
    def test_learns(self, mesh, data):
        """Config #1: FM + pointwise BCE must beat random AUC."""
        trainer, state, metrics, res = _train(
            FMModel(), TrainerConfig(pointwise_weight=1.0, dense_lr=0.01),
            mesh, data)
        assert np.isfinite(metrics["loss"])
        assert res["auc"] > 0.6, res


class TestDCNv2Pairwise:
    @pytest.mark.slow
    def test_learns_with_joint_loss(self, mesh, data):
        """Flagship: DCN-v2 + pointwise + in-batch pairwise."""
        trainer, state, metrics, res = _train(
            DCNv2Model(deep_dims=(64, 32), dcn_sub_dim=8),
            TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                          click_occurance_power=-0.5, dense_lr=0.01),
            mesh, data)
        assert np.isfinite(metrics["pairwise"])
        assert res["auc"] > 0.6, res
        assert res["gauc"] > 0.55, res


class TestXDeepFMListwise:
    @pytest.mark.slow
    def test_learns(self, mesh, data):
        trainer, state, metrics, res = _train(
            XDeepFMModel(cin_hidden_sizes=(16,), deep_dims=(32,)),
            TrainerConfig(pointwise_weight=1.0, listwise_weight=0.5,
                          dense_lr=0.01),
            mesh, data, steps=60)
        assert np.isfinite(metrics["listwise"])
        assert res["auc"] > 0.6, res


class TestMultiTask:
    @pytest.mark.slow
    def test_two_task_heads(self, mesh, data):
        trainer, state, metrics, res = _train(
            MultiTaskModel(num_task=2, mmoe_dims=(32, 16), tower_dim=8),
            TrainerConfig(pointwise_weight=1.0, num_tasks=2,
                          dense_lr=0.01),
            mesh, data, steps=50)
        assert np.isfinite(metrics["cvr_loss"])
        assert res["auc"] > 0.55, res


class TestStepMechanics:
    @pytest.mark.slow
    def test_step_counter_and_no_recompile(self, mesh, data):
        trainer = Trainer(FMModel(), FC, TrainerConfig(), mesh=mesh)
        batches = list(data.batches(128, 3, seed=5))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        for b in batches:
            state, _ = trainer.train_step(state, *trainer.put(b))
        assert int(state.step) == 3

    @pytest.mark.slow
    def test_table_sharded_after_steps(self, mesh, data):
        trainer = Trainer(FMModel(), FC, TrainerConfig(), mesh=mesh)
        batches = list(data.batches(128, 2, seed=5))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        state, _ = trainer.train_step(state, *trainer.put(batches[0]))
        # XLA may normalize P('data', None) to P('data'); both mean
        # rows sharded over the mesh axis
        spec = state.table.table.sharding.spec
        assert len(spec) >= 1 and spec[0] == "data", spec


class TestRoutedDropSurfacing:
    """metrics['sparse_dropped'] + TrainerConfig.route_strict."""

    def _trainer(self, mesh, strict, cap_factor=0.25):
        fc = FeatureConfig(num_dense=13, num_sparse=26,
                           rows_per_field=64, embedding_dim=8)
        trainer = Trainer(
            DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), fc,
            TrainerConfig(pointwise_weight=1.0,
                          sparse_route_mode="routed",
                          route_strict=strict), mesh=mesh)
        # shrink the routing buffers so a skewed batch actually drops
        trainer.table.route_cap_factor = cap_factor
        trainer.table.route_ov_cap = 8
        return trainer

    def _skewed_batch(self, data, batch=64):
        b = data.sample(batch, np.random.RandomState(0))
        # raw ids all multiples of 8 with rows_per_field=64 -> every
        # global id = raw + f*64 is ~owned by one shard per field;
        # force ALL fields to shard 0 by zeroing the raw ids' low bits
        ids = (b.sparse_ids % 64) & ~np.int32(7)
        return b._replace(sparse_ids=ids.astype(np.int32))

    @pytest.mark.slow
    def test_metric_present_and_zero_on_uniform_ids(self, mesh, data):
        trainer = self._trainer(mesh, strict=False, cap_factor=2.0)
        batch = data.sample(256, np.random.RandomState(1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        state, metrics = trainer.train_step(state, *trainer.put(batch))
        assert "sparse_dropped" in metrics
        assert int(metrics["sparse_dropped"]) == 0
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow
    def test_skewed_ids_counted_and_strict_raises(self, mesh, data):
        trainer = self._trainer(mesh, strict=True)
        batch = self._skewed_batch(data)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        with pytest.raises(RuntimeError, match="dropped"):
            trainer.fit(state, [batch])
        # non-strict: same step reports the nonzero counter instead
        trainer2 = self._trainer(mesh, strict=False)
        state2 = trainer2.init(jax.random.PRNGKey(0), batch)
        state2, metrics = trainer2.train_step(state2,
                                              *trainer2.put(batch))
        assert int(metrics["sparse_dropped"]) > 0
        assert np.isfinite(float(metrics["loss"]))


class TestEvaluateDevice:
    def test_matches_exact_evaluate(self, mesh, data):
        """Device-resident eval agrees with the exact host oracle.

        AUC: bucketed histogram vs exact sort — within O(1/K).
        GAUC: gauc='inbatch' reports the in-batch pair statistic, so
        the oracle here is batch_gauc over the same batches (the
        corpus default is covered by tests/training/test_device_gauc).
        """
        from rec_now_tpu.training.metrics import batch_gauc
        trainer = Trainer(
            DCNv2Model(deep_dims=(32, 16), dcn_sub_dim=8), FC,
            TrainerConfig(pointwise_weight=1.0, dense_lr=0.01),
            mesh=mesh)
        batches = list(data.batches(256, 6, seed=7))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        state, _ = trainer.train_step(state, *trainer.put(batches[0]))

        eval_batches = list(data.batches(256, 4, seed=11))
        exact = trainer.evaluate(state, eval_batches)
        fast = trainer.evaluate_device(state, eval_batches, window=2,
                                       gauc="inbatch")
        assert fast["auc"] == pytest.approx(exact["auc"], abs=2e-3)
        assert fast["num_pos"] + fast["num_neg"] == pytest.approx(
            256 * 4)
        # in-batch GAUC oracle: pair-weighted mean over the same batches
        wins, totals = 0.0, 0.0
        from rec_now_tpu.training.metrics import batch_gauc_stats
        for b in eval_batches:
            dense, ids, labels, groups, cvr, domain = trainer.put(b)
            logits = trainer.eval_step(state, dense, ids, domain)
            w, t = batch_gauc_stats(labels, logits, groups)
            wins += float(w)
            totals += float(t)
        assert fast["gauc"] == pytest.approx(wins / totals, abs=1e-4)

    @pytest.mark.slow
    def test_multi_task_cvr_auc(self, mesh, data):
        trainer = Trainer(
            MultiTaskModel(num_task=2), FC,
            TrainerConfig(pointwise_weight=1.0, num_tasks=2,
                          dense_lr=0.01),
            mesh=mesh)
        # 3 batches at window=2 exercises the ragged-tail merge
        # ([2, 1] -> one [3] window, a single compile)
        batches = list(data.batches(256, 3, seed=3))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        fast = trainer.evaluate_device(state, batches, window=2,
                                       num_group_slots=256,
                                       group_buckets=128)
        exact = trainer.evaluate(state, batches)
        assert fast["cvr_auc"] == pytest.approx(exact["cvr_auc"],
                                                abs=2e-3)
        assert fast["auc"] == pytest.approx(exact["auc"], abs=2e-3)
