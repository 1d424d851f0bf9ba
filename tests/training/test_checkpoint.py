"""Tests for checkpoint save/restore round-trips."""
import tempfile

import jax
import numpy as np

from rec_now_tpu.models import FMModel, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig
from rec_now_tpu.training.checkpoint import CheckpointManager


class TestCheckpointRoundTrip:
    def test_save_restore_train_state(self):
        mesh = make_mesh(8)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        trainer = Trainer(FMModel(), fc, TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        state, _ = trainer.train_step(state, *trainer.put(batch))

        with tempfile.TemporaryDirectory() as tmp:
            mgr = CheckpointManager(tmp)
            mgr.save(int(state.step), state)
            mgr.wait()
            assert mgr.latest_step() == 1

            restored = mgr.restore(target=state)
            np.testing.assert_allclose(
                np.asarray(restored.table.table),
                np.asarray(state.table.table))
            np.testing.assert_allclose(
                np.asarray(
                    restored.params["params"]["linear_dense"]["kernel"]),
                np.asarray(state.params["params"]["linear_dense"]["kernel"]))
            mgr.close()

    def test_restored_state_trains_on(self):
        mesh = make_mesh(8)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        trainer = Trainer(FMModel(), fc, TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        with tempfile.TemporaryDirectory() as tmp:
            mgr = CheckpointManager(tmp)
            mgr.save(0, state)
            mgr.wait()
            restored = mgr.restore(target=state)
            mgr.close()
        new_state, metrics = trainer.train_step(restored,
                                                *trainer.put(batch))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

    def test_sharded_adam_resume_equivalence(self):
        """m/v/count round-trip: resumed training == uninterrupted.

        The lazy sparse-Adam state (first/second moments + bias-
        correction counter) must survive the checkpoint exactly, or the
        resumed run diverges from the uninterrupted one.
        """
        mesh = make_mesh(8)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        trainer = Trainer(FMModel(), fc,
                          TrainerConfig(sparse_optimizer="adam",
                                        sparse_lr=1e-3), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batches = list(data.batches(64, 4, seed=3))
        state = trainer.init(jax.random.PRNGKey(0), batches[0])
        for b in batches[:2]:
            state, _ = trainer.train_step(state, *trainer.put(b))
        assert state.table.m is not None and state.table.count is not None

        with tempfile.TemporaryDirectory() as tmp:
            mgr = CheckpointManager(tmp)
            mgr.save(int(state.step), state)
            mgr.wait()
            restored = mgr.restore(target=state)
            mgr.close()
        for part in ("table", "m", "v", "accumulator", "count"):
            np.testing.assert_array_equal(
                np.asarray(getattr(restored.table, part)),
                np.asarray(getattr(state.table, part)), err_msg=part)

        cont = state
        for b in batches[2:]:
            cont, _ = trainer.train_step(cont, *trainer.put(b))
            restored, _ = trainer.train_step(restored, *trainer.put(b))
        np.testing.assert_array_equal(np.asarray(cont.table.table),
                                      np.asarray(restored.table.table))
        np.testing.assert_array_equal(np.asarray(cont.table.m),
                                      np.asarray(restored.table.m))
        np.testing.assert_array_equal(np.asarray(cont.table.v),
                                      np.asarray(restored.table.v))
        assert int(cont.table.count) == int(restored.table.count)
        assert int(cont.step) == int(restored.step)
