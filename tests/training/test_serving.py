"""Tests for the serving scorer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rec_now_tpu.models import DCNv2Model, CANDCNModel, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.serving import (WireScorer, build_scorer,
                                 export_serving, load_serving)
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

    def test_wire_scorer_matches_raw(self, mesh):
        """Wire-fed scoring == raw scoring up to dense-wire rounding."""
        trainer = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), FC,
                          TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        raw = build_scorer(trainer)(
            state, jnp.asarray(batch.dense),
            jnp.asarray(batch.sparse_ids))
        for mode, tol in (("f16", 2e-3), ("u8", 3e-2)):
            ws = WireScorer(trainer, dense_mode=mode)
            out = ws(state, batch.dense, batch.sparse_ids)
            np.testing.assert_allclose(np.asarray(out), np.asarray(raw),
                                       atol=tol, err_msg=mode)
        # ids are exactly preserved: f16 wire on f16-representable
        # dense must be bit-identical
        b2 = batch._replace(
            dense=batch.dense.astype(np.float16).astype(np.float32))
        raw2 = build_scorer(trainer)(
            state, jnp.asarray(b2.dense), jnp.asarray(b2.sparse_ids))
        out2 = WireScorer(trainer)(state, b2.dense, b2.sparse_ids)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(raw2))

    def test_wire_scorer_request_bytes(self, mesh):
        """The packed request is a fraction of the raw one."""
        trainer = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), FC,
                          TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(256, 1))
        ws = WireScorer(trainer, dense_mode="u8")
        q, scale, words = ws.pack(batch.dense, batch.sparse_ids)
        packed = q.nbytes + words.nbytes   # scale amortizes (26 B/req)
        raw = batch.dense.nbytes + batch.sparse_ids.nbytes
        assert packed < raw * 0.35

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
        # wire-fed scoring must route the second (CAN) table too: ids
        # are exactly preserved, so f16 wire on f16-exact dense is
        # bit-identical
        b2 = batch._replace(
            dense=batch.dense.astype(np.float16).astype(np.float32))
        raw2 = scorer(state, jnp.asarray(b2.dense),
                      jnp.asarray(b2.sparse_ids))
        out2 = WireScorer(trainer)(state, b2.dense, b2.sparse_ids)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(raw2))

    def test_serving_checkpoint_roundtrip(self, mesh, tmp_path):
        """export_serving drops optimizer state; restored scores match
        bit-for-bit, and the artifact is materially smaller than a full
        TrainState checkpoint."""
        trainer = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4), FC,
                          TrainerConfig(), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        state, _ = trainer.train_step(state, *trainer.put(batch))
        scorer = build_scorer(trainer)
        dense, ids, *_ = trainer.put(batch)
        want = np.asarray(scorer(state, dense, ids))

        export_serving(str(tmp_path / "s"), state, trainer)
        restored = load_serving(str(tmp_path / "s"), trainer)
        got = np.asarray(scorer(restored, dense, ids))
        np.testing.assert_array_equal(got, want)
        # wire scorer also works off the restored state
        got2 = np.asarray(WireScorer(trainer)(
            restored, batch.dense.astype(np.float16).astype(np.float32),
            batch.sparse_ids))
        assert np.all(np.isfinite(got2))

        # size check: serving artifact < full state (has acc + adam
        # opt state + step)
        import subprocess
        def du(p):
            return int(subprocess.check_output(
                ["du", "-sb", str(p)]).split()[0])
        from rec_now_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / "full"))
        mgr.save(1, state)
        mgr.wait()
        mgr.close()
        assert du(tmp_path / "s") < du(tmp_path / "full") * 0.75
