"""Tests for the row-wise lazy sparse Adam optimizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.embedding import ShardedEmbeddingTable
from rec_now_tpu.parallel import make_mesh

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestSparseAdam:
    @pytest.mark.slow
    def test_first_step_matches_reference_formula(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh,
                                      optimizer="adam")
        s0 = table.init(KEY)
        assert s0.m is not None and s0.v is not None
        ids = jnp.array([3, 10], jnp.int32)
        g = jnp.array([[1.0, 0, 0, 0], [0, 2.0, 0, 0]])
        s1 = table.apply_grads(s0, ids, g, lr=0.1)
        assert int(s1.count) == 1
        # step 1: mhat = g, vhat = g^2 -> update = lr * g/(|g|+eps)
        before = table.debug_read(s0.table, ids)
        after = table.debug_read(s1.table, ids)
        for k, gi in enumerate(np.asarray(g)):
            expected = before[k] - 0.1 * gi / (np.abs(gi) + 1e-7)
            np.testing.assert_allclose(after[k], expected, rtol=1e-4,
                                       atol=1e-6)

    @pytest.mark.slow
    def test_untouched_rows_and_moments_unchanged(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh,
                                      optimizer="adam")
        s0 = table.init(KEY)
        ids = jnp.array([5], jnp.int32)
        g = jnp.ones((1, 4))
        s1 = table.apply_grads(s0, ids, g, lr=0.1)
        others = np.array([i for i in range(table.vocab_size) if i != 5])
        np.testing.assert_allclose(table.debug_read(s1.table, others),
                                   table.debug_read(s0.table, others))
        np.testing.assert_allclose(table.debug_read(s1.m, others), 0.0)
        assert np.any(table.debug_read(s1.m, [5]) != 0)

    @pytest.mark.slow
    def test_duplicates_sum_before_moment_update(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=2, mesh=mesh,
                                      optimizer="adam")
        s0 = table.init(KEY)
        ids = jnp.array([7, 7], jnp.int32)
        g = jnp.array([[1.0, 0.0], [1.0, 0.0]])
        s1 = table.apply_grads(s0, ids, g, lr=0.1)
        # row grad = [2, 0] -> m = 0.1*2 = 0.2
        np.testing.assert_allclose(table.debug_read(s1.m, [7])[0],
                                   [0.2, 0.0], rtol=1e-5, atol=1e-7)

    def test_training_converges(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh,
                                      optimizer="adam",
                                      initializer_scale=0.1)
        state = table.init(KEY)
        ids = jnp.arange(16, dtype=jnp.int32)
        target = jax.random.normal(jax.random.PRNGKey(1), (16, 4))

        def step(state, _):
            emb = table.lookup(state, ids)
            loss, grad = jax.value_and_grad(
                lambda e: jnp.mean((e - target) ** 2))(emb)
            return table.apply_grads(state, ids, grad, lr=0.05), loss

        # one scanned dispatch, not 40 eager shard_map calls: repeated
        # collective rendezvous on the 2-core 8-virtual-device mesh can
        # starve XLA's rendezvous threads and abort the process (infra
        # flake, seen under pytest-xdist contention)
        @jax.jit
        def run(state):
            return jax.lax.scan(step, state, None, length=41)

        _, losses = run(state)
        assert float(losses[-1]) < float(losses[0]) * 0.5

    @pytest.mark.slow
    def test_trainer_integration(self, mesh):
        from rec_now_tpu.models import FMModel, FeatureConfig
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        trainer = Trainer(FMModel(), fc,
                          TrainerConfig(sparse_optimizer="adam",
                                        sparse_lr=0.01), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=512, num_users=50)
        batch = next(data.batches(64, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        state, metrics = trainer.train_step(state, *trainer.put(batch))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.table.count) == 1
