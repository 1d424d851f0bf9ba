"""Tests for the sort-free (dedup=False) sharded update mode."""
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


class TestScatterMode:
    @pytest.mark.slow
    def test_unique_ids_match_dedup_mode(self, mesh):
        """With no duplicate ids the two modes are identical."""
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        s0 = table.init(KEY)
        ids = jnp.arange(16, dtype=jnp.int32) * 3 % 64  # all distinct
        grads = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        a = table.apply_grads(s0, ids, grads, 0.1, dedup=True)
        b = table.apply_grads(s0, ids, grads, 0.1, dedup=False)
        np.testing.assert_allclose(np.asarray(a.table),
                                   np.asarray(b.table), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.accumulator),
                                   np.asarray(b.accumulator), rtol=1e-5)

    @pytest.mark.slow
    def test_duplicates_accumulate_deterministically(self, mesh):
        """Duplicate rows: grads sum into the row; acc gets per-
        occurrence contributions (documented semantic difference)."""
        table = ShardedEmbeddingTable(vocab_size=64, dim=2, mesh=mesh,
                                      initial_accumulator=0.1)
        s0 = table.init(KEY)
        ids = jnp.array([5] * 8, jnp.int32)  # duplicate-hammered row
        g = jnp.ones((8, 2))
        s1 = table.apply_grads(s0, ids, g, 0.1, dedup=False)
        # acc += 8 * mean(1^2) = 8
        assert table.debug_read(s1.accumulator, [5])[0] == \
            pytest.approx(8.1, rel=1e-5)
        # each occurrence scaled by the post-batch accumulator
        expected = (table.debug_read(s0.table, [5])[0]
                    - 8 * 0.1 / np.sqrt(8.1) * np.ones(2))
        np.testing.assert_allclose(table.debug_read(s1.table, [5])[0],
                                   expected, rtol=1e-5)

    def test_training_converges(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh,
                                      initializer_scale=0.1)
        state = table.init(KEY)
        ids = jnp.arange(16, dtype=jnp.int32)
        target = jax.random.normal(jax.random.PRNGKey(1), (16, 4))

        @jax.jit
        def step(state):
            emb = table.lookup(state, ids)
            loss, grad = jax.value_and_grad(
                lambda e: jnp.mean((e - target) ** 2))(emb)
            return table.apply_grads(state, ids, grad, lr=0.5,
                                     dedup=False), loss

        # one dispatch via fori_loop instead of 40 sequential jit calls:
        # on the oversubscribed CI box each dispatch of an 8-replica
        # collective program opens a rendezvous window, and under
        # pytest-xdist load the 40 s rendezvous deadline occasionally
        # fired mid-loop, aborting the worker (r4 forensics)
        @jax.jit
        def run(state):
            _, loss0 = step(state)
            state, loss = jax.lax.fori_loop(
                0, 40, lambda i, c: step(c[0]), (state, loss0))
            return loss0, loss

        loss0, loss = run(state)
        assert float(loss) < float(loss0) * 0.2
