"""Tests for the single-chip embedding table and sparse Adagrad."""
import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.embedding import EmbeddingTable

KEY = jax.random.PRNGKey(0)


class TestLookup:
    def test_shapes_and_values(self):
        table = EmbeddingTable(vocab_size=100, dim=4)
        state = table.init(KEY)
        ids = jnp.array([[1, 2], [3, 1]])
        emb = table.lookup(state, ids)
        assert emb.shape == (2, 2, 4)
        np.testing.assert_allclose(np.asarray(emb[0, 0]),
                                   np.asarray(state.table[1]))
        np.testing.assert_allclose(np.asarray(emb[1, 1]),
                                   np.asarray(state.table[1]))

    def test_embedding_func_contract(self):
        table = EmbeddingTable(vocab_size=10, dim=3)
        state = table.init(KEY)
        f = table.embedding_func(state)
        out = f(jnp.array([0, 5]))
        assert out.shape == (2, 3)


class TestSparseAdagrad:
    def test_untouched_rows_unchanged(self):
        table = EmbeddingTable(vocab_size=50, dim=4)
        state = table.init(KEY)
        ids = jnp.array([3, 7, 3])
        grads = jnp.ones((3, 4))
        new = table.apply_grads(state, ids, grads, lr=0.1)
        mask = np.ones(50, bool)
        mask[[3, 7]] = False
        np.testing.assert_allclose(np.asarray(new.table)[mask],
                                   np.asarray(state.table)[mask])
        np.testing.assert_allclose(np.asarray(new.accumulator)[mask],
                                   np.asarray(state.accumulator)[mask])

    def test_duplicate_ids_accumulate(self):
        """Duplicates must sum before the update (segment semantics)."""
        table = EmbeddingTable(vocab_size=10, dim=2,
                               initial_accumulator=0.1)
        state = table.init(KEY)
        ids = jnp.array([3, 3])
        g = jnp.array([[1.0, 0.0], [1.0, 0.0]])
        new = table.apply_grads(state, ids, g, lr=0.1)
        # row grad = [2, 0]; acc += mean([4, 0]) = 2.0
        expected_acc = 0.1 + 2.0
        np.testing.assert_allclose(np.asarray(new.accumulator)[3],
                                   expected_acc, rtol=1e-5)
        expected_row = (np.asarray(state.table)[3]
                        - 0.1 / np.sqrt(expected_acc) * np.array([2.0, 0.0]))
        np.testing.assert_allclose(np.asarray(new.table)[3], expected_row,
                                   rtol=1e-5)

    def test_valid_mask(self):
        table = EmbeddingTable(vocab_size=10, dim=2)
        state = table.init(KEY)
        ids = jnp.array([1, 2])
        g = jnp.ones((2, 2))
        mask = jnp.array([True, False])
        new = table.apply_grads(state, ids, g, lr=0.1, valid_mask=mask)
        assert not np.allclose(np.asarray(new.table)[1],
                               np.asarray(state.table)[1])
        np.testing.assert_allclose(np.asarray(new.table)[2],
                                   np.asarray(state.table)[2])

    def test_training_reduces_loss(self):
        """End-to-end: table + lookup + sparse update learns a target."""
        table = EmbeddingTable(vocab_size=20, dim=4,
                               initializer_scale=0.1)
        state = table.init(KEY)
        ids = jnp.array([0, 5, 9, 5])
        target = jax.random.normal(jax.random.PRNGKey(1), (4, 4))

        @jax.jit
        def step(state):
            emb = table.lookup(state, ids)
            loss, grad = jax.value_and_grad(
                lambda e: jnp.mean((e - target) ** 2))(emb)
            return table.apply_grads(state, ids, grad, lr=0.5), loss

        losses = []
        for _ in range(50):
            state, loss = step(state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.2
