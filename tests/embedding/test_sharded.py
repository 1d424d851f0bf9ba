"""Tests for the mesh-sharded embedding table (8 virtual CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.embedding import ShardedEmbeddingTable, EmbeddingTable
from rec_now_tpu.parallel import make_mesh

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


class TestShardedLookup:
    def test_matches_debug_read(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        state = table.init(KEY)
        ids = jnp.arange(16, dtype=jnp.int32) * 3 % 64
        emb = table.lookup(state, ids)
        np.testing.assert_allclose(np.asarray(emb),
                                   table.debug_read(state.table, ids),
                                   rtol=1e-6)

    def test_2d_ids(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        state = table.init(KEY)
        ids = jnp.arange(32, dtype=jnp.int32).reshape(8, 4)
        emb = table.lookup(state, ids)
        assert emb.shape == (8, 4, 4)
        np.testing.assert_allclose(
            np.asarray(emb).reshape(32, 4),
            table.debug_read(state.table, np.asarray(ids).reshape(-1)),
            rtol=1e-6)

    def test_vocab_rounded_to_granule(self, mesh):
        # 8 shards x pack 32 (dim 4) = granule 256
        table = ShardedEmbeddingTable(vocab_size=61, dim=4, mesh=mesh)
        assert table.vocab_size % (8 * table.pack) == 0

    def test_pack_factor(self, mesh):
        assert ShardedEmbeddingTable(vocab_size=256, dim=16,
                                     mesh=mesh).pack == 8
        assert ShardedEmbeddingTable(vocab_size=256, dim=128,
                                     mesh=mesh).pack == 1
        assert ShardedEmbeddingTable(vocab_size=256, dim=72,
                                     mesh=mesh).pack == 1

    def test_lookup_under_jit(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        state = table.init(KEY)
        ids = jnp.arange(16, dtype=jnp.int32)
        f = jax.jit(lambda s, i: table.lookup(s, i))
        np.testing.assert_allclose(np.asarray(f(state, ids)),
                                   table.debug_read(state.table, ids),
                                   rtol=1e-6)

    def test_non_divisible_query(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        state = table.init(KEY)
        ids = jnp.array([7, 8], jnp.int32)   # 2 ids, 8 shards
        emb = table.lookup(state, ids)
        np.testing.assert_allclose(np.asarray(emb),
                                   table.debug_read(state.table, ids),
                                   rtol=1e-6)


class TestShardedUpdate:
    def test_matches_single_chip_semantics(self, mesh):
        """Sharded Adagrad == single-chip Adagrad on the same data."""
        vocab, dim = 64, 4
        sh = ShardedEmbeddingTable(vocab_size=vocab, dim=dim, mesh=mesh)
        st_sh = sh.init(KEY)
        vocab = sh.vocab_size  # rounded
        single = EmbeddingTable(vocab_size=vocab, dim=dim)
        from rec_now_tpu.embedding.table import EmbeddingTableState
        all_ids = np.arange(vocab)
        st_si = EmbeddingTableState(
            table=jnp.asarray(sh.debug_read(st_sh.table, all_ids)),
            accumulator=jnp.asarray(
                sh.debug_read(st_sh.accumulator, all_ids)))

        ids = jnp.array([1, 5, 1, 8, 63, 5, 5, 2], jnp.int32)
        grads = jax.random.normal(jax.random.PRNGKey(2), (8, dim))

        new_sh = sh.apply_grads(st_sh, ids, grads, lr=0.1)
        new_si = single.apply_grads(st_si, ids, grads, lr=0.1)
        np.testing.assert_allclose(
            sh.debug_read(new_sh.table, all_ids),
            np.asarray(new_si.table), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            sh.debug_read(new_sh.accumulator, all_ids),
            np.asarray(new_si.accumulator), rtol=1e-5, atol=1e-6)

    def test_training_reduces_loss(self, mesh):
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
            return table.apply_grads(state, ids, grad, lr=0.5), loss

        losses = []
        for _ in range(40):
            state, loss = step(state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.2

    def test_state_shardings(self, mesh):
        table = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        state = table.init(KEY)
        spec = state.table.sharding.spec
        assert len(spec) >= 1 and spec[0] == "data", spec

    @pytest.mark.parametrize("optimizer", ["adagrad", "adam"])
    @pytest.mark.slow
    def test_dense_matches_sparse(self, mesh, optimizer):
        """update_mode='dense' == 'sparse' exactly (same dedup math)."""
        kw = dict(vocab_size=128, dim=4, mesh=mesh, optimizer=optimizer)
        sp = ShardedEmbeddingTable(update_mode="sparse", **kw)
        de = ShardedEmbeddingTable(update_mode="dense", **kw)
        assert sp.update_mode == "sparse" and de.update_mode == "dense"
        st_sp = sp.init(KEY)
        st_de = de.init(KEY)
        ids = jnp.array([[1, 5, 1, 8], [63, 5, 5, 2], [127, 0, 0, 1]],
                        jnp.int32)
        rng = jax.random.PRNGKey(3)
        for step in range(3):
            rng, k = jax.random.split(rng)
            grads = jax.random.normal(k, ids.shape + (4,))
            st_sp = sp.apply_grads(st_sp, ids, grads, lr=0.1)
            st_de = de.apply_grads(st_de, ids, grads, lr=0.1)
        all_ids = np.arange(sp.vocab_size)
        np.testing.assert_allclose(
            sp.debug_read(st_sp.table, all_ids),
            de.debug_read(st_de.table, all_ids), rtol=1e-5, atol=1e-6)
        if optimizer == "adam":
            np.testing.assert_allclose(
                sp.debug_read(st_sp.m, all_ids),
                de.debug_read(st_de.m, all_ids), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                sp.debug_read(st_sp.v, all_ids),
                de.debug_read(st_de.v, all_ids), rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_allclose(
                sp.debug_read(st_sp.accumulator, all_ids),
                de.debug_read(st_de.accumulator, all_ids),
                rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_dense_valid_mask(self, mesh):
        """Masked entries are no-ops in dense mode, like sparse mode."""
        kw = dict(vocab_size=64, dim=4, mesh=mesh)
        sp = ShardedEmbeddingTable(update_mode="sparse", **kw)
        de = ShardedEmbeddingTable(update_mode="dense", **kw)
        st_sp, st_de = sp.init(KEY), de.init(KEY)
        ids = jnp.array([3, 9, 3, 40], jnp.int32)
        mask = jnp.array([True, False, True, True])
        grads = jax.random.normal(jax.random.PRNGKey(4), (4, 4))
        st_sp = sp.apply_grads(st_sp, ids, grads, lr=0.1, valid_mask=mask)
        st_de = de.apply_grads(st_de, ids, grads, lr=0.1, valid_mask=mask)
        all_ids = np.arange(sp.vocab_size)
        np.testing.assert_allclose(
            sp.debug_read(st_sp.table, all_ids),
            de.debug_read(st_de.table, all_ids), rtol=1e-5, atol=1e-6)
        # masked id 9 must be untouched
        np.testing.assert_allclose(
            de.debug_read(st_de.table, np.array([9])),
            de.debug_read(de.init(KEY).table, np.array([9])))

    def test_auto_mode_thresholds(self, mesh):
        small = ShardedEmbeddingTable(vocab_size=64, dim=4, mesh=mesh)
        assert small.update_mode == "dense"
        big = ShardedEmbeddingTable(vocab_size=2 ** 31, dim=16, mesh=mesh)
        assert big.update_mode == "sparse"

    @pytest.mark.slow
    def test_packed_dim16(self, mesh):
        """dim=16 -> pack 8: lookup/update round-trip stays exact."""
        table = ShardedEmbeddingTable(vocab_size=1024, dim=16, mesh=mesh)
        assert table.pack == 8
        state = table.init(KEY)
        ids = jnp.array([0, 1, 7, 8, 9, 511, 512, 1023], jnp.int32)
        emb = table.lookup(state, ids)
        np.testing.assert_allclose(np.asarray(emb),
                                   table.debug_read(state.table, ids),
                                   rtol=1e-6)
        grads = jnp.ones((8, 16))
        new = table.apply_grads(state, ids, grads, lr=0.1)
        # ids 0,1,7 share a pack line on shards 0,1,7... verify only the
        # touched logical rows moved
        moved = table.debug_read(new.table, ids)
        before = table.debug_read(state.table, ids)
        assert np.all(np.abs(moved - before) > 0)
        untouched = jnp.array([2, 3, 100, 513], jnp.int32)
        np.testing.assert_allclose(
            table.debug_read(new.table, untouched),
            table.debug_read(state.table, untouched))
