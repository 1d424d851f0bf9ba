"""Routed (dedup + all_to_all) exchange == allgather exchange, exactly.

The routed path is the TPU rendering of the reference's
unique-before-lookup idiom (rec_now/rec_block/embedding_util.py:306-311);
these tests pin its end-to-end equivalence to the allgather path on the
8-virtual-device mesh for lookup and every update flavor.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.embedding import ShardedEmbeddingTable
from rec_now_tpu.parallel import make_mesh

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _pair(mesh, **kw):
    a = ShardedEmbeddingTable(vocab_size=1024, dim=8, mesh=mesh,
                              route_mode="allgather", **kw)
    r = ShardedEmbeddingTable(vocab_size=1024, dim=8, mesh=mesh,
                              route_mode="routed", **kw)
    return a, r


def _ids(shape=(64, 13), hi=1000):
    return jnp.asarray(RNG.integers(0, hi, size=shape).astype(np.int32))


def _grads(ids, dim=8):
    # dyadic-rational grads: both paths sum the same values in different
    # orders, and sums of small multiples of 2^-8 are exact in f32
    g = RNG.integers(-64, 64, size=ids.shape + (dim,)) / 256.0
    return jnp.asarray(g.astype(np.float32))


class TestRoutedLookup:
    def test_matches_allgather_exactly(self, mesh):
        ta, tr = _pair(mesh)
        state = ta.init(KEY)
        ids = _ids()
        a = ta.lookup(state, ids)
        r = tr.lookup(state, ids)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))

    @pytest.mark.slow
    def test_duplicate_heavy_batch(self, mesh):
        ta, tr = _pair(mesh)
        state = ta.init(KEY)
        ids = _ids(hi=17)                       # massive duplication
        np.testing.assert_array_equal(np.asarray(ta.lookup(state, ids)),
                                      np.asarray(tr.lookup(state, ids)))

    @pytest.mark.slow
    def test_overflow_lane(self, mesh):
        # skew every id onto shard 0 (multiples of 8) with a cap too
        # small for the uniques -> the overflow all-gather lane carries
        # the spill; result must still be exact
        tr = ShardedEmbeddingTable(vocab_size=1024, dim=8, mesh=mesh,
                                   route_mode="routed",
                                   route_cap_factor=0.1, route_ov_cap=128)
        ta = ShardedEmbeddingTable(vocab_size=1024, dim=8, mesh=mesh,
                                   route_mode="allgather")
        state = ta.init(KEY)
        ids = jnp.asarray(
            (RNG.integers(0, 120, size=(64, 4)) * 8).astype(np.int32))
        np.testing.assert_array_equal(np.asarray(ta.lookup(state, ids)),
                                      np.asarray(tr.lookup(state, ids)))

    def test_auto_resolution(self, mesh):
        assert ShardedEmbeddingTable(1024, 8, mesh).route_mode == "routed"
        one = make_mesh(1)
        assert ShardedEmbeddingTable(1024, 8, one).route_mode == "allgather"
        assert ShardedEmbeddingTable(
            1024, 8, one, route_mode="routed").route_mode == "allgather"


class TestRoutedUpdates:
    def _assert_update_equal(self, ta, tr, atol=0.0):
        state_a = ta.init(KEY)
        state_r = tr.init(KEY)
        for leaf_a, leaf_r in zip(jax.tree.leaves(state_a),
                                  jax.tree.leaves(state_r)):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_r))
        ids = _ids()
        g = _grads(ids)
        new_a = ta.apply_grads(state_a, ids, g, lr=0.05)
        new_r = tr.apply_grads(state_r, ids, g, lr=0.05)
        np.testing.assert_allclose(np.asarray(new_a.table),
                                   np.asarray(new_r.table), atol=atol)
        np.testing.assert_allclose(np.asarray(new_a.accumulator),
                                   np.asarray(new_r.accumulator), atol=atol)
        if new_a.m is not None:
            np.testing.assert_allclose(np.asarray(new_a.m),
                                       np.asarray(new_r.m), atol=atol)
            np.testing.assert_allclose(np.asarray(new_a.v),
                                       np.asarray(new_r.v), atol=atol)

    def test_adagrad_sparse(self, mesh):
        self._assert_update_equal(
            *_pair(mesh, optimizer="adagrad", update_mode="sparse"))

    @pytest.mark.slow
    def test_adagrad_dense(self, mesh):
        self._assert_update_equal(
            *_pair(mesh, optimizer="adagrad", update_mode="dense"))

    @pytest.mark.slow
    def test_adam_sparse(self, mesh):
        self._assert_update_equal(
            *_pair(mesh, optimizer="adam", update_mode="sparse"),
            atol=1e-7)

    @pytest.mark.slow
    def test_adam_dense(self, mesh):
        self._assert_update_equal(
            *_pair(mesh, optimizer="adam", update_mode="dense"),
            atol=1e-7)

    def test_per_occurrence_falls_back_to_allgather(self, mesh):
        # dedup=False (per-occurrence Adagrad) cannot pre-sum at the
        # source; the routed table must still produce per-occurrence
        # semantics (identical to the allgather table's dedup=False)
        ta, tr = _pair(mesh, optimizer="adagrad", update_mode="sparse")
        state = ta.init(KEY)
        ids = jnp.asarray(np.full((8, 2), 5, np.int32))   # one hot row
        g = _grads(ids)
        a = ta.apply_grads(state, ids, g, lr=0.05, dedup=False)
        r = tr.apply_grads(state, ids, g, lr=0.05, dedup=False)
        np.testing.assert_array_equal(np.asarray(a.table),
                                      np.asarray(r.table))
        np.testing.assert_array_equal(np.asarray(a.accumulator),
                                      np.asarray(r.accumulator))


class TestDroppedCounter:
    """Routed double-overflow drops are OBSERVABLE (exchange.py:20-24).

    Adversarial skew = every id owned by one shard: per-owner buckets
    overflow cap AND the spill overflows ov_cap, so ids drop — and the
    counter must say so.  Uniformly-hashed ids (the bench path) must
    report zero.
    """

    def _skewed_ids(self, n=8, per_shard=64):
        # all ids multiples of n -> all owned by shard 0; unique within
        # each shard so dedup cannot save the buckets
        base = np.arange(8 * per_shard, dtype=np.int32) * n
        return jnp.asarray(base)

    def test_skewed_ids_report_drops(self, mesh):
        tr = ShardedEmbeddingTable(
            vocab_size=8192, dim=8, mesh=mesh, route_mode="routed",
            route_cap_factor=0.25, route_ov_cap=8)
        state = tr.init(KEY)
        ids = self._skewed_ids()
        out, dropped = tr.lookup(state, ids, return_dropped=True)
        assert int(dropped) > 0
        # non-dropped ids still read their true rows; dropped read zero
        expect = np.asarray(tr.debug_read(state.table, ids))
        got = np.asarray(out)
        is_zero = (got == 0).all(axis=1)
        np.testing.assert_array_equal(got[~is_zero], expect[~is_zero])
        assert int(is_zero.sum()) == int(dropped), \
            "zero rows must equal the dropped count (init is nonzero)"

    def test_allgather_immune_to_skew(self, mesh):
        ta = ShardedEmbeddingTable(vocab_size=8192, dim=8, mesh=mesh,
                                   route_mode="allgather")
        state = ta.init(KEY)
        ids = self._skewed_ids()
        out, dropped = ta.lookup(state, ids, return_dropped=True)
        assert int(dropped) == 0
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(ta.debug_read(state.table, ids)))

    def test_uniform_ids_zero_drops(self, mesh):
        _, tr = _pair(mesh)
        state = tr.init(KEY)
        out, dropped = tr.lookup(state, _ids(), return_dropped=True)
        assert int(dropped) == 0
