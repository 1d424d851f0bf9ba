"""hot8 id wire codec: LOSSLESS round trip + adaptivity contracts."""
import numpy as np
import pytest

import jax.numpy as jnp

from rec_now_tpu.training.data import Batch, SyntheticCriteo
from rec_now_tpu.training.wire import WireFormat


def _mk_batches(n, b=64, rows=512, seed=0):
    data = SyntheticCriteo(rows_per_field=rows, num_users=32, seed=seed)
    rng = np.random.RandomState(seed + 1)
    return [data.sample(b, rng) for _ in range(n)]


def _roundtrip_ids(wire, batches):
    packed = wire.pack_window(batches)
    decoded = wire.decode(
        type(packed)(*[jnp.asarray(x) for x in packed]))
    return np.asarray(decoded[1])          # ids


class TestHot8:
    def test_lossless_roundtrip_zipf(self):
        wire = WireFormat(26, 512, id_mode="hot8")
        batches = _mk_batches(3)
        ids = _roundtrip_ids(wire, batches)
        ref = np.stack([b.sparse_ids for b in batches])
        np.testing.assert_array_equal(ids, ref)

    def test_lossless_with_shards(self):
        wire = WireFormat(26, 512, id_mode="hot8", num_shards=4)
        batches = _mk_batches(2, seed=3)
        ids = _roundtrip_ids(wire, batches)
        ref = np.stack([b.sparse_ids for b in batches])
        np.testing.assert_array_equal(ids, ref)

    def test_lossless_after_distribution_shift(self):
        """A drifted window overflowing the cap relearns the table and
        stays exact (hot_version bumps so consumers re-trace)."""
        wire = WireFormat(8, 4096, id_mode="hot8", esc_cap_frac=0.3)
        rng = np.random.RandomState(0)

        def mk(idspace):
            ids = rng.choice(idspace, size=(64, 8)).astype(np.int32)
            return Batch(dense=rng.randn(64, 13).astype(np.float32),
                         sparse_ids=ids,
                         labels=np.zeros(64, np.float32),
                         group_ids=np.zeros(64, np.int32),
                         cvr_labels=np.zeros(64, np.float32),
                         domain_idx=np.zeros(64, np.int32))

        hot_space = np.arange(32)            # 8 fields x top covers all
        w1 = [mk(hot_space) for _ in range(2)]
        ids1 = _roundtrip_ids(wire, w1)
        np.testing.assert_array_equal(
            ids1, np.stack([b.sparse_ids for b in w1]))
        v1 = wire.hot_version
        # totally different id space: old table covers nothing
        w2 = [mk(np.arange(2048, 4096)) for _ in range(2)]
        ids2 = _roundtrip_ids(wire, w2)
        np.testing.assert_array_equal(
            ids2, np.stack([b.sparse_ids for b in w2]))
        assert wire.hot_version > v1         # relearned

    def test_flat_distribution_raises(self):
        """Near-uniform ids overflow even a self-learned table."""
        b = 4096   # >> 255 distinct ids/field even self-learned
        wire = WireFormat(8, 1 << 20, id_mode="hot8",
                          esc_cap_frac=0.05)
        rng = np.random.RandomState(1)
        batch = Batch(dense=rng.randn(b, 13).astype(np.float32),
                      sparse_ids=rng.randint(0, 1 << 20, (b, 8)
                                             ).astype(np.int32),
                      labels=np.zeros(b, np.float32),
                      group_ids=np.zeros(b, np.int32),
                      cvr_labels=np.zeros(b, np.float32),
                      domain_idx=np.zeros(b, np.int32))
        with pytest.raises(ValueError, match="esc_cap_frac"):
            wire.pack_window([batch])

    def test_wire_cost_reports_hot8(self):
        packed_b, _ = WireFormat.wire_cost(13, 26, 100_000,
                                           dense_mode="u8",
                                           id_mode="hot8")
        packed_w, _ = WireFormat.wire_cost(13, 26, 100_000,
                                           dense_mode="u8")
        assert packed_b < packed_w          # 62 vs 72 at the defaults

    def test_rows_over_2_24_rejected(self):
        with pytest.raises(ValueError, match="2\\^24"):
            WireFormat(26, 1 << 25, id_mode="hot8")


class TestHot8Trainer:
    def test_train_many_packed_matches_packed_mode(self):
        """End-to-end: hot8 window training == packed-mode training
        bit-for-bit (the codec is lossless; everything downstream is
        identical)."""
        import jax
        from rec_now_tpu.models import DCNv2Model, FeatureConfig
        from rec_now_tpu.parallel.mesh import make_mesh
        from rec_now_tpu.training import Trainer, TrainerConfig
        fc = FeatureConfig(rows_per_field=512, embedding_dim=8)
        batches = _mk_batches(4, b=32, rows=512, seed=7)
        mesh = make_mesh(min(4, len(jax.devices())))

        def run(id_mode):
            cfg = TrainerConfig(pointwise_weight=1.0,
                                pairwise_weight=0.5,
                                wire_id_mode=id_mode)
            tr = Trainer(DCNv2Model(deep_dims=(16,), dcn_sub_dim=4),
                         fc, cfg, mesh=mesh)
            state = tr.init(jax.random.PRNGKey(0), batches[0])
            state, mseq = tr.train_many_packed(
                state, tr.put_packed_window(batches))
            return np.asarray(jax.device_get(mseq["loss"]))

        np.testing.assert_array_equal(run("hot8"), run("packed"))
