"""Multi-host packed scan-window assembly (VERDICT r3 #1).

The production inner loop (compressed wire + on-device lax.scan) and
the device-resident eval must run on a pod slice.  The enabler is that
EVERY PackedBatch field is batch-sharded — the u8 dense affine is
computed per batch shard (``WireFormat(num_shards=...)``) instead of
per window — so ``jax.make_array_from_process_local_data`` can stitch
per-process local windows into the global arrays.

Real multi-process execution cannot run in the single-host container;
the contract is pinned three ways:
  * single-process ``put_packed_window_local`` is bit-identical to
    ``put_packed_window`` (f16 and u8);
  * a mocked 4-process topology checks the exact local-shape /
    sharding-spec / group-offset contract handed to
    ``make_array_from_process_local_data``;
  * training through the local path matches training through the
    plain path bit-for-bit (the 8-device mesh exercises the sharded
    decode + per-shard affine end to end).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rec_now_tpu.models import FeatureConfig
from rec_now_tpu.models.fm_model import FMModel
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig
from rec_now_tpu.training.wire import PackedBatch, WireFormat


def _trainer(dense_mode="f16", **cfg_kw):
    fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
    cfg = TrainerConfig(pairwise_weight=0.3,
                        wire_dense_mode=dense_mode, **cfg_kw)
    return Trainer(FMModel(), fc, cfg)


class TestPerShardAffine:
    def test_u8_scale_is_per_shard(self):
        data = SyntheticCriteo(rows_per_field=512, num_users=100)
        b = data.sample(64, np.random.RandomState(0))
        wf = WireFormat(26, 512, dense_mode="u8", num_shards=4)
        packed = wf.pack(b)
        assert packed.dense_scale.shape == (4, 2, 13)
        # per-shard lo must equal each contiguous 16-row chunk's min
        chunk_lo = b.dense.reshape(4, 16, 13).min(axis=1)
        np.testing.assert_allclose(packed.dense_scale[:, 0, :],
                                   chunk_lo, rtol=1e-6)

    def test_u8_decode_roundtrip_sharded(self):
        data = SyntheticCriteo(rows_per_field=512, num_users=100)
        b = data.sample(64, np.random.RandomState(1))
        for shards in (1, 2, 8):
            wf = WireFormat(26, 512, dense_mode="u8", num_shards=shards)
            packed = wf.pack(b)
            dense = np.asarray(wf.decode(
                jax.tree_util.tree_map(jnp.asarray, packed))[0])
            # per-shard quantization step bounds the error per chunk
            chunks = b.dense.reshape(shards, 64 // shards, 13)
            span = (chunks.max(axis=1) - chunks.min(axis=1))  # (s, 13)
            atol = span.max() / 255 * 0.51 + 1e-6
            np.testing.assert_allclose(dense, b.dense, atol=atol)

    def test_sharded_tighter_than_whole_batch(self):
        """Per-shard ranges can only shrink -> error never grows."""
        rng = np.random.RandomState(2)
        data = SyntheticCriteo(rows_per_field=512, num_users=100)
        b = data.sample(128, rng)
        def err(shards):
            wf = WireFormat(26, 512, dense_mode="u8",
                            num_shards=shards)
            d = np.asarray(wf.decode(jax.tree_util.tree_map(
                jnp.asarray, wf.pack(b)))[0])
            return np.abs(d - b.dense).max()
        assert err(8) <= err(1) + 1e-6

    def test_batch_not_divisible_raises(self):
        data = SyntheticCriteo(rows_per_field=512, num_users=16)
        b = data.sample(10, np.random.RandomState(0))
        wf = WireFormat(26, 512, dense_mode="u8", num_shards=4)
        with pytest.raises(ValueError):
            wf.pack(b)


class TestPutPackedLocal:
    @pytest.mark.parametrize("mode", ["f16", "u8"])
    def test_single_process_bit_identical(self, mode):
        tr = _trainer(mode)
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        window = list(data.batches(16, 3))
        a = tr.put_packed_window(window)
        b = tr.put_packed_window_local(window)
        for name, x, y in zip(PackedBatch._fields, a, b):
            assert x.shape == y.shape and x.dtype == y.dtype, name
            assert x.sharding.is_equivalent_to(y.sharding, x.ndim), name
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)

    def test_mocked_multiprocess_assembly(self, monkeypatch):
        """4-process contract: local shapes, specs, group offsets."""
        tr = _trainer("u8")
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        window = list(data.batches(16, 2))     # local batch 16
        seen = {}

        def fake_make(sharding, local, global_shape=None):
            seen.setdefault("calls", []).append(
                (np.asarray(local).shape, sharding.spec))
            # emulate the 4-process assembly: global axis-1 = 4 x local
            return np.concatenate([np.asarray(local)] * 4, axis=1)

        monkeypatch.setattr(jax, "make_array_from_process_local_data",
                            fake_make)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 3)
        packed = tr.wire.pack_window(window, num_shards=2)
        out = tr.put_packed_window_local(window)
        # every field went through the local-assembly API with the
        # batch-axis-1 spec
        assert len(seen["calls"]) == len(PackedBatch._fields)
        for (shape, spec), name, ref in zip(seen["calls"],
                                            PackedBatch._fields, packed):
            want = P(*([None, "data"] + [None] * (len(shape) - 2)))
            assert spec == want, name
            assert shape == ref.shape, name
        # local pack used local shard count: 8 devices / 4 processes
        assert packed.dense_scale.shape == (2, 2, 2, 13)
        # group ids offset by process_index * local_batch = 48
        g = np.asarray(out.group_ids)
        assert g.min() >= 48 and g.max() < 64

    def test_mocked_global_batch_bound(self, monkeypatch):
        tr = _trainer()
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        window = list(data.batches(16, 1))
        monkeypatch.setattr(jax, "process_count", lambda: 8192)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        with pytest.raises(ValueError, match="65536"):
            tr.put_packed_window_local(window)


class TestTrainThroughLocalPath:
    @pytest.mark.parametrize("mode", ["f16", "u8"])
    def test_train_many_packed_matches(self, mode):
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        window = list(data.batches(16, 3))

        def run(putter_name):
            tr = _trainer(mode)
            state = tr.init(jax.random.PRNGKey(0), window[0])
            dev = getattr(tr, putter_name)(window)
            state, mseq = tr.train_many_packed(state, dev)
            return (np.asarray(state.table.table),
                    np.asarray(mseq["loss"]))
        t1, l1 = run("put_packed_window")
        t2, l2 = run("put_packed_window_local")
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(t1, t2)


class TestEvalDeviceRaggedTail:
    def test_one_program_for_ragged_sweep(self):
        """A sweep whose length isn't a multiple of the window must not
        recompile (padded tail), and padding must not change results."""
        tr = _trainer()
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        batches = list(data.batches(16, 5))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        small = dict(num_buckets=256, num_group_slots=128,
                     group_buckets=64)
        # 5 batches, window 2 -> one padded step
        res_ragged = tr.evaluate_device(state, batches, window=2,
                                        **small)
        # the padded sweep must equal the exact-multiple sweep over the
        # same real batches (window 5 -> no padding)
        res_full = tr.evaluate_device(state, batches, window=5,
                                      **small)
        assert res_ragged["num_pos"] == res_full["num_pos"]
        assert res_ragged["num_neg"] == res_full["num_neg"]
        np.testing.assert_allclose(res_ragged["auc"], res_full["auc"],
                                   rtol=1e-6)
        np.testing.assert_allclose(res_ragged["gauc"], res_full["gauc"],
                                   rtol=1e-6)
        # shape-stability: all windows share one (window, batch) shape
        lowered = tr._eval_many_packed
        # N.B. jit caches by shape; a second ragged sweep of different
        # length reuses the same executable (no new trace)
        before = lowered._cache_size()
        tr.evaluate_device(state, list(data.batches(16, 3)), window=2,
                           **small)
        assert lowered._cache_size() == before
