"""Tests for the compressed wire format (training/wire.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.training.data import Batch, SyntheticCriteo
from rec_now_tpu.training.wire import (WireFormat, id_bits, num_words,
                                       pack_ids, unpack_ids)


class TestPackIds:
    @pytest.mark.parametrize("bits", [1, 7, 16, 17, 20, 31, 32])
    def test_roundtrip_exact(self, bits):
        rng = np.random.RandomState(bits)
        hi = min(1 << bits, 1 << 31)
        ids = rng.randint(0, hi, size=(64, 26)).astype(np.int64)
        words = pack_ids(ids, bits)
        assert words.dtype == np.uint32
        assert words.shape == (64, num_words(26, bits))
        out = np.asarray(unpack_ids(jnp.asarray(words), 26, bits))
        np.testing.assert_array_equal(out, ids.astype(np.int32))

    def test_roundtrip_leading_axes(self):
        rng = np.random.RandomState(0)
        ids = rng.randint(0, 100_000, size=(3, 8, 26))
        bits = id_bits(100_000)
        assert bits == 17
        out = np.asarray(unpack_ids(jnp.asarray(pack_ids(ids, bits)),
                                    26, bits))
        np.testing.assert_array_equal(out, ids)

    def test_id_bits(self):
        assert id_bits(2) == 1
        assert id_bits(100_000) == 17
        assert id_bits(1 << 20) == 20
        assert id_bits(10 ** 9) == 30


class TestWireFormat:
    def test_wire_cost_standard_layout(self):
        packed, raw = WireFormat.wire_cost(13, 26, 100_000)
        assert raw == 172
        # 13*2 dense + 14 words*4 ids + 2 group (u16 remap) + 1 flags
        assert packed == 26 + 56 + 2 + 1
        assert packed < raw * 0.5
        packed_u8, _ = WireFormat.wire_cost(13, 26, 100_000,
                                            dense_mode="u8")
        assert packed_u8 == 13 + 56 + 2 + 1

    @staticmethod
    def _same_partition(a, b):
        """Group vectors induce identical within-batch partitions."""
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.array_equal(
            a[:, None] == a[None, :], b[:, None] == b[None, :])

    def test_pack_decode_batch(self):
        data = SyntheticCriteo(rows_per_field=1000, num_users=200)
        b = data.sample(128, np.random.RandomState(0))
        wf = WireFormat(26, 1000)
        packed = wf.pack(b)
        assert packed.group_ids.dtype == np.uint16
        dense, ids, labels, groups, cvr, domain = wf.decode(
            jax.tree_util.tree_map(jnp.asarray, packed))
        np.testing.assert_array_equal(np.asarray(ids), b.sparse_ids)
        np.testing.assert_array_equal(np.asarray(labels), b.labels)
        # groups are remapped per batch (bijectively) to fit uint16:
        # the equality structure — all the training step consumes —
        # must be preserved exactly
        assert self._same_partition(groups, b.group_ids)
        np.testing.assert_array_equal(np.asarray(cvr), b.cvr_labels)
        np.testing.assert_array_equal(np.asarray(domain), b.domain_idx)
        np.testing.assert_allclose(np.asarray(dense), b.dense,
                                   rtol=1e-3, atol=1e-3)

    def test_pack_decode_u8_dense(self):
        data = SyntheticCriteo(rows_per_field=1000, num_users=200)
        b = data.sample(128, np.random.RandomState(0))
        wf = WireFormat(26, 1000, dense_mode="u8")
        packed = wf.pack(b)
        assert packed.dense.dtype == np.uint8
        dense, ids, labels, groups, cvr, domain = wf.decode(
            jax.tree_util.tree_map(jnp.asarray, packed))
        span = b.dense.max(0) - b.dense.min(0)
        np.testing.assert_allclose(
            np.asarray(dense), b.dense,
            atol=float(span.max()) / 255 * 0.51 + 1e-6)
        np.testing.assert_array_equal(np.asarray(ids), b.sparse_ids)

    def test_pack_window_stacks(self):
        data = SyntheticCriteo(rows_per_field=1000, num_users=200)
        bs = list(data.batches(32, 3))
        wf = WireFormat(26, 1000)
        pw = wf.pack_window(bs)
        assert pw.id_words.shape[:2] == (3, 32)
        ids = np.asarray(unpack_ids(jnp.asarray(pw.id_words), 26,
                                    wf.bits))
        np.testing.assert_array_equal(ids[1], bs[1].sparse_ids)
        # per-batch group remap: each window row keeps its partition
        assert self._same_partition(pw.group_ids[1], bs[1].group_ids)

    def test_flags_domain_bound(self):
        wf = WireFormat(4, 16)
        data = SyntheticCriteo(num_sparse=4, rows_per_field=16,
                               num_users=8)
        b = data.sample(8, np.random.RandomState(0))
        bad = b._replace(domain_idx=np.full(8, 64, np.int32))
        with pytest.raises(ValueError):
            wf.pack(bad)


class TestPackedTraining:
    @pytest.mark.slow
    def test_packed_matches_unpacked(self):
        """train_many == train_pipelined up to f16 dense rounding."""
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import (Trainer, TrainerConfig)

        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        data = SyntheticCriteo(rows_per_field=512, num_users=64)
        raw = list(data.batches(64, 4))
        # make dense exactly f16-representable so the paths match
        # bit-for-bit
        batches = [b._replace(
            dense=b.dense.astype(np.float16).astype(np.float32))
            for b in raw]

        def run(mode):
            tr = Trainer(FMModel(), fc,
                         TrainerConfig(pairwise_weight=0.3,
                                       listwise_weight=0.2))
            state = tr.init(jax.random.PRNGKey(0), batches[0])
            if mode == "packed":
                state, mseq = tr.train_pipelined(state, batches,
                                                 window=2)
            else:
                state, mseq = tr.train_many(state, batches)
            return state, {k: np.asarray(v) for k, v in mseq.items()}

        s1, m1 = run("raw")
        s2, m2 = run("packed")
        # packed path reports the LAST window; compare its steps
        np.testing.assert_allclose(m1["loss"][-2:], m2["loss"],
                                   rtol=1e-6)
        t1 = np.asarray(s1.table.table)
        t2 = np.asarray(s2.table.table)
        np.testing.assert_allclose(t1, t2, rtol=1e-6, atol=1e-7)

    @pytest.mark.slow
    def test_pipelined_step_count(self):
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import Trainer, TrainerConfig

        fc = FeatureConfig(rows_per_field=256, embedding_dim=4)
        data = SyntheticCriteo(rows_per_field=256, num_users=32)
        batches = list(data.batches(32, 6))
        tr = Trainer(FMModel(), fc, TrainerConfig())
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        state, _ = tr.train_pipelined(state, batches, window=3)
        assert int(state.step) == 6
