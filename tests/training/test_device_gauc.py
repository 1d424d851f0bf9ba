"""Device-resident CORPUS GAUC (VERDICT r3 #3).

``Trainer.evaluate_device(gauc='corpus')`` must match the exact host
:class:`StreamingGAUC` — groups spanning batches included — to the
O(1/group_buckets) score-bucketing error, with only an O(G*K) final
fetch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.training.metrics import (CorpusGroupIndexer,
                                          DeviceGroupedAUC,
                                          StreamingGAUC)


class TestCorpusGroupIndexer:
    def test_dense_exact_assignment(self):
        idx = CorpusGroupIndexer(64)
        a = idx.assign(np.array([100, 7, 100, 3]))
        b = idx.assign(np.array([3, 9, 100]))
        # same raw id -> same slot, across calls (cross-batch identity)
        assert a[0] == a[2] == b[2]
        assert a[3] == b[0]
        assert len({a[0], a[1], a[3], b[1]}) == 4
        assert idx.overflowed == 0

    def test_overflow_folds_into_tail(self):
        idx = CorpusGroupIndexer(16)      # cap = 14, tail = 2
        slots = idx.assign(np.arange(30))
        assert idx.overflowed > 0
        assert slots.max() < 16
        # pre-overflow groups keep exact dense slots
        assert sorted(set(slots[:14])) == list(range(14))

    def test_hash_mode_consistent_and_process_independent(self):
        i1 = CorpusGroupIndexer(1024, use_hash=True)
        i2 = CorpusGroupIndexer(1024, use_hash=True)
        g = np.random.RandomState(0).randint(0, 10**9, 500)
        np.testing.assert_array_equal(i1.assign(g), i2.assign(g[::-1])[::-1])

    def test_hash_mode_surfaces_collisions(self):
        """Hash collisions merge groups; that degradation must be
        counted, and counted once per colliding group (review r4)."""
        idx = CorpusGroupIndexer(8, use_hash=True)   # force collisions
        g = np.arange(64)
        idx.assign(g)
        first = idx.overflowed
        assert first > 0
        idx.assign(g)          # same ids again: no double counting
        assert idx.overflowed == first

    def test_slots_above_u16_rejected(self):
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        tr = Trainer(FMModel(), fc, TrainerConfig())
        data = SyntheticCriteo(rows_per_field=512, num_users=16)
        batches = list(data.batches(16, 1))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        with pytest.raises(ValueError, match="65536"):
            tr.evaluate_device(state, batches, num_group_slots=131072)


class TestDeviceGroupedAUCMetric:
    def _corpus(self, n=6000, n_groups=400, seed=0):
        rng = np.random.RandomState(seed)
        g = rng.randint(0, n_groups, n)
        # group-dependent signal so per-group AUCs differ
        quality = rng.randn(n_groups)
        s = rng.randn(n) + 0.8 * (rng.rand(n) < 0.4) * quality[g]
        y = (rng.rand(n) < jax.nn.sigmoid(s - 0.5)).astype(np.float32)
        return g, y, s.astype(np.float32)

    @pytest.mark.parametrize("k", [256, 512])
    def test_matches_streaming_gauc(self, k):
        g, y, s = self._corpus()
        idx = CorpusGroupIndexer(1024)
        ghist = DeviceGroupedAUC.init(1024, k)
        # accumulate in 6 chunks: groups span chunks
        for lo in range(0, len(g), 1000):
            sl = slice(lo, lo + 1000)
            ghist = DeviceGroupedAUC.accumulate(
                ghist, jnp.asarray(idx.assign(g[sl])),
                jnp.asarray(y[sl]), jnp.asarray(s[sl]), k)
        dev = DeviceGroupedAUC.gauc_from_hist(np.asarray(ghist), k)
        exact = StreamingGAUC()
        exact.update(g, y, s)
        host = exact.result()
        assert dev["num_groups"] == host["num_groups"]
        assert dev["gauc"] == pytest.approx(host["gauc"], abs=2e-3)
        if k == 512:
            assert dev["gauc"] == pytest.approx(host["gauc"], abs=1e-3)

    def test_zero_weight_examples_ignored(self):
        g, y, s = self._corpus(n=500, n_groups=20, seed=1)
        k = 128
        idx = CorpusGroupIndexer(64)
        slots = jnp.asarray(idx.assign(g))
        full = DeviceGroupedAUC.accumulate(
            DeviceGroupedAUC.init(64, k), slots, jnp.asarray(y),
            jnp.asarray(s), k)
        padded = DeviceGroupedAUC.accumulate(
            full, slots, jnp.asarray(1 - y), jnp.asarray(-s), k,
            weights=jnp.zeros(len(g)))
        np.testing.assert_array_equal(np.asarray(full),
                                      np.asarray(padded))


class TestTrainerCorpusEval:
    def _setup(self, num_users=150):
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.models.fm_model import FMModel
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        tr = Trainer(FMModel(), fc, TrainerConfig())
        data = SyntheticCriteo(rows_per_field=512, num_users=num_users)
        return tr, data

    @pytest.mark.slow
    def test_corpus_gauc_matches_exact_host_eval(self):
        tr, data = self._setup()
        batches = list(data.batches(128, 10))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        # train a little so scores carry signal
        for b in batches[:4]:
            state, _ = tr.train_step(state, *tr.put(b))
        host = tr.evaluate(state, batches)
        dev = tr.evaluate_device(state, batches, window=4,
                                 num_group_slots=512, group_buckets=512)
        assert dev["gauc_mode"] == "corpus"
        assert dev["gauc_groups"] == host["num_groups"]
        assert dev["gauc"] == pytest.approx(host["gauc"], abs=2e-3)
        assert dev["auc"] == pytest.approx(host["auc"], abs=2e-3)
        assert "gauc_overflow" not in dev

    def test_inbatch_mode_still_available(self):
        tr, data = self._setup()
        batches = list(data.batches(64, 3))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        res = tr.evaluate_device(state, batches, window=3,
                                 gauc="inbatch")
        assert res["gauc_mode"] == "inbatch"
        assert 0.0 <= res["gauc"] <= 1.0

    @pytest.mark.slow
    def test_multitask_cvr_corpus_gauc(self):
        from rec_now_tpu.models import FeatureConfig, MultiTaskModel
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)
        fc = FeatureConfig(rows_per_field=512, embedding_dim=4)
        tr = Trainer(MultiTaskModel(num_task=2, mmoe_dims=(8,),
                                    ple_dims=(8,), tower_dim=4),
                     fc, TrainerConfig(num_tasks=2))
        data = SyntheticCriteo(rows_per_field=512, num_users=80)
        batches = list(data.batches(128, 6))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        host = tr.evaluate(state, batches)
        dev = tr.evaluate_device(state, batches, window=3,
                                 num_group_slots=256, group_buckets=512)
        assert dev["cvr_gauc"] == pytest.approx(host["cvr_gauc"],
                                                abs=2e-3)
        assert dev["cvr_auc"] == pytest.approx(host["cvr_auc"],
                                               abs=2e-3)

    def test_overflow_surfaced(self):
        tr, data = self._setup(num_users=300)
        batches = list(data.batches(128, 3))
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        res = tr.evaluate_device(state, batches, window=3,
                                 num_group_slots=64, group_buckets=64)
        assert res.get("gauc_overflow", 0) > 0
