"""Tests for AUC / GAUC metrics."""
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.training.metrics import (binary_auc, batch_gauc,
                                          StreamingGAUC)


def naive_auc(labels, scores):
    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return 0.5
    wins = (pos[:, None] > neg[None, :]).sum() \
        + 0.5 * (pos[:, None] == neg[None, :]).sum()
    return wins / (len(pos) * len(neg))


class TestBinaryAUC:
    def test_perfect(self):
        labels = jnp.array([0.0, 0, 1, 1])
        scores = jnp.array([0.1, 0.2, 0.8, 0.9])
        assert float(binary_auc(labels, scores)) == pytest.approx(1.0)

    def test_random_matches_naive(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            labels = (rng.rand(64) > 0.5).astype(np.float32)
            scores = rng.randn(64).astype(np.float32)
            got = float(binary_auc(jnp.array(labels), jnp.array(scores)))
            assert got == pytest.approx(naive_auc(labels, scores),
                                        abs=1e-5), trial

    def test_ties(self):
        labels = np.array([0, 1, 0, 1], np.float32)
        scores = np.array([0.5, 0.5, 0.2, 0.8], np.float32)
        got = float(binary_auc(jnp.array(labels), jnp.array(scores)))
        assert got == pytest.approx(naive_auc(labels, scores), abs=1e-6)

    def test_all_tied(self):
        labels = np.array([0, 1, 0, 1], np.float32)
        scores = np.zeros(4, np.float32)
        got = float(binary_auc(jnp.array(labels), jnp.array(scores)))
        assert got == pytest.approx(0.5, abs=1e-6)

    def test_degenerate(self):
        assert float(binary_auc(jnp.ones(4), jnp.arange(4.0))) == 0.5
        assert float(binary_auc(jnp.zeros(4), jnp.arange(4.0))) == 0.5

    def test_jit(self):
        import jax
        f = jax.jit(binary_auc)
        labels = jnp.array([0.0, 1, 0, 1])
        scores = jnp.array([0.3, 0.6, 0.1, 0.2])
        assert float(f(labels, scores)) == pytest.approx(
            float(binary_auc(labels, scores)), abs=1e-6)


class TestBatchGAUC:
    def test_matches_naive_grouped(self):
        rng = np.random.RandomState(1)
        b = 48
        labels = (rng.rand(b) > 0.5).astype(np.float32)
        scores = rng.randn(b).astype(np.float32)
        groups = rng.randint(0, 6, b)
        got = float(batch_gauc(jnp.array(labels), jnp.array(scores),
                               jnp.array(groups)))
        total_w, acc = 0.0, 0.0
        for g in np.unique(groups):
            m = groups == g
            yl, sl = labels[m], scores[m]
            n_pos, n_neg = yl.sum(), (1 - yl).sum()
            if n_pos == 0 or n_neg == 0:
                continue
            acc += n_pos * n_neg * naive_auc(yl, sl)
            total_w += n_pos * n_neg
        assert got == pytest.approx(acc / total_w, abs=1e-5)

    def test_no_valid_pairs(self):
        labels = jnp.array([1.0, 1.0])
        scores = jnp.array([0.2, 0.4])
        groups = jnp.array([1, 1])
        assert float(batch_gauc(labels, scores, groups)) == 0.5


class TestStreamingGAUC:
    def test_accumulates_across_batches(self):
        rng = np.random.RandomState(2)
        acc = StreamingGAUC()
        all_g, all_y, all_s = [], [], []
        for _ in range(4):
            g = rng.randint(0, 5, 32)
            y = (rng.rand(32) > 0.5).astype(np.float32)
            s = rng.randn(32)
            acc.update(g, y, s)
            all_g.append(g), all_y.append(y), all_s.append(s)
        res = acc.result()
        g = np.concatenate(all_g)
        y = np.concatenate(all_y)
        s = np.concatenate(all_s)
        assert res["auc"] == pytest.approx(naive_auc(y, s), abs=1e-6)
        # per-group check
        total_w, accum = 0.0, 0.0
        for gid in np.unique(g):
            m = g == gid
            n_pos, n_neg = y[m].sum(), (1 - y[m]).sum()
            if n_pos == 0 or n_neg == 0:
                continue
            accum += n_pos * n_neg * naive_auc(y[m], s[m])
            total_w += n_pos * n_neg
        assert res["gauc"] == pytest.approx(accum / total_w, abs=1e-6)

    def test_weight_by_validation(self):
        with pytest.raises(ValueError):
            StreamingGAUC(weight_by="bogus")


class TestDeviceStreamingAUC:
    def test_matches_exact_within_bucket_error(self):
        from rec_now_tpu.training.metrics import DeviceStreamingAUC
        rng = np.random.RandomState(3)
        acc = DeviceStreamingAUC(num_buckets=4096)
        all_y, all_s = [], []
        for _ in range(4):
            y = (rng.rand(512) > 0.7).astype(np.float32)
            s = rng.randn(512).astype(np.float32) * 2.0
            acc.update(y, s)
            all_y.append(y), all_s.append(s)
        res = acc.result()
        y = np.concatenate(all_y)
        s = np.concatenate(all_s)
        assert res["auc"] == pytest.approx(naive_auc(y, s), abs=1e-3)
        assert res["num_pos"] == pytest.approx(y.sum())
        assert res["num_neg"] == pytest.approx((1 - y).sum())

    def test_weighted(self):
        from rec_now_tpu.training.metrics import DeviceStreamingAUC
        rng = np.random.RandomState(4)
        y = (rng.rand(256) > 0.5).astype(np.float32)
        s = rng.randn(256).astype(np.float32)
        # integer weights == repetition
        w = rng.randint(1, 4, 256).astype(np.float32)
        acc = DeviceStreamingAUC(num_buckets=8192)
        acc.update(y, s, weights=w)
        y_rep = np.repeat(y, w.astype(int))
        s_rep = np.repeat(s, w.astype(int))
        assert acc.result()["auc"] == pytest.approx(
            naive_auc(y_rep, s_rep), abs=1e-3)

    def test_degenerate_single_class(self):
        from rec_now_tpu.training.metrics import DeviceStreamingAUC
        acc = DeviceStreamingAUC()
        acc.update(np.ones(8, np.float32), np.zeros(8, np.float32))
        assert acc.result()["auc"] == 0.5


class TestBatchGaucStats:
    def test_ratio_matches_batch_gauc(self):
        from rec_now_tpu.training.metrics import batch_gauc_stats
        rng = np.random.RandomState(5)
        y = (rng.rand(64) > 0.5).astype(np.float32)
        s = rng.randn(64).astype(np.float32)
        g = rng.randint(0, 6, 64)
        win, total = batch_gauc_stats(jnp.asarray(y), jnp.asarray(s),
                                      jnp.asarray(g))
        assert float(win) / float(total) == pytest.approx(
            float(batch_gauc(jnp.asarray(y), jnp.asarray(s),
                             jnp.asarray(g))), abs=1e-6)

    def test_streaming_accumulation(self):
        # accumulating (win, total) across two halves == whole-batch
        # stats when groups do not span the halves
        from rec_now_tpu.training.metrics import batch_gauc_stats
        rng = np.random.RandomState(6)
        y = (rng.rand(64) > 0.5).astype(np.float32)
        s = rng.randn(64).astype(np.float32)
        g = np.concatenate([rng.randint(0, 4, 32),
                            rng.randint(10, 14, 32)])
        w1, t1 = batch_gauc_stats(y[:32], s[:32], g[:32])
        w2, t2 = batch_gauc_stats(y[32:], s[32:], g[32:])
        w, t = batch_gauc_stats(y, s, g)
        assert float(w1 + w2) == pytest.approx(float(w), abs=1e-5)
        assert float(t1 + t2) == pytest.approx(float(t), abs=1e-5)
