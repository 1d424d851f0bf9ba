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
