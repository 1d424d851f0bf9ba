"""Pallas pairwise kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.losses.pairwise import pairwise_loss
from rec_now_tpu.ops.pallas.pairwise_kernel import (
    pairwise_loss_pallas, pair_row_counts, same_group_matvec)


def _mk(b, seed=0, n_groups=5):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randn(b), jnp.float32),
            jnp.array((rng.rand(b) > 0.5), jnp.float32),
            jnp.array(rng.randint(0, n_groups, b), jnp.int32))


class TestRowCounts:
    def test_matches_dense(self):
        o, l, g = _mk(32)
        counts = pair_row_counts(o, l, g)
        same = np.asarray(g)[:, None] == np.asarray(g)[None, :]
        off = ~np.eye(32, dtype=bool)
        order = np.asarray(l)[:, None] > np.asarray(l)[None, :]
        expected = (same & off & order).sum(1)
        np.testing.assert_allclose(np.asarray(counts), expected)


class TestSameGroupMatvec:
    def test_matches_dense(self):
        _, _, g = _mk(32, seed=1)
        v = jnp.arange(32, dtype=jnp.float32)
        got = same_group_matvec(g, v)
        same = (np.asarray(g)[:, None] == np.asarray(g)[None, :])
        np.testing.assert_allclose(np.asarray(got),
                                   same @ np.asarray(v), rtol=1e-6)


class TestPairwiseKernel:
    @pytest.mark.parametrize("power", [0.0, -1.0, 0.5])
    def test_matches_xla(self, power):
        o, l, g = _mk(48, seed=2)
        xla = pairwise_loss(o, l, g, click_occurance_power=power,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g, click_occurance_power=power)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5), power

    def test_mask_and_wrong_order(self):
        o, l, g = _mk(32, seed=3)
        mask = jnp.array(np.random.RandomState(4).rand(32) > 0.3)
        xla = pairwise_loss(o, l, g, mask=mask,
                            only_use_wrong_order_pair=True,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g, mask=mask,
                                   only_use_wrong_order_pair=True)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5)

    def test_num_pair(self):
        o, l, g = _mk(40, seed=5)
        _, n_x = pairwise_loss(o, l, g, return_num_pair=True,
                               use_pallas=False)
        _, n_k = pairwise_loss_pallas(o, l, g, return_num_pair=True)
        assert float(n_x) == float(n_k)

    @pytest.mark.parametrize("power", [0.0, -0.5])
    def test_gradients_match(self, power):
        o, l, g = _mk(32, seed=6)
        gx = jax.grad(lambda x: pairwise_loss(
            x, l, g, click_occurance_power=power, use_pallas=False))(o)
        gk = jax.grad(lambda x: pairwise_loss_pallas(
            x, l, g, click_occurance_power=power))(o)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-4, atol=1e-6), power

    def test_degenerate_batch(self):
        o = jnp.array(np.random.RandomState(0).randn(16), jnp.float32)
        l = jnp.ones(16)
        g = jnp.zeros(16, jnp.int32)
        assert float(pairwise_loss_pallas(o, l, g)) == pytest.approx(0.0)
        gk = jax.grad(lambda x: pairwise_loss_pallas(x, l, g))(o)
        np.testing.assert_allclose(np.asarray(gk), 0.0, atol=1e-7)

    def test_non_power_of_two_batch(self):
        o, l, g = _mk(40, seed=7)  # 40 -> tile 8
        xla = pairwise_loss(o, l, g, use_pallas=False)
        ker = pairwise_loss_pallas(o, l, g)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5)

    def test_jit(self):
        o, l, g = _mk(32, seed=8)
        f = jax.jit(lambda x: pairwise_loss_pallas(x, l, g))
        assert np.isfinite(float(f(o)))

    def test_auto_dispatch_off_cpu(self):
        # on CPU the auto path must stay on XLA (no interpret overhead
        # in production code paths); explicit use_pallas=True still runs
        # the kernel via the interpreter.
        o, l, g = _mk(16, seed=9)
        a = pairwise_loss(o, l, g)                 # auto -> XLA on CPU
        b = pairwise_loss(o, l, g, use_pallas=True)
        assert float(a) == pytest.approx(float(b), abs=2e-5)


class TestMultiGroupKernel:
    """Multi-group AND on the kernel path (reference :68-74)."""

    def _mk2(self, b, seed=0):
        o, l, g = _mk(b, seed=seed)
        g2 = jnp.array(np.random.RandomState(seed + 100)
                       .randint(0, 3, b), jnp.int32)
        return o, l, g, g2

    @pytest.mark.parametrize("power", [0.0, -1.0])
    def test_matches_xla(self, power):
        o, l, g, g2 = self._mk2(48, seed=11)
        xla = pairwise_loss(o, l, [g, g2], click_occurance_power=power,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, [g, g2],
                                   click_occurance_power=power)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5), power

    def test_mask_wrong_order_and_pad(self):
        o, l, g, g2 = self._mk2(40, seed=12)  # non-pow2 -> padding
        mask = jnp.array(np.random.RandomState(13).rand(40) > 0.3)
        xla = pairwise_loss(o, l, [g, g2], mask=mask,
                            only_use_wrong_order_pair=True,
                            use_pallas=False)
        ker = pairwise_loss_pallas(o, l, [g, g2], mask=mask,
                                   only_use_wrong_order_pair=True)
        assert float(ker) == pytest.approx(float(xla), abs=2e-5)

    def test_gradients_match(self):
        o, l, g, g2 = self._mk2(32, seed=14)
        gx = jax.grad(lambda x: pairwise_loss(
            x, l, [g, g2], click_occurance_power=-0.5,
            use_pallas=False))(o)
        gk = jax.grad(lambda x: pairwise_loss_pallas(
            x, l, [g, g2], click_occurance_power=-0.5))(o)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-4, atol=1e-6)

    def test_row_counts_multi(self):
        o, l, g, g2 = self._mk2(32, seed=15)
        counts = pair_row_counts(o, l, [g, g2])
        same = ((np.asarray(g)[:, None] == np.asarray(g)[None, :])
                & (np.asarray(g2)[:, None] == np.asarray(g2)[None, :]))
        off = ~np.eye(32, dtype=bool)
        order = np.asarray(l)[:, None] > np.asarray(l)[None, :]
        np.testing.assert_allclose(np.asarray(counts),
                                   (same & off & order).sum(1))

    def test_auto_dispatch_covers_lists(self):
        # losses/pairwise.py must treat list groups as kernel-eligible
        from rec_now_tpu.losses import pairwise as pw
        o, l, g, g2 = self._mk2(16, seed=16)
        a = pw.pairwise_loss(o, l, [g, g2])        # auto -> XLA on CPU
        b = pw.pairwise_loss(o, l, [g, g2], use_pallas=True)
        assert float(a) == pytest.approx(float(b), abs=2e-5)


class TestBlockedAutoDispatch:
    """Non-kernel option paths at production B route to the blocked form."""

    def test_weight_fn_large_batch_routes_blocked(self, monkeypatch):
        from rec_now_tpu.losses import pairwise as pw
        from rec_now_tpu.losses import pairwise_blocked as pb
        calls = {}
        orig = pb.pairwise_loss_blocked

        def spy(*a, **k):
            calls["hit"] = True
            return orig(*a, **k)
        monkeypatch.setattr(pb, "pairwise_loss_blocked", spy)
        monkeypatch.setattr(pw, "BLOCKED_MIN_BATCH", 64)

        o, l, g = _mk(128, seed=20)
        wfn = lambda lp, ln: jnp.maximum(lp - ln, 0.0)  # noqa: E731
        got = pw.pairwise_loss(o, l, g, label_pair_to_weight_func=wfn)
        assert calls.get("hit"), "blocked path not taken"
        # raise the threshold so the comparison run takes the dense path
        monkeypatch.setattr(pw, "BLOCKED_MIN_BATCH", 10 ** 9)
        dense = pw.pairwise_loss(o, l, g, label_pair_to_weight_func=wfn,
                                 use_pallas=False)
        assert float(got) == pytest.approx(float(dense), abs=2e-5)

    def test_listwise_large_batch_routes_blocked(self, monkeypatch):
        from rec_now_tpu.losses import listwise as lw
        from rec_now_tpu.losses import listwise_blocked as lb
        calls = {}
        orig = lb.listwise_loss_blocked

        def spy(*a, **k):
            calls["hit"] = True
            return orig(*a, **k)
        monkeypatch.setattr(lb, "listwise_loss_blocked", spy)
        import rec_now_tpu.losses.pairwise as pw
        monkeypatch.setattr(pw, "BLOCKED_MIN_BATCH", 64)

        rng = np.random.RandomState(21)
        g = jnp.array(rng.randint(0, 10, 128), jnp.int32)
        l = jnp.array((rng.rand(128) > 0.5), jnp.float32)
        x = jnp.array(rng.randn(128), jnp.float32)
        got = lw.listwise_loss(g, l, x, use_pallas=False)
        assert calls.get("hit"), "blocked path not taken"
        monkeypatch.setattr(pw, "BLOCKED_MIN_BATCH", 10 ** 9)
        dense = lw.listwise_loss(g, l, x, use_pallas=False)
        assert float(got) == pytest.approx(float(dense), abs=2e-5)


class TestBinaryClosedForm:
    """The r5 single-sweep occurrence closed form (binary labels)."""

    def test_group_pair_counts_binary_matches_composition(self):
        from rec_now_tpu.ops.pallas.pairwise_kernel import (
            group_pair_counts_binary)
        o, l, g = _mk(48, seed=5)
        m = jnp.asarray((np.random.RandomState(6).rand(48) > 0.2)
                        .astype(np.float32))
        counts = pair_row_counts(o, l, g, sample_mask=m)
        ref = same_group_matvec(g, counts)
        got = group_pair_counts_binary(g, l, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6)

    @pytest.mark.parametrize("power", [-0.5, 1.0])
    def test_binary_labels_path_matches_general(self, power):
        o, l, g = _mk(64, seed=7)
        kw = dict(click_occurance_power=power, return_num_pair=True,
                  reduce_mean=False)
        general = pairwise_loss_pallas(o, l, g, **kw)
        fast = pairwise_loss_pallas(o, l, g, binary_labels=True, **kw)
        np.testing.assert_allclose(float(fast[0]), float(general[0]),
                                   rtol=1e-5)
        assert float(fast[1]) == float(general[1])

    def test_binary_labels_path_gradients_match(self):
        o, l, g = _mk(64, seed=8)

        def loss(x, binary):
            s, n = pairwise_loss_pallas(
                x, l, g, click_occurance_power=-0.5,
                return_num_pair=True, reduce_mean=False,
                binary_labels=binary)
            return s / (n + 1e-10)

        g_gen = jax.grad(lambda x: loss(x, False))(o)
        g_fast = jax.grad(lambda x: loss(x, True))(o)
        np.testing.assert_allclose(np.asarray(g_fast),
                                   np.asarray(g_gen), rtol=1e-5,
                                   atol=1e-8)

    def test_multi_group_or_wrong_order_falls_back(self):
        """binary_labels with multi-condition groups / wrong-order must
        keep the general (counts+matvec) semantics."""
        o, l, g = _mk(48, seed=9)
        g2 = jnp.asarray(np.random.RandomState(10)
                         .randint(0, 3, 48).astype(np.int32))
        for kw in ({"groups": [g, g2]},
                   {"groups": g, "only_use_wrong_order_pair": True}):
            groups = kw.pop("groups")
            general = pairwise_loss_pallas(
                o, l, groups, click_occurance_power=-0.5,
                return_num_pair=True, reduce_mean=False, **kw)
            fast = pairwise_loss_pallas(
                o, l, groups, click_occurance_power=-0.5,
                return_num_pair=True, reduce_mean=False,
                binary_labels=True, **kw)
            np.testing.assert_allclose(float(fast[0]),
                                       float(general[0]), rtol=1e-6)
