"""Parity tests for the Pallas dense-pass optimizer kernels.

On CPU the kernels run in interpret mode; results must match the XLA
elementwise formulation the sharded table uses as its fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.ops.pallas.table_update_kernel import (
    adagrad_dense_pass, adam_dense_pass)

PACK, DIM = 8, 16
W = PACK * DIM


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32)


def _xla_adagrad(table, acc, dense_g, lr):
    vp, w = table.shape
    gl = dense_g.reshape(vp, PACK, DIM)
    sq = jnp.mean(jnp.square(gl), axis=2)
    new_acc = acc + sq
    scale = lr / jnp.sqrt(jnp.clip(new_acc, 1e-12))
    upd = (scale[:, :, None] * gl).reshape(vp, w)
    return table - upd, new_acc


def _xla_adam(table, m, v, dense_g, cnt, t, lr, b1, b2, eps):
    vp, w = table.shape
    touched = (cnt > 0)[:, :, None]
    gl = dense_g.reshape(vp, PACK, DIM)
    m3 = m.reshape(vp, PACK, DIM)
    v3 = v.reshape(vp, PACK, DIM)
    m_new = jnp.where(touched, b1 * m3 + (1 - b1) * gl, m3)
    v_new = jnp.where(touched, b2 * v3 + (1 - b2) * jnp.square(gl), v3)
    tf_ = t.astype(jnp.float32)
    mhat = m_new / (1 - b1 ** tf_)
    vhat = v_new / (1 - b2 ** tf_)
    upd = jnp.where(touched, lr * mhat / (jnp.sqrt(vhat) + eps), 0.0)
    return (table - upd.reshape(vp, w), m_new.reshape(vp, w),
            v_new.reshape(vp, w))


class TestAdagradPass:
    @pytest.mark.parametrize("vp", [16, 40])
    def test_matches_xla(self, vp):
        table = _rand(0, vp, W)
        acc = jnp.abs(_rand(1, vp, PACK)) * 0.1
        # sparse-ish grads: most rows zero
        g = _rand(2, vp, W) * (jnp.arange(vp)[:, None] % 3 == 0)
        want_t, want_a = _xla_adagrad(table, acc, g, 0.05)
        got_t, got_a = adagrad_dense_pass(table, acc, g, lr=0.05,
                                          pack=PACK, dim=DIM)
        np.testing.assert_allclose(got_a, want_a, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-6)

    def test_zero_grads_noop_table(self):
        table = _rand(0, 16, W)
        acc = jnp.abs(_rand(1, 16, PACK))
        got_t, got_a = adagrad_dense_pass(
            table, acc, jnp.zeros((16, W)), lr=0.1, pack=PACK, dim=DIM)
        np.testing.assert_allclose(got_t, table, atol=1e-7)
        np.testing.assert_allclose(got_a, acc, atol=1e-7)


class TestAdamPass:
    @pytest.mark.parametrize("t", [1, 7])
    def test_matches_xla(self, t):
        vp = 24
        table = _rand(0, vp, W)
        m = _rand(1, vp, W) * 0.01
        v = jnp.abs(_rand(2, vp, W)) * 0.01
        cnt = (jax.random.uniform(jax.random.PRNGKey(3), (vp, PACK))
               < 0.3).astype(jnp.float32) * 2.0
        # grads only where touched (as the scatter guarantees)
        gmask = jnp.repeat(cnt > 0, DIM, axis=1).astype(jnp.float32)
        g = _rand(4, vp, W) * gmask
        args = (table, m, v, g, cnt, jnp.int32(t))
        hp = dict(lr=0.01, b1=0.9, b2=0.999, eps=1e-7)
        want = _xla_adam(*args, **hp)
        got = adam_dense_pass(*args, pack=PACK, dim=DIM, **hp)
        for w, g_ in zip(want, got):
            np.testing.assert_allclose(g_, w, rtol=1e-5, atol=1e-6)

    def test_untouched_rows_frozen(self):
        """cnt == 0 rows: table, m, v unchanged (lazy Adam)."""
        vp = 16
        table = _rand(0, vp, W)
        m = _rand(1, vp, W)
        v = jnp.abs(_rand(2, vp, W))
        cnt = jnp.zeros((vp, PACK)).at[3, 2].set(1.0)
        g = jnp.zeros((vp, W)).at[3, 2 * DIM:3 * DIM].set(1.0)
        got_t, got_m, got_v = adam_dense_pass(
            table, m, v, g, cnt, jnp.int32(1), lr=0.01, b1=0.9,
            b2=0.999, eps=1e-7, pack=PACK, dim=DIM)
        keep = np.ones(vp, bool)
        keep[3] = False
        np.testing.assert_allclose(got_t[keep], table[keep], atol=1e-7)
        np.testing.assert_allclose(got_m[keep], m[keep], atol=1e-7)
        np.testing.assert_allclose(got_v[keep], v[keep], atol=1e-7)
        # the touched slice did move
        assert not np.allclose(got_t[3, 2 * DIM:3 * DIM],
                               table[3, 2 * DIM:3 * DIM])
