"""Interpret-mode correctness for the measured-artifact kernels.

packed_gather / expand_lines lost their Pallas-vs-XLA A/B on the v5e
rig (BASELINE.md r5 refutations) but remain in-tree as measured
artifacts; these CPU interpret-mode tests keep their math pinned so a
future re-measurement starts from a correct kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.ops.pallas.expand_kernel import expand_lines
from rec_now_tpu.ops.pallas.gather_kernel import packed_gather


def _packed_table(vp=64, pack=8, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(vp, pack * dim).astype(np.float32))


def test_packed_gather_matches_take_select():
    pack, dim = 8, 16
    table = _packed_table()
    rng = np.random.RandomState(1)
    rows = jnp.asarray(rng.randint(0, 64 * pack, 1500).astype(np.int32))
    got = packed_gather(table, rows, pack=pack, dim=dim)
    pr, off = np.asarray(rows) // pack, np.asarray(rows) % pack
    lines = np.asarray(table)[pr].reshape(-1, pack, dim)
    ref = lines[np.arange(len(pr)), off]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_packed_gather_oob_clamps_to_last_row():
    pack, dim = 8, 16
    table = _packed_table()
    rows = jnp.asarray([10 ** 6], jnp.int32)
    got = packed_gather(table, rows, pack=pack, dim=dim)
    # physical row clamps to vp-1; the lane slot is row % pack
    slot = (10 ** 6) % pack
    ref = np.asarray(table)[-1].reshape(pack, dim)[slot]
    np.testing.assert_allclose(np.asarray(got)[0], ref, rtol=1e-6)


@pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
def test_expand_lines_matches_one_hot(out_dtype):
    pack, dim = 8, 16
    rng = np.random.RandomState(2)
    grads = jnp.asarray(rng.randn(1300, dim).astype(np.float32))
    off = jnp.asarray(rng.randint(0, pack, 1300).astype(np.int32))
    got = expand_lines(grads, off, pack=pack, dim=dim,
                       out_dtype=out_dtype, tile=1024)
    oh = jax.nn.one_hot(off, pack, dtype=jnp.float32)
    ref = (oh[:, :, None] * grads[:, None, :]).reshape(1300, -1)
    assert got.dtype == out_dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref.astype(out_dtype),
                                          np.float32), rtol=1e-6)


def test_expand_lines_rejects_sub1024_tile():
    with pytest.raises(ValueError, match="1024"):
        expand_lines(jnp.zeros((8, 16)), jnp.zeros((8,), jnp.int32),
                     pack=8, dim=16, tile=512)


def test_packed_gather_rejects_sub1024_chunk():
    with pytest.raises(ValueError, match="1024"):
        packed_gather(_packed_table(), jnp.zeros((8,), jnp.int32),
                      pack=8, dim=16, chunk=512)
