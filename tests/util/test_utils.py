"""Tests for util helpers."""
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.util import wrap_as_list, calc_sum_of_abs_diff, all_equal
from rec_now_tpu.core.shapes import pad_or_truncate
from rec_now_tpu.core.debug import dbg_print, dbg_minmax


def test_wrap_as_list():
    assert wrap_as_list(1) == [1]
    assert wrap_as_list([1, 2]) == [1, 2]


def test_numpy_tools():
    assert calc_sum_of_abs_diff([1.0, 2.0], [1.0, 3.0]) == 1.0
    assert all_equal([1, 2], [1, 2])
    assert not all_equal([1, 2], [1, 3])


def test_pad_or_truncate():
    x = jnp.arange(6.0).reshape(2, 3)
    assert pad_or_truncate(x, 2, axis=1).shape == (2, 2)
    padded = pad_or_truncate(x, 5, axis=-1, constant_values=9)
    assert padded.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(padded)[:, 3:], 9.0)
    assert pad_or_truncate(x, 3, axis=1) is x


def test_dbg_print_identity():
    x = jnp.ones((2, 2))
    assert dbg_print(x, "t", do_print=False) is x
    assert dbg_minmax(x, "t", do_print=False) is x
    # with printing enabled the tensor passes through unchanged
    assert dbg_print(x, "t", do_print=True).shape == (2, 2)
    assert dbg_minmax(x, "t", do_print=True).shape == (2, 2)
