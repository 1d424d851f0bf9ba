"""Tests for per-field -> per-element weight broadcast."""
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.rec_block.embedding_wise_weight import (
    gather_embedding_element_wise_weight)


def test_expand():
    weights = jnp.array([[0.1, 0.2, 0.3], [1.0, 2.0, 3.0]])
    pos_idx = [0, 0, 1, 2, 2, 2]
    got = gather_embedding_element_wise_weight(weights, pos_idx)
    expected = [[0.1, 0.1, 0.2, 0.3, 0.3, 0.3],
                [1.0, 1.0, 2.0, 3.0, 3.0, 3.0]]
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)
