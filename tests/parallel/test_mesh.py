"""Tests for parallel/mesh.py and parallel/multihost.py.

Run on the 8-virtual-device CPU mesh (tests/conftest.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_now_tpu.parallel.mesh import (DATA_AXIS, data_sharding, make_mesh,
                                       replicated_sharding)
from rec_now_tpu.parallel.multihost import (initialize_multihost,
                                            put_local_batch)


class TestMakeMesh:
    def test_default_uses_all_devices(self):
        mesh = make_mesh()
        assert mesh.shape[DATA_AXIS] == len(jax.devices())
        assert mesh.axis_names == (DATA_AXIS,)

    def test_num_devices_prefix(self):
        mesh = make_mesh(4)
        assert mesh.shape[DATA_AXIS] == 4
        assert list(mesh.devices.flat) == jax.devices()[:4]

    def test_custom_axis_name(self):
        mesh = make_mesh(2, axis_name="dp")
        assert mesh.axis_names == ("dp",)


class TestShardings:
    @pytest.fixture(scope="class")
    def mesh(self):
        return make_mesh(8)

    def test_data_sharding_splits_batch_axis(self, mesh):
        x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
        y = jax.device_put(x, data_sharding(mesh, 2))
        # each device holds a (2, 3) slice of the batch axis
        shard_shapes = {s.data.shape for s in y.addressable_shards}
        assert shard_shapes == {(2, 3)}
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_replicated_sharding_copies_everywhere(self, mesh):
        x = jnp.arange(6, dtype=jnp.float32)
        y = jax.device_put(x, replicated_sharding(mesh))
        shard_shapes = {s.data.shape for s in y.addressable_shards}
        assert shard_shapes == {(6,)}
        assert len(y.addressable_shards) == 8

    def test_data_sharding_1d(self, mesh):
        x = jnp.arange(8, dtype=jnp.int32)
        y = jax.device_put(x, data_sharding(mesh, 1))
        assert {s.data.shape for s in y.addressable_shards} == {(1,)}


class TestMultihost:
    def test_initialize_is_noop_single_process(self):
        # must not raise in the single-process dev container, and must
        # leave jax usable
        initialize_multihost()
        assert jax.process_count() == 1

    def test_put_local_batch_single_process_roundtrip(self):
        mesh = make_mesh(8)
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        y = put_local_batch(mesh, x)
        # single process: local slice == global batch
        assert y.shape == (8, 4)
        assert y.sharding.spec == data_sharding(mesh, 2).spec
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_put_local_batch_feeds_train_math(self):
        """The assembled array works inside a jitted psum-style step."""
        mesh = make_mesh(8)
        x = np.ones((8, 2), np.float32)
        y = put_local_batch(mesh, x)

        @jax.jit
        def mean_loss(v):
            return jnp.mean(jnp.square(v))

        assert float(mean_loss(y)) == pytest.approx(1.0)
