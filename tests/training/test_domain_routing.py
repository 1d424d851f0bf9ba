"""Per-sample domain routing: STAR towers must train on every domain.

Covers VERDICT round-1 gap #3: ``Batch.domain_idx`` flows through
``Trainer.put`` -> ``MultiTaskModel`` -> ``ParasiticStarDenseLayer`` so
domain-specific parasitic kernels receive gradient for their own
samples (reference per-scene semantics,
rec_now/layers/star_dense_layer.py:273-289, extended to mixed-domain
batches).
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.layers.star_dense_layer import ParasiticStarDenseLayer
from rec_now_tpu.layers.stacked_dense_layer import ParasiticStackedDenseLayer


class TestPerSampleGroupIdx:
    def _mk(self, cls, **kw):
        layer = cls(units=3, num_groups=4, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 5))
        params = layer.init(jax.random.PRNGKey(1), x, 0)
        return layer, params, x

    def test_array_matches_scalar_star(self):
        layer, params, x = self._mk(ParasiticStarDenseLayer)
        for g in range(4):
            want = layer.apply(params, x, g)
            got = layer.apply(params, x,
                              jnp.full((x.shape[0],), g, jnp.int32))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6)

    def test_array_matches_scalar_stacked(self):
        layer, params, x = self._mk(ParasiticStackedDenseLayer)
        for g in range(4):
            want = layer.apply(params, x, g)
            got = layer.apply(params, x,
                              jnp.full((x.shape[0],), g, jnp.int32))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6)

    def test_mixed_domains_row_by_row(self):
        layer, params, x = self._mk(ParasiticStarDenseLayer,
                                    activation="relu")
        gi = jnp.asarray([0, 1, 2, 3, 3, 2, 1, 0], jnp.int32)
        got = np.asarray(layer.apply(params, x, gi))
        for i in range(x.shape[0]):
            want = np.asarray(layer.apply(params, x, int(gi[i])))[i]
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)

    def test_per_sample_grads_hit_only_used_groups(self):
        layer, params, x = self._mk(ParasiticStarDenseLayer)
        gi = jnp.asarray([1, 1, 2, 2, 2, 1, 1, 2], jnp.int32)  # no 0/3

        def loss(p):
            return jnp.sum(layer.apply(p, x, gi) ** 2)

        g = jax.grad(loss)(params)["params"]["parasitic_kernel"]
        g = np.asarray(g)
        assert np.all(g[0] == 0) and np.all(g[3] == 0)
        assert np.any(g[1] != 0) and np.any(g[2] != 0)


@pytest.mark.slow
class TestTrainerDomainRouting:
    def test_nonzero_domains_receive_gradient(self):
        from rec_now_tpu.models import FeatureConfig, MultiTaskModel
        from rec_now_tpu.parallel import make_mesh
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)

        mesh = make_mesh(2)
        fc = FeatureConfig(num_dense=13, num_sparse=26, rows_per_field=64,
                           embedding_dim=8)
        trainer = Trainer(
            MultiTaskModel(num_task=2, mmoe_dims=(16,), ple_dims=(8,),
                           tower_dim=8),
            fc, TrainerConfig(num_tasks=2), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=64, num_users=16)
        batch = next(data.batches(32, 1))
        assert len(np.unique(batch.domain_idx)) > 1
        state = trainer.init(jax.random.PRNGKey(0), batch)
        before = jax.tree_util.tree_map(np.asarray, state.params)
        state, metrics = trainer.train_step(state, *trainer.put(batch))
        assert np.isfinite(float(metrics["loss"]))
        after = jax.tree_util.tree_map(np.asarray, state.params)
        pk_b = before["params"]["star_tower_0"]["parasitic_kernel"]
        pk_a = after["params"]["star_tower_0"]["parasitic_kernel"]
        moved = [not np.allclose(pk_b[d], pk_a[d]) for d in range(4)]
        # every domain present in the batch trained its own kernels
        for d in np.unique(batch.domain_idx):
            assert moved[int(d)], f"domain {d} kernels got no update"

    def test_multitask_eval_reports_cvr_auc(self):
        from rec_now_tpu.models import FeatureConfig, MultiTaskModel
        from rec_now_tpu.parallel import make_mesh
        from rec_now_tpu.training import (SyntheticCriteo, Trainer,
                                          TrainerConfig)

        mesh = make_mesh(2)
        fc = FeatureConfig(num_dense=13, num_sparse=26, rows_per_field=64,
                           embedding_dim=8)
        trainer = Trainer(
            MultiTaskModel(num_task=2, mmoe_dims=(16,), ple_dims=(8,),
                           tower_dim=8),
            fc, TrainerConfig(num_tasks=2), mesh=mesh)
        data = SyntheticCriteo(rows_per_field=64, num_users=16)
        batch = next(data.batches(32, 1))
        state = trainer.init(jax.random.PRNGKey(0), batch)
        res = trainer.evaluate(state, data.batches(32, 2, seed=7))
        assert "cvr_auc" in res and "cvr_gauc" in res
        assert 0.0 <= res["cvr_auc"] <= 1.0
