"""Bisect benchmark config #3 (xDeepFM CIN+iPNN pairwise): attribute
the per-step cost across lookup / CIN / iPNN / deep / pairwise / opt.

Run on the TPU: python tools/profile_config3.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rec_now_tpu.models import XDeepFMModel, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

B = 8192
STEPS = 20


def timeit(name, step_fn, carry0):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=STEPS)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)
    r = run(carry0)
    jax.tree_util.tree_map(float, jax.tree_util.tree_leaves(r)[:1])
    t0 = time.perf_counter()
    r = run(carry0)
    jax.tree_util.tree_map(float, jax.tree_util.tree_leaves(r)[:1])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    mesh = make_mesh(len(jax.devices()))
    fc = FeatureConfig(num_dense=13, num_sparse=26,
                       rows_per_field=100_000, embedding_dim=16)
    cfg = TrainerConfig(pointwise_weight=1.0, pairwise_weight=1.0,
                        click_occurance_power=-0.5)
    trainer = Trainer(XDeepFMModel(), fc, cfg, mesh=mesh)
    data = SyntheticCriteo(rows_per_field=100_000, num_users=50_000)
    batch = data.sample(B, np.random.RandomState(0))
    state = trainer.init(jax.random.PRNGKey(0), batch)
    dense, ids, labels, groups, cvr, domain = trainer.put(batch)
    table, tx = trainer.table, trainer.tx

    def make_step(do_lookup=True, do_grad=True, do_update=True,
                  do_dense_opt=True, do_ranking=True,
                  do_cin=True, do_pnn=True, do_deep=True):
        model = XDeepFMModel()

        def fwd(params, dense_x, emb):
            b, f, d = emb.shape
            parts = []
            if do_cin:
                from rec_now_tpu.layers.cin_layer import CINLayer
                parts.append(model.apply(
                    params, emb, sum_channel=True,
                    method=lambda m, e, sum_channel: CINLayer(
                        hidden_sizes=list(m.cin_hidden_sizes),
                        name="cin")(e, sum_channel=sum_channel)))
            # fall back to full model.apply if we want everything
            return None

        def step(state):
            gids = fc.global_ids(ids)
            if do_lookup:
                emb = table.lookup(state.table, gids)
            else:
                emb = jnp.zeros(gids.shape + (fc.embedding_dim,))

            def loss_fn(params, emb):
                logits = trainer.model.apply(params, dense, emb)
                from rec_now_tpu.losses.pointwise import (
                    sigmoid_cross_entropy_with_logits)
                loss = jnp.mean(sigmoid_cross_entropy_with_logits(
                    labels, logits))
                if do_ranking:
                    r = trainer._ranking_losses(logits, labels, groups)
                    loss = loss + cfg.pairwise_weight * r["pairwise"]
                return loss

            if do_grad:
                loss, (gp, gemb) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(state.params, emb)
            else:
                loss = loss_fn(state.params, emb)
                gp = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                gemb = emb * 1e-6
            if do_dense_opt:
                updates, opt_state = tx.update(gp, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
            else:
                params, opt_state = state.params, state.opt_state
            if do_update:
                new_table = table.apply_grads(state.table, gids, gemb,
                                              lr=cfg.sparse_lr)
            else:
                new_table = state.table
            return state._replace(params=params, opt_state=opt_state,
                                  table=new_table,
                                  step=state.step + 1)
        return step

    timeit("everything", make_step(), state)
    timeit("- ranking loss", make_step(do_ranking=False), state)
    timeit("- table update", make_step(do_update=False), state)
    timeit("- dense opt", make_step(do_dense_opt=False), state)
    timeit("- lookup (zero emb)", make_step(do_lookup=False), state)
    timeit("- grad (fwd only)", make_step(do_grad=False), state)
    timeit("fwd only, no ranking", make_step(do_grad=False,
                                             do_ranking=False), state)

    # model-part isolation: time fwd+bwd of each sub-tower on (B, F, D)
    emb0 = jnp.asarray(np.random.RandomState(0).randn(
        B, fc.num_sparse, fc.embedding_dim).astype(np.float32))
    dense0 = dense

    from rec_now_tpu.layers.cin_layer import CINLayer
    from rec_now_tpu.layers.inner_pnn_layer import InnerPNNLayer
    from rec_now_tpu.models.tower import DNNTower
    from flax import linen as nn

    class CinOnly(nn.Module):
        @nn.compact
        def __call__(self, emb):
            return CINLayer(hidden_sizes=[64, 64], name="cin")(
                emb, sum_channel=True)

    class PnnOnly(nn.Module):
        @nn.compact
        def __call__(self, emb):
            return InnerPNNLayer(name="ipnn")(emb)

    class DeepOnly(nn.Module):
        @nn.compact
        def __call__(self, emb):
            b, f, d = emb.shape
            return DNNTower(dims=[256, 128], name="deep")(
                emb.reshape(b, f * d))

    for nm, mod in [("cin only", CinOnly()), ("ipnn only", PnnOnly()),
                    ("deep only", DeepOnly())]:
        params = mod.init(jax.random.PRNGKey(0), emb0)

        def part_step(c, mod=mod, params=params):
            emb = c

            def lf(e):
                return jnp.sum(mod.apply(params, e))
            g = jax.grad(lf)(emb)
            return emb + 1e-12 * g
        timeit(f"{nm} fwd+bwd", part_step, emb0)

    # pairwise loss isolation
    def pw_step(c):
        lg = c

        def lf(lg):
            r = trainer._ranking_losses(lg, labels, groups)
            return r["pairwise"]
        g = jax.grad(lf)(lg)
        return lg + 1e-12 * g
    timeit("pairwise loss fwd+bwd", pw_step,
           jnp.asarray(np.random.RandomState(0).randn(B).astype(
               np.float32)))


if __name__ == "__main__":
    main()
