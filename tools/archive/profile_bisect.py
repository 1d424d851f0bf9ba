"""Bisect the full train step: time it with pieces knocked out."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rec_now_tpu.models import DCNv2Model, FeatureConfig
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


def main():
    mesh = make_mesh(len(jax.devices()))
    fc = FeatureConfig(num_dense=13, num_sparse=26,
                       rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16, dcn_layers=2,
                   dcn_experts=2),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5),
        mesh=mesh)
    data = SyntheticCriteo(rows_per_field=100_000, num_users=50_000)
    batch = data.sample(B, np.random.RandomState(0))
    state = trainer.init(jax.random.PRNGKey(0), batch)
    dense, ids, labels, groups, cvr, domain = trainer.put(batch)
    table, tx, cfg = trainer.table, trainer.tx, trainer.cfg

    def make_step(do_lookup=True, do_grad=True, do_update=True,
                  do_dense_opt=True, do_ranking=True):
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
    timeit("lookup+update only", make_step(do_grad=False,
                                           do_dense_opt=False,
                                           do_ranking=False), state)


if __name__ == "__main__":
    main()
