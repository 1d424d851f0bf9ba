"""Component timing of the flagship train step on the real device.

Times each stage in a scan window whose iterations are data-dependent
(inputs perturbed by a runtime-zero derived from the carry) so XLA can
neither hoist the stage out of the loop nor dead-code-eliminate it.
Stateful stages (table update, full step) carry real state through.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rec_now_tpu.models import DCNv2Model, FeatureConfig
from rec_now_tpu.parallel import make_mesh
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

B = 8192
STEPS = 20


def timeit(name, step_fn, carry0):
    """step_fn(carry) -> carry; must be runtime-data-dependent."""
    @jax.jit
    def run(carry0):
        def body(c, _):
            return step_fn(c), ()
        c, _ = jax.lax.scan(body, carry0, None, length=STEPS)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)) if x.dtype != bool
            else jnp.sum(x), jax.tree_util.tree_leaves(c)[0])

    float(run(carry0))  # compile+warm
    t0 = time.perf_counter()
    float(run(carry0))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:34s} {dt:8.3f} ms/step")
    return dt


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
    table = trainer.table
    gids = fc.global_ids(ids)
    emb0 = table.lookup(state.table, gids)

    def rtz(c):
        """runtime-zero scalar derived from carry (not constant-foldable)."""
        leaf = jax.tree_util.tree_leaves(c)[0]
        return jnp.isnan(jnp.sum(leaf.astype(jnp.float32)) * 0.0 + 0.0
                         ).astype(jnp.float32) * 0.0 + \
            0.0 * jnp.sum(leaf.astype(jnp.float32))

    # NB: rtz(c) is 0.0 at runtime but depends on c, so each iteration's
    # inputs depend on the previous iteration's output.
    def lookup_step(c):
        g2 = gids + (rtz(c) > 1.0).astype(gids.dtype)
        return table.lookup(state.table, g2)
    timeit("lookup", lookup_step, emb0)

    def fwd_step(c):
        e = emb0 + rtz(c)
        return trainer.model.apply(state.params, dense, e)
    timeit("model fwd (pre-gathered)", fwd_step,
           trainer.model.apply(state.params, dense, emb0))

    def loss_step(c):
        e = emb0 + rtz(c)
        l, _ = trainer._loss_fn(state.params, e, None, dense, labels,
                                groups, cvr)
        return l
    timeit("loss fwd (incl ranking)", loss_step, jnp.zeros(()))

    def fwd_bwd_step(c):
        e = emb0 + rtz(c)
        (l, _), g = jax.value_and_grad(trainer._loss_fn, argnums=(0, 1),
                                       has_aux=True)(
            state.params, e, None, dense, labels, groups, cvr)
        return l
    timeit("loss fwd+bwd", fwd_bwd_step, jnp.zeros(()))

    def pair_step(c):
        lg = labels * 2 - 1 + rtz(c)
        return trainer._ranking_losses(lg, labels, groups)["pairwise"]
    timeit("pairwise only", pair_step, jnp.zeros(()))

    def update_step(tstate):
        return table.apply_grads(tstate, gids, emb0 * 1e-6, lr=0.05)
    timeit("table update (apply_grads)", update_step, state.table)

    def full_step(st):
        st2, m = trainer._step_body(st, dense, ids, labels, groups, cvr, domain)
        return st2
    timeit("FULL STEP", full_step, state)


if __name__ == "__main__":
    main()
