"""MMoE + PLE multi-task model with STAR domain towers — benchmark
config #4 (BASELINE.json: "MMoE + PLE multi-task (CTR+CVR) with STAR
domain towers, joint pointwise+listwise loss").

Composition: shared bottom input (recalibrated embeddings + dense) ->
MMoE extraction -> PLE refinement -> per-task ParasiticStarDense domain
tower (domain selected by ``domain_idx``) -> per-task logits.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.layers.mmoe_layer import MMOELayer
from rec_now_tpu.layers.ple_layer import PLELayer
from rec_now_tpu.layers.star_dense_layer import ParasiticStarDenseLayer


class MultiTaskModel(nn.Module):
    """MMoE -> PLE -> STAR domain towers, one logit per task."""
    num_task: int = 2
    num_domains: int = 4
    mmoe_experts: int = 4
    mmoe_dims: Sequence[int] = (128, 64)
    ple_dims: Sequence[int] = (64,)
    ple_experts: int = 2
    tower_dim: int = 32

    @nn.compact
    def __call__(self, dense: jnp.ndarray, sparse_emb: jnp.ndarray,
                 domain_idx=0) -> jnp.ndarray:
        """Score a batch for every task.

        Args:
            dense: (B, num_dense).
            sparse_emb: (B, F, D).
            domain_idx: domain (scene) selector for the STAR parasitic
                towers — one group of parasitic parameters per serving
                domain, as in the STAR paper.  A Python int serves the
                whole batch from one domain; an int array (B,) routes
                each sample to its own domain (mixed-domain batches, the
                production training case).

        Returns:
            (T, B) per-task logits.
        """
        b, f, d = sparse_emb.shape
        x = jnp.concatenate([sparse_emb.reshape(b, f * d), dense], axis=-1)

        mmoe_out = MMOELayer(num_task=self.num_task,
                             num_experts=self.mmoe_experts,
                             dnn_dims=list(self.mmoe_dims),
                             name="mmoe")(x)               # (T, B, U)
        # PLE refines the concatenated task views jointly
        ple_in = jnp.concatenate([mmoe_out[t] for t in range(self.num_task)],
                                 axis=-1)                  # (B, T*U)
        ple_outs = PLELayer(num_task=self.num_task,
                            list_of_dnn_dims=[list(self.ple_dims)],
                            list_of_num_experts_per_task=self.ple_experts,
                            name="ple")(ple_in)            # [(B, U2)] * T

        logits = []
        for t in range(self.num_task):
            h = ParasiticStarDenseLayer(
                units=self.tower_dim, num_groups=self.num_domains,
                activation="relu", name=f"star_tower_{t}")(
                    ple_outs[t], domain_idx)               # (B, tower)
            logit = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name=f"head_{t}")(h)       # (B, 1)
            logits.append(jnp.squeeze(logit, axis=-1))
        return jnp.stack(logits, axis=0)                   # (T, B)
