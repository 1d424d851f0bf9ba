"""Serving / inference path.

New scope relative to the reference (inference lived in the Numerous
runtime).  Builds a jitted scorer closure over a trained
:class:`~rec_now_tpu.training.trainer.TrainState`: embedding lookup +
model forward, no optimizer state touched, donation-free (state is
shared with training or restored from checkpoint).

Example:
    scorer = build_scorer(trainer)
    logits = scorer(state, dense, sparse_ids)        # (B,) logits
    probs = jax.nn.sigmoid(logits)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def build_scorer(trainer) -> Callable:
    """Jitted scoring function for a Trainer's model + tables.

    Args:
        trainer: a :class:`rec_now_tpu.training.Trainer` (provides the
            model, feature config and table objects; parameters come
            from the state passed at call time).

    Returns:
        ``scorer(state, dense, sparse_ids) -> logits`` — (B,) for
        single-task models, (T, B) for multi-task.
    """
    fc, table, can_table, cfg = (trainer.fc, trainer.table,
                                 trainer.can_table, trainer.cfg)
    model = trainer.model

    @jax.jit
    def scorer(state, dense, sparse_ids):
        gids = fc.global_ids(sparse_ids)
        emb = table.lookup(state.table, gids)
        if can_table is not None:
            can_ids = sparse_ids[:, cfg.can_param_field] % fc.rows_per_field
            can_emb = can_table.lookup(state.can_table, can_ids)
            return model.apply(state.params, dense, emb, can_emb)
        return model.apply(state.params, dense, emb)

    return scorer


def export_table_rows(state, table, ids: jnp.ndarray) -> jnp.ndarray:
    """Fetch specific rows (e.g. to export hot embeddings for ANN
    retrieval indexes).  ids are global ids; returns (N, D)."""
    return table.lookup(state.table if hasattr(state, "table") else state,
                        jnp.asarray(ids, jnp.int32))
