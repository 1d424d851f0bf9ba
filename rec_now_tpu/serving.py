"""Serving / inference path.

New scope relative to the reference (inference lived in the Numerous
runtime).  Builds a jitted scorer closure over a trained
:class:`~rec_now_tpu.training.trainer.TrainState`: embedding lookup +
model forward, no optimizer state touched, donation-free (state is
shared with training or restored from checkpoint).

Two front ends:

* :func:`build_scorer` — raw f32/i32 inputs (simple integrations);
* :class:`WireScorer` — requests cross the host->HBM link in the SAME
  compressed wire the training loop uses (bit-packed ids + f16/u8
  dense, minus labels/groups/flags — training/wire.py), decoded inside
  the jitted scorer.  At serving batch sizes the link is the dominant
  latency term exactly as in training, so the ~2.3x byte cut carries
  over (numbers in BASELINE.md "Serving").

Example:
    scorer = build_scorer(trainer)
    logits = scorer(state, dense, sparse_ids)        # (B,) logits
    probs = jax.nn.sigmoid(logits)

    ws = WireScorer(trainer)
    logits = ws(state, dense, sparse_ids)            # packs + scores
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


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


class WireScorer:
    """Score through the compressed request wire.

    Packs (dense, sparse_ids) host-side with the training wire's
    encoders (bit-packed ids; f16 or per-request-affine u8 dense) and
    decodes inside the jitted forward — the request moves
    ``13 * d + words * 4`` bytes/example instead of 156 raw
    (85 -> 38/25 B/example at the standard layout).

    Args:
        trainer: a :class:`rec_now_tpu.training.Trainer`.
        dense_mode: 'f16' (default) or 'u8' (per-request affine —
            scoring-side quantization; AUC-neutral at training, see
            BASELINE.md).

    Call: ``scorer(state, dense, sparse_ids) -> logits`` ((B,) or
    (T, B)); ``pack`` / ``score_packed`` expose the two halves for
    pipelined serving loops.
    """

    def __init__(self, trainer, dense_mode: str = "f16"):
        from rec_now_tpu.training.wire import WireFormat, unpack_ids
        fc, cfg = trainer.fc, trainer.cfg
        self.wire = WireFormat(fc.num_sparse, fc.rows_per_field,
                               dense_mode=dense_mode, num_shards=1)
        wire = self.wire
        table, can_table = trainer.table, trainer.can_table
        model = trainer.model

        @jax.jit
        def score_packed(state, qdense, dense_scale, id_words):
            dense = wire.decode_dense(qdense, dense_scale)
            sparse_ids = unpack_ids(id_words, wire.num_sparse,
                                    wire.bits)
            gids = fc.global_ids(sparse_ids)
            emb = table.lookup(state.table, gids)
            if can_table is not None:
                can_ids = (sparse_ids[:, cfg.can_param_field]
                           % fc.rows_per_field)
                can_emb = can_table.lookup(state.can_table, can_ids)
                return model.apply(state.params, dense, emb, can_emb)
            return model.apply(state.params, dense, emb)

        self.score_packed = score_packed

    def pack(self, dense: np.ndarray, sparse_ids: np.ndarray):
        """Host-side request packing -> (qdense, scale, id_words)."""
        return self.wire.pack_request(dense, sparse_ids)

    def __call__(self, state, dense, sparse_ids) -> jnp.ndarray:
        return self.score_packed(state, *self.pack(dense, sparse_ids))


def _check_can_match(trainer, has_can: bool, where: str) -> None:
    """Descriptive error when CAN-table presence disagrees.

    Without this, restoring a CAN checkpoint with a non-CAN trainer
    fails deep inside placement with an opaque AttributeError on
    ``table.table_sharding`` — and the reverse direction (CAN trainer,
    non-CAN checkpoint) silently produced ``can_table=None`` states
    whose first lookup crashes (ADVICE r4).
    """
    trainer_can = trainer.can_table is not None
    if trainer_can != has_can:
        raise ValueError(
            f"CAN-table mismatch: {where} "
            f"{'has' if has_can else 'lacks'} a co-action table but the "
            f"trainer (can_param_field="
            f"{trainer.cfg.can_param_field!r}) "
            f"{'expects' if trainer_can else 'does not expect'} one; "
            "use a trainer whose TrainerConfig.can_param_field matches "
            "the exported model")


def export_serving(directory: str, state, trainer=None) -> None:
    """Save the inference-only subset of a train state.

    Drops every optimizer slot (dense opt state, Adagrad accumulator /
    Adam moments) — about half (Adagrad) to a quarter (Adam) of the
    bytes of a full training checkpoint, which matters when the table
    dominates (GBs per shard).  Load with :func:`load_serving`; the
    result drives :func:`build_scorer` / :class:`WireScorer` directly.

    Args:
        directory: checkpoint directory.
        state: the :class:`TrainState` to strip and save.
        trainer: optional; when given, the state's table layout is
            validated against the trainer's before writing (catches
            exporting a CAN state with a non-CAN trainer and vice
            versa at save time rather than at load).
    """
    import orbax.checkpoint as ocp
    if trainer is not None:
        _check_can_match(trainer, has_can=state.can_table is not None,
                         where="export_serving(state)")
    payload = {"params": state.params, "table": state.table.table}
    if state.can_table is not None:
        payload["can_table"] = state.can_table.table
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(directory), "serving"),
               payload)
    ckptr.wait_until_finished()
    ckptr.close()


def load_serving(directory: str, trainer):
    """Restore an :func:`export_serving` checkpoint for scoring.

    Returns a state whose ``params`` / ``table`` / ``can_table`` fields
    satisfy the scorer interface (the table states carry a placeholder
    accumulator — lookups never read it).  Placement: tables get the
    trainer's row sharding, params are replicated.
    """
    import orbax.checkpoint as ocp
    from rec_now_tpu.embedding.sharded import ShardedTableState
    from rec_now_tpu.training.trainer import TrainState
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(
        os.path.join(os.path.abspath(directory), "serving"))
    ckptr.close()
    _check_can_match(trainer, has_can="can_table" in payload,
                     where="checkpoint payload")
    repl = jax.sharding.NamedSharding(
        trainer.mesh, jax.sharding.PartitionSpec())
    dummy_acc = jnp.zeros((1, 1), jnp.float32)

    def table_state(arr, table):
        return ShardedTableState(
            table=jax.device_put(arr, table.table_sharding),
            accumulator=dummy_acc)
    can = None
    if "can_table" in payload:
        can = table_state(payload["can_table"], trainer.can_table)
    return TrainState(
        params=jax.device_put(payload["params"], repl),
        opt_state=None,
        table=table_state(payload["table"], trainer.table),
        step=jnp.zeros((), jnp.int32),
        can_table=can)


def export_table_rows(state, table, ids: jnp.ndarray) -> jnp.ndarray:
    """Fetch specific rows (e.g. to export hot embeddings for ANN
    retrieval indexes).  ids are global ids; returns (N, D)."""
    return table.lookup(state.table if hasattr(state, "table") else state,
                        jnp.asarray(ids, jnp.int32))
