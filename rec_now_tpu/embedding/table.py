"""Single-chip embedding table with sparse (rows-touched-only) updates.

New scope relative to the reference: rec_now delegates all embedding
storage to the external Numerous parameter server and only consumes an
``embedding_func`` callback (rec_now/rec_block/embedding_util.py:292,310).
This module is the TPU-native replacement for that PS boundary on one
chip; ``rec_now_tpu.embedding.sharded`` extends it across a mesh.

Design:

* the table is a plain (V, D) array in the training state — flat HBM,
  gathers/scatters are native TPU ops;
* lookups are activations, not parameter reads: the train step gathers
  rows, differentiates with respect to the *gathered* embeddings
  (B*C, D), and applies the sparse update itself with ``.at[ids].add``
  scatters.  The (V, D) table never appears in a dense gradient tree, so
  step cost scales with rows touched, not vocabulary size;
* optimizer: row-wise Adagrad (the de-facto PS standard for embeddings).
  Duplicate ids in a batch accumulate via scatter-add before the update,
  matching ``unsorted_segment_sum`` gradient semantics in TF;
* buffers are donated by the jitted train step, so the scatter updates
  the table in place.

Symbols: V vocab rows, D embedding dim, N looked-up ids.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmbeddingTableState(NamedTuple):
    """Pytree state of one embedding table."""
    table: jnp.ndarray         # (V, D)
    accumulator: jnp.ndarray   # (V,) row-wise adagrad accumulator


class EmbeddingTable:
    """Functional single-chip embedding table.

    Example:
        table = EmbeddingTable(vocab_size=1_000_000, dim=16)
        state = table.init(jax.random.PRNGKey(0))
        emb = table.lookup(state, ids)            # inside the fwd pass
        ...
        state = table.apply_grads(state, ids, grad_emb, lr=0.05)
    """

    def __init__(self, vocab_size: int, dim: int,
                 initializer_scale: float = 1e-3,
                 initial_accumulator: float = 0.1,
                 dtype=jnp.float32):
        self.vocab_size = vocab_size
        self.dim = dim
        self.initializer_scale = initializer_scale
        self.initial_accumulator = initial_accumulator
        self.dtype = dtype

    def init(self, key: jax.Array) -> EmbeddingTableState:
        """Initialize table rows ~ U(-scale, scale), accumulator const."""
        table = jax.random.uniform(
            key, (self.vocab_size, self.dim), self.dtype,
            -self.initializer_scale, self.initializer_scale)
        acc = jnp.full((self.vocab_size,), self.initial_accumulator,
                       self.dtype)
        return EmbeddingTableState(table=table, accumulator=acc)

    def lookup(self, state: EmbeddingTableState,
               ids: jnp.ndarray) -> jnp.ndarray:
        """Gather rows: int ids of any shape -> ids.shape + (D,)."""
        return jnp.take(state.table, ids, axis=0)

    def embedding_func(self, state: EmbeddingTableState):
        """Closure with the reference's ``embedding_func`` contract
        (embedding_util.py:292): id vector -> (N, D)."""
        return lambda ids: self.lookup(state, ids)

    def apply_grads(self, state: EmbeddingTableState,
                    ids: jnp.ndarray,
                    grads: jnp.ndarray,
                    lr: float,
                    valid_mask: Optional[jnp.ndarray] = None
                    ) -> EmbeddingTableState:
        """Row-wise Adagrad update on the touched rows only.

        Args:
            state: current table state.
            ids: (N,) looked-up row ids (duplicates fine).
            grads: (N, D) gradients w.r.t. the gathered embeddings.
            lr: learning rate.
            valid_mask: optional (N,) bool; False rows are no-ops (used
                for padding ids routed to row 0).

        Returns:
            Updated state.  Under jit with donated state the scatters
            run in place.
        """
        ids = jnp.reshape(ids, (-1,))
        n = ids.shape[0]
        grads = jnp.reshape(grads, (n, -1)).astype(self.dtype)
        if valid_mask is not None:
            grads = grads * jnp.reshape(valid_mask, (-1, 1)).astype(
                self.dtype)

        # Deduplicate ids with a static-shape sort (no jnp.unique): sum
        # duplicate rows' grads so Adagrad sees one update per row —
        # same semantics as TF's unsorted_segment_sum-then-apply, at
        # O(N log N + N*D); the (V, D) table is only touched at the
        # scattered rows.
        order = jnp.argsort(ids)
        sid = ids[order]                                   # (N,) sorted
        sg = grads[order]                                  # (N, D)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1      # (N,) segment idx
        row_grad = jax.ops.segment_sum(sg, seg, num_segments=n)  # (N, D)
        # representative row id per segment; empty tail segments stay 0
        # and carry zero grads, so their scatter is a no-op.
        rep = jnp.zeros((n,), ids.dtype).at[seg].set(sid)
        seg_valid = jnp.zeros((n,), self.dtype).at[seg].set(1.0)

        sq = jnp.mean(jnp.square(row_grad), axis=1) * seg_valid  # (N,)
        # rep rows are unique (deduped); flag for vectorized scatters.
        # (not sorted: empty tail segments carry rep=0.)
        new_acc = state.accumulator.at[rep].add(sq)
        scale = (lr / jnp.sqrt(new_acc[rep]))[:, None] * seg_valid[:, None]
        new_table = state.table.at[rep].add(-scale * row_grad)
        return EmbeddingTableState(table=new_table, accumulator=new_acc)
