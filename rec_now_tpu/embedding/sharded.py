"""Row-sharded embedding table across a TPU mesh.

The TPU-native replacement for the reference's external parameter server
(the ``embedding_func`` boundary, rec_now/rec_block/embedding_util.py:310
— SURVEY.md §3.3 marks that line as "the future all-to-all path").

Layout: rows are mod-sharded over the ``data`` mesh axis — global row
``r`` lives on shard ``r % n`` at local index ``r // n``.  Mod (not
block) sharding load-balances the usual power-law id distribution.
Note the physical (V, D) array is therefore an *interleaved* view of the
id space: id ``r`` is stored at physical row ``(r % n) * (V/n) + r // n``
(:meth:`ShardedEmbeddingTable.physical_row`).  All access goes through
:meth:`lookup` / :meth:`apply_grads`, which own the mapping.

Lookup (inside ``shard_map``, per shard):

    1. ``all_gather(local_ids)``   -> every shard sees the global id set
       (ids are int32 — the cheap direction);
    2. local gather of owned rows, others masked to zero;
    3. ``psum_scatter(partial)``   -> each shard receives the summed
       (exactly-one-owner) embeddings for its own batch rows.

Both collectives ride ICI and are static-shape; there are no capacity
bounds to overflow, unlike bucketed all-to-all designs.  The payload is
``B*C*D / n`` floats per hop with an n-fold ICI multiplier on step 2's
mask-sum — the robust v1 choice; a dedup + capacity-bounded
``all_to_all`` exchange is the planned optimization once profiling
justifies it (it only wins when B*C >> unique ids per shard).

Backward: the same path is differentiable (``psum_scatter`` transposes
to ``all_gather`` and vice versa), but like the single-chip table we
never differentiate w.r.t. the (V, D) shard — the train step takes grads
w.r.t. gathered embeddings and calls :meth:`apply_grads`, which
all-gathers the (B*C, D) grad rows and lets each shard scatter-add the
rows it owns into its local Adagrad state.

Symbols: V global rows, Vl = V/n local rows, D dim, n shards,
B*C flattened ids per shard.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rec_now_tpu.parallel.mesh import DATA_AXIS


class ShardedTableState(NamedTuple):
    """Per-shard table state; leading axis is sharded over the mesh.

    ``accumulator`` is the Adagrad slot (V,); for the Adam optimizer
    the (V, D) moment slots ``m``/``v`` are populated and a scalar
    ``count`` drives bias correction (lazy Adam: moments decay only on
    touched rows, matching TF's sparse Adam behavior for
    IndexedSlices grads).
    """
    table: jnp.ndarray        # (V, D) global view, rows mod-sharded
    accumulator: jnp.ndarray  # (V,) adagrad slot (zeros under adam)
    m: Optional[jnp.ndarray] = None      # (V, D) adam first moment
    v: Optional[jnp.ndarray] = None      # (V, D) adam second moment
    count: Optional[jnp.ndarray] = None  # () adam step counter


class ShardedEmbeddingTable:
    """Mod-sharded embedding table with collective lookup.

    All methods take/return *global* arrays with shardings attached; the
    collective internals live in ``shard_map``-decorated kernels.
    """

    def __init__(self, vocab_size: int, dim: int, mesh: Mesh,
                 axis_name: str = DATA_AXIS,
                 initializer_scale: float = 1e-3,
                 initial_accumulator: float = 0.1,
                 optimizer: str = "adagrad",
                 beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-7,
                 dtype=jnp.float32):
        if optimizer not in ("adagrad", "adam"):
            raise ValueError(f"unknown optimizer {optimizer!r}")
        self.mesh = mesh
        self.axis_name = axis_name
        self.num_shards = mesh.shape[axis_name]
        if vocab_size % self.num_shards != 0:
            vocab_size += self.num_shards - vocab_size % self.num_shards
        self.vocab_size = vocab_size
        self.dim = dim
        self.initializer_scale = initializer_scale
        self.initial_accumulator = initial_accumulator
        self.optimizer = optimizer
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.dtype = dtype

    # -- shardings ---------------------------------------------------------
    @property
    def table_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name, None))

    @property
    def acc_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name))

    @property
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name))

    def physical_row(self, ids):
        """Physical row index of global id(s) in the (V, D) array."""
        ids = jnp.asarray(ids)
        vl = self.vocab_size // self.num_shards
        return (ids % self.num_shards) * vl + ids // self.num_shards

    # -- init --------------------------------------------------------------
    def init(self, key: jax.Array) -> ShardedTableState:
        """Initialize the sharded state (sharding-constrained under jit)."""
        adam = self.optimizer == "adam"
        repl = NamedSharding(self.mesh, P())

        def _init(key):
            table = jax.random.uniform(
                key, (self.vocab_size, self.dim), self.dtype,
                -self.initializer_scale, self.initializer_scale)
            acc = jnp.full((self.vocab_size,), self.initial_accumulator,
                           self.dtype)
            table = jax.lax.with_sharding_constraint(
                table, self.table_sharding)
            acc = jax.lax.with_sharding_constraint(acc, self.acc_sharding)
            if adam:
                m = jax.lax.with_sharding_constraint(
                    jnp.zeros((self.vocab_size, self.dim), self.dtype),
                    self.table_sharding)
                v = jax.lax.with_sharding_constraint(
                    jnp.zeros((self.vocab_size, self.dim), self.dtype),
                    self.table_sharding)
                return ShardedTableState(table=table, accumulator=acc,
                                         m=m, v=v,
                                         count=jnp.zeros((), jnp.int32))
            return ShardedTableState(table=table, accumulator=acc)

        out_sh = ShardedTableState(
            table=self.table_sharding, accumulator=self.acc_sharding,
            m=self.table_sharding if adam else None,
            v=self.table_sharding if adam else None,
            count=repl if adam else None)
        return jax.jit(_init, out_shardings=out_sh)(key)

    # -- lookup ------------------------------------------------------------
    def lookup(self, state: ShardedTableState,
               ids: jnp.ndarray) -> jnp.ndarray:
        """Collective lookup: batch-sharded ids -> batch-sharded rows.

        Args:
            state: sharded table state.
            ids: int32 global row ids, shape (B, ...) sharded on axis 0.

        Returns:
            ids.shape + (D,) embeddings, batch-sharded like ``ids``.
        """
        n = self.num_shards
        axis = self.axis_name
        orig_shape = ids.shape

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=P(axis, None))
        def _lookup(table_local, flat_ids_local):
            # (Vl, D), (b,) -> (b, D)
            my = jax.lax.axis_index(axis)
            all_ids = jax.lax.all_gather(flat_ids_local, axis,
                                         tiled=True)       # (B,)
            owner = all_ids % n
            local_rows = jnp.where(owner == my, all_ids // n, 0)
            rows = jnp.take(table_local, local_rows, axis=0)  # (B, D)
            rows = rows * (owner == my).astype(rows.dtype)[:, None]
            # exactly one owner contributes per id -> psum_scatter back
            # to the id's home shard.
            return jax.lax.psum_scatter(rows, axis, scatter_dimension=0,
                                        tiled=True)         # (b, D)

        flat = ids.reshape(-1).astype(jnp.int32)
        # pad to a multiple of the shard count (query sizes are user
        # controlled; eval/debug lookups are often tiny)
        padded = -flat.shape[0] % n
        if padded:
            flat = jnp.concatenate([flat, jnp.zeros((padded,), flat.dtype)])
        out = _lookup(state.table, flat)
        if padded:
            out = out[:-padded]
        return out.reshape(orig_shape + (self.dim,))

    # -- sparse update -----------------------------------------------------
    def apply_grads(self, state: ShardedTableState,
                    ids: jnp.ndarray,
                    grads: jnp.ndarray,
                    lr: float,
                    valid_mask: Optional[jnp.ndarray] = None,
                    dedup: bool = True) -> ShardedTableState:
        """Row-wise Adagrad on owned rows, from batch-sharded grads.

        Args:
            state: sharded table state.
            ids: (B, ...) global ids as passed to lookup (batch-sharded).
            grads: ids.shape + (D,) grads w.r.t. the gathered embeddings.
            lr: learning rate.
            valid_mask: optional bool mask matching ``ids``.

        Returns:
            Updated state (same shardings; donate for in-place).
        """
        n = self.num_shards
        axis = self.axis_name
        if self.optimizer == "adam":
            return self._apply_grads_adam(state, ids, grads, lr,
                                          valid_mask, dedup)

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(axis, None), P(axis), P(axis), P(axis, None)),
            out_specs=(P(axis, None), P(axis)))
        def _update(table_local, acc_local, flat_ids_local, flat_grads_local):
            my = jax.lax.axis_index(axis)
            all_ids = jax.lax.all_gather(flat_ids_local, axis,
                                         tiled=True)        # (B,)
            all_grads = jax.lax.all_gather(flat_grads_local, axis,
                                           tiled=True)      # (B, D)
            owner = all_ids % n
            mine = owner == my
            local_rows = jnp.where(mine, all_ids // n, 0)
            g = all_grads * mine.astype(all_grads.dtype)[:, None]

            if not dedup:
                # sort-free per-occurrence Adagrad (classic PS scatter
                # semantics, deterministic): two scatter passes — first
                # accumulate all squared-grad contributions, then scale
                # every occurrence by the fully-updated accumulator.
                # Avoids the O(N log N) TPU sort of the exact-dedup
                # path; numerics differ only when a row repeats within
                # one batch (each occurrence divides by the same
                # post-batch accumulator instead of the summed grad).
                big = jnp.int32(2 ** 30)
                rows = jnp.where(mine, local_rows, big)    # OOB dropped
                sq = jnp.mean(jnp.square(g), axis=1)
                new_acc = acc_local.at[rows].add(sq)
                denom = jnp.sqrt(new_acc[jnp.minimum(
                    rows, acc_local.shape[0] - 1)])
                scaled = (lr / denom)[:, None] * g
                new_table = table_local.at[rows].add(-scaled)
                return new_table, new_acc

            # dedup duplicate rows (sort-based, static shape) so Adagrad
            # sees one accumulated grad per row — mirrors
            # rec_now_tpu/embedding/table.py.  Foreign ids become the
            # BIG sentinel: they sort to the back, their grads are
            # already zeroed, and their scatters fall out of bounds and
            # are dropped by XLA's scatter semantics.
            big = jnp.int32(2 ** 30)
            eff = jnp.where(mine, local_rows, big)
            order = jnp.argsort(eff)
            sid = eff[order]                               # (B,) sorted
            sg = g[order]                                  # (B, D)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg = jnp.cumsum(first.astype(jnp.int32)) - 1
            num = sid.shape[0]
            row_grad = jax.ops.segment_sum(sg, seg, num_segments=num)
            rep = jnp.full((num,), big, sid.dtype).at[seg].set(sid)
            seg_valid = (rep < big).astype(table_local.dtype)

            sq = jnp.mean(jnp.square(row_grad), axis=1) * seg_valid
            # rep is sorted-unique (sentinels at the tail): telling XLA
            # lets the TPU scatter/gather vectorize instead of
            # serializing on possible duplicates
            new_acc = acc_local.at[rep].add(
                sq, indices_are_sorted=True, unique_indices=True)
            denom = jnp.sqrt(jnp.clip(new_acc, 1e-12)[
                jnp.minimum(rep, acc_local.shape[0] - 1)])
            scale = (lr / denom)[:, None] * seg_valid[:, None]
            new_table = table_local.at[rep].add(
                -scale * row_grad, indices_are_sorted=True,
                unique_indices=True)
            return new_table, new_acc

        flat_ids = ids.reshape(-1).astype(jnp.int32)
        flat_grads = grads.reshape(flat_ids.shape[0], -1).astype(self.dtype)
        if valid_mask is not None:
            flat_grads = flat_grads * valid_mask.reshape(-1, 1).astype(
                self.dtype)
        padded = -flat_ids.shape[0] % n
        if padded:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.zeros((padded,), flat_ids.dtype)])
            flat_grads = jnp.concatenate(
                [flat_grads,
                 jnp.zeros((padded, flat_grads.shape[1]), flat_grads.dtype)])
        new_table, new_acc = _update(state.table, state.accumulator,
                                     flat_ids, flat_grads)
        return state._replace(table=new_table, accumulator=new_acc)

    def _apply_grads_adam(self, state: ShardedTableState,
                          ids: jnp.ndarray, grads: jnp.ndarray, lr: float,
                          valid_mask: Optional[jnp.ndarray],
                          dedup: bool) -> ShardedTableState:
        """Lazy row-wise sparse Adam on owned rows (dedup only).

        Moments decay only for touched rows (TF sparse-Adam semantics);
        bias correction uses the global step counter.
        """
        del dedup  # adam requires the deduplicated row grads
        n = self.num_shards
        axis = self.axis_name
        b1, b2, eps = self.beta1, self.beta2, self.eps

        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(axis), P(axis, None), P()),
            out_specs=(P(axis, None), P(axis, None), P(axis, None)))
        def _update(table_local, m_local, v_local,
                    flat_ids_local, flat_grads_local, t):
            my = jax.lax.axis_index(axis)
            all_ids = jax.lax.all_gather(flat_ids_local, axis, tiled=True)
            all_grads = jax.lax.all_gather(flat_grads_local, axis,
                                           tiled=True)
            owner = all_ids % n
            mine = owner == my
            local_rows = jnp.where(mine, all_ids // n, 0)
            g = all_grads * mine.astype(all_grads.dtype)[:, None]

            big = jnp.int32(2 ** 30)
            eff = jnp.where(mine, local_rows, big)
            order = jnp.argsort(eff)
            sid = eff[order]
            sg = g[order]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg = jnp.cumsum(first.astype(jnp.int32)) - 1
            num = sid.shape[0]
            row_grad = jax.ops.segment_sum(sg, seg, num_segments=num)
            rep = jnp.full((num,), big, sid.dtype).at[seg].set(sid)
            seg_valid = (rep < big).astype(table_local.dtype)
            safe_rep = jnp.minimum(rep, table_local.shape[0] - 1)

            m_rows = m_local[safe_rep]
            v_rows = v_local[safe_rep]
            m_new = b1 * m_rows + (1 - b1) * row_grad
            v_new = b2 * v_rows + (1 - b2) * jnp.square(row_grad)
            tf_ = t.astype(table_local.dtype)
            mhat = m_new / (1 - b1 ** tf_)
            vhat = v_new / (1 - b2 ** tf_)
            update = lr * mhat / (jnp.sqrt(vhat) + eps)
            # OOB sentinel rows are dropped by scatter semantics
            new_m = m_local.at[rep].set(
                m_new, indices_are_sorted=True, unique_indices=True)
            new_v = v_local.at[rep].set(
                v_new, indices_are_sorted=True, unique_indices=True)
            new_table = table_local.at[rep].add(
                -update * seg_valid[:, None], indices_are_sorted=True,
                unique_indices=True)
            return new_table, new_m, new_v

        flat_ids = ids.reshape(-1).astype(jnp.int32)
        flat_grads = grads.reshape(flat_ids.shape[0], -1).astype(self.dtype)
        if valid_mask is not None:
            flat_grads = flat_grads * valid_mask.reshape(-1, 1).astype(
                self.dtype)
        padded = -flat_ids.shape[0] % n
        if padded:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.zeros((padded,), flat_ids.dtype)])
            flat_grads = jnp.concatenate(
                [flat_grads,
                 jnp.zeros((padded, flat_grads.shape[1]),
                           flat_grads.dtype)])
        new_count = state.count + 1
        new_table, new_m, new_v = _update(
            state.table, state.m, state.v, flat_ids, flat_grads,
            new_count)
        return ShardedTableState(table=new_table,
                                 accumulator=state.accumulator,
                                 m=new_m, v=new_v, count=new_count)
