"""Row-sharded embedding table across a TPU mesh.

The TPU-native replacement for the reference's external parameter server
(the ``embedding_func`` boundary, rec_now/rec_block/embedding_util.py:310
— SURVEY.md §3.3 marks that line as "the future all-to-all path").

Sharding: rows are mod-sharded over the ``data`` mesh axis — global row
``r`` lives on shard ``r % n`` at local index ``r // n``.  Mod (not
block) sharding load-balances the usual power-law id distribution.

Physical layout — **lane packing**: TPU gathers/scatters move whole
128-lane lines; a (V, 16) table wastes 7/8 of every line and measured
~24x slower gathers / ~8x slower scatters than a 128-wide layout.  So
``pack = 128 // D`` logical rows are stored per physical row: the local
table is ``(Vl / pack, pack * D)`` and logical local row ``l`` occupies
lanes ``[(l % pack) * D, (l % pack + 1) * D)`` of physical row
``l // pack``.  Lookups fetch the packed line and select the slice;
updates expand (row, D) values into one-hot-masked (pack * D) lines and
scatter-*add* — slices within a line are disjoint, so colliding logical
rows in one physical row combine correctly.  The Adagrad slot packs the
same way as ``(Vl / pack, pack)``.

Lookup has two exchange strategies (``route_mode``):

**allgather** (default for small meshes) — per shard:

    1. ``all_gather(local_ids)``   -> every shard sees the global id set
       (ids are int32 — the cheap direction);
    2. local packed gather of owned rows, others masked to zero;
    3. ``psum_scatter(partial)``   -> each shard receives the summed
       (exactly-one-owner) embeddings for its own batch rows.

No capacity bounds, but every shard gathers all B global rows and the
row exchange moves O((n-1)·b·D) per shard — redundant work that grows
with the mesh.

**routed** (default for n >= 4) — the TPU rendering of the reference's
unique-before-lookup idiom (rec_now/rec_block/embedding_util.py:306-311,
``tf.unique`` before ``embedding_func``), built from
:mod:`rec_now_tpu.embedding.exchange`:

    1. sort-dedup the shard's b ids (static shape, BIG sentinels);
    2. bucket unique ids by owner (``id % n``), static per-owner
       capacity ``cap`` (2·b/n by default), rare spill to a small
       all-gather overflow lane;
    3. ``all_to_all`` ids -> owner gathers its rows -> ``all_to_all``
       rows back -> un-dedup to the original order.

Per-shard row payload becomes O(cap·n·D) ≈ O(2·b·D) instead of
O((n-1)·b·D): the advantage grows linearly with the mesh.  Updates
route the same way with grads pre-summed per unique id at the source
(the owner re-dedups across sources).  Per-occurrence Adagrad
(``dedup=False``) keeps the allgather path — per-occurrence semantics
are incompatible with source-side dedup.

Updates never densify over the vocabulary: the train step passes grads
w.r.t. the *gathered* rows; each shard scatter-adds the rows it owns
into its local optimizer state (row-wise Adagrad, or lazy sparse Adam
with (V, D)-shaped moment slots).

Symbols: V global rows, Vl = V/n local rows, D dim, n shards,
P = pack, B flattened ids.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rec_now_tpu.embedding import exchange
from rec_now_tpu.parallel.mesh import DATA_AXIS

_BIG = jnp.int32(2 ** 30)   # sentinel local row: scatters drop OOB

# Compiled collective programs, shared across ShardedEmbeddingTable
# instances with identical configuration.  The shard_map bodies below
# are (re)built per call; without this cache every *eager* lookup /
# update re-traces and re-compiles (~10 s per call on a small CPU host,
# and once per Python table object on TPU).  Keyed by the full semantic
# config (mesh included), so equal-config instances share one program;
# jax.jit layers its own shape-keyed cache on top.
_JIT_CACHE: dict = {}


class ShardedTableState(NamedTuple):
    """Per-shard table state; leading axis is sharded over the mesh.

    All arrays use the lane-packed physical layout (module docstring).
    ``accumulator`` is the Adagrad slot; under Adam the moment slots
    ``m``/``v`` are populated and ``count`` drives bias correction
    (lazy Adam: moments decay only on touched rows, matching TF's
    sparse-Adam behavior for IndexedSlices grads).
    """
    table: jnp.ndarray        # (V/P, P*D)
    accumulator: jnp.ndarray  # (V/P, P) adagrad slot (zeros under adam)
    m: Optional[jnp.ndarray] = None      # (V/P, P*D) adam first moment
    v: Optional[jnp.ndarray] = None      # (V/P, P*D) adam second moment
    count: Optional[jnp.ndarray] = None  # () adam step counter


class ShardedEmbeddingTable:
    """Mod-sharded, lane-packed embedding table with collective lookup.

    All methods take/return *global* arrays with shardings attached; the
    collective internals live in ``shard_map``-decorated kernels.
    """

    # dense-apply is chosen automatically below this local-shard size;
    # its cost is a few full-table passes (linear in V/n) vs the sparse
    # path's sort + scatters (linear-ish in ids but with a ~14x
    # per-random-row tax on TPU), so small/mid tables prefer dense.
    DENSE_UPDATE_MAX_BYTES = 512 * 1024 * 1024

    def __init__(self, vocab_size: int, dim: int, mesh: Mesh,
                 axis_name: str = DATA_AXIS,
                 initializer_scale: float = 1e-3,
                 initial_accumulator: float = 0.1,
                 optimizer: str = "adagrad",
                 beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-7,
                 update_mode: str = "auto",
                 route_mode: str = "auto",
                 route_cap_factor: float = 2.0,
                 route_ov_cap: Optional[int] = None,
                 dtype=jnp.float32):
        if optimizer not in ("adagrad", "adam"):
            raise ValueError(f"unknown optimizer {optimizer!r}")
        if update_mode not in ("auto", "sparse", "dense"):
            raise ValueError(f"unknown update_mode {update_mode!r}")
        if route_mode not in ("auto", "allgather", "routed"):
            raise ValueError(f"unknown route_mode {route_mode!r}")
        self.mesh = mesh
        self.axis_name = axis_name
        self.num_shards = mesh.shape[axis_name]
        self.dim = dim
        self.pack = 128 // dim if (dim < 128 and 128 % dim == 0) else 1
        granule = self.num_shards * self.pack
        if vocab_size % granule != 0:
            vocab_size += granule - vocab_size % granule
        self.vocab_size = vocab_size
        self.initializer_scale = initializer_scale
        self.initial_accumulator = initial_accumulator
        self.optimizer = optimizer
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.dtype = dtype
        local_bytes = (self.vocab_size // self.num_shards) * dim \
            * jnp.dtype(dtype).itemsize
        if update_mode == "auto":
            # the dense pass streams table+state+grads: ~3 wide buffers
            # for adagrad but ~7 for adam (t/m/v in+out + g), so scale
            # the gate by the actually-streamed bytes per table byte.
            streamed = local_bytes * (7 if optimizer == "adam" else 3) // 3
            update_mode = ("dense"
                           if streamed <= self.DENSE_UPDATE_MAX_BYTES
                           else "sparse")
        self.update_mode = update_mode
        if route_mode == "auto":
            # routed beats allgather once the redundant (n-1)x row
            # exchange outweighs the dedup sorts; n=1 has no exchange
            route_mode = "routed" if self.num_shards >= 4 else "allgather"
        elif route_mode == "routed" and self.num_shards == 1:
            route_mode = "allgather"     # no exchange to route
        self.route_mode = route_mode
        self.route_cap_factor = route_cap_factor
        self.route_ov_cap = route_ov_cap

    def _config_key(self) -> tuple:
        """Everything that changes the compiled collective programs."""
        return (self.mesh, self.axis_name, self.vocab_size, self.dim,
                self.pack, self.optimizer, self.beta1, self.beta2,
                self.eps, self.update_mode, self.route_mode,
                self.route_cap_factor, self.route_ov_cap,
                str(jnp.dtype(self.dtype)))

    def _jitted(self, name: str, builder, *extra):
        """Fetch (or build + jit) a cached collective program.

        ``builder()`` returns the shard_map-decorated callable; ``extra``
        carries static values baked into the closure (lr, dedup).
        """
        key = (name, self._config_key()) + extra
        fn = _JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(builder())
            _JIT_CACHE[key] = fn
        return fn

    # -- shardings ---------------------------------------------------------
    @property
    def table_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name, None))

    @property
    def acc_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name, None))

    @property
    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.axis_name))

    # -- packed-layout helpers (operate on shard-local arrays) -------------
    def _fetch_rows(self, packed: jnp.ndarray,
                    local_rows: jnp.ndarray) -> jnp.ndarray:
        """(V/P, P*D) packed, (N,) local rows -> (N, D) values."""
        if self.pack == 1:
            return jnp.take(packed, local_rows, axis=0)
        pr = local_rows // self.pack
        off = local_rows % self.pack
        lines = jnp.take(packed, pr, axis=0)              # (N, P*D)
        lines = lines.reshape(-1, self.pack, self.dim)
        # one-hot select, not take_along_axis: the latter lowers to a
        # per-element gather on TPU (~1.5ms slower at 213k rows)
        oh = jax.nn.one_hot(off, self.pack, dtype=lines.dtype)
        return jnp.einsum("npd,np->nd", lines, oh)        # (N, D)

    def _fetch_scalars(self, packed: jnp.ndarray,
                       local_rows: jnp.ndarray) -> jnp.ndarray:
        """(V/P, P) packed scalars, (N,) rows -> (N,) values."""
        if self.pack == 1:
            return jnp.take(packed[:, 0], local_rows, axis=0)
        pr = local_rows // self.pack
        off = local_rows % self.pack
        lines = jnp.take(packed, pr, axis=0)              # (N, P)
        oh = jax.nn.one_hot(off, self.pack, dtype=lines.dtype)
        return jnp.sum(lines * oh, axis=1)

    def _expand(self, local_rows: jnp.ndarray, vals: jnp.ndarray):
        """(N,) rows, (N, D) vals -> (physical rows (N,), lines (N, P*D)).

        Scatter-*adding* the lines applies ``vals`` to each logical
        row's disjoint lane slice; sentinel rows land out of bounds and
        are dropped.
        """
        pr = local_rows // self.pack
        if self.pack == 1:
            return pr, vals
        off = local_rows % self.pack
        oh = jax.nn.one_hot(off, self.pack, dtype=vals.dtype)  # (N, P)
        lines = (oh[:, :, None] * vals[:, None, :]).reshape(
            vals.shape[0], -1)                            # (N, P*D)
        return pr, lines

    def _expand_scalar(self, local_rows: jnp.ndarray, vals: jnp.ndarray):
        """(N,) rows, (N,) scalars -> (physical rows, lines (N, P))."""
        pr = local_rows // self.pack
        if self.pack == 1:
            return pr, vals[:, None]
        off = local_rows % self.pack
        oh = jax.nn.one_hot(off, self.pack, dtype=vals.dtype)
        return pr, oh * vals[:, None]

    def debug_read(self, packed_global, global_ids):
        """Host-side logical-row reader for tests/debugging.

        Args:
            packed_global: a state array ((V/P, P*D) table/m/v or
                (V/P, P) accumulator) as host-readable values.
            global_ids: int ids.

        Returns:
            (N, D) rows or (N,) scalars in logical id order.
        """
        import numpy as np
        arr = np.asarray(packed_global)
        ids = np.asarray(global_ids).reshape(-1)
        n, pack = self.num_shards, self.pack
        vlp = self.vocab_size // n // pack        # local physical rows
        shard = ids % n
        local = ids // n
        pr = shard * vlp + local // pack          # global physical row
        off = local % pack
        lines = arr[pr]
        if arr.shape[1] == pack * self.dim:
            return lines.reshape(len(ids), pack, self.dim)[
                np.arange(len(ids)), off]
        return lines.reshape(len(ids), pack)[np.arange(len(ids)), off]

    # -- init --------------------------------------------------------------
    def init(self, key: jax.Array) -> ShardedTableState:
        """Initialize the sharded state (sharding-constrained under jit)."""
        adam = self.optimizer == "adam"
        repl = NamedSharding(self.mesh, P())
        vp = self.vocab_size // self.pack
        width = self.pack * self.dim

        def _init(key):
            table = jax.random.uniform(
                key, (vp, width), self.dtype,
                -self.initializer_scale, self.initializer_scale)
            acc = jnp.full((vp, self.pack), self.initial_accumulator,
                           self.dtype)
            table = jax.lax.with_sharding_constraint(
                table, self.table_sharding)
            acc = jax.lax.with_sharding_constraint(acc, self.acc_sharding)
            if adam:
                m = jax.lax.with_sharding_constraint(
                    jnp.zeros((vp, width), self.dtype),
                    self.table_sharding)
                v = jax.lax.with_sharding_constraint(
                    jnp.zeros((vp, width), self.dtype),
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
        cache_key = ("init", self._config_key(),
                     self.initializer_scale, self.initial_accumulator)
        fn = _JIT_CACHE.get(cache_key)
        if fn is None:
            fn = jax.jit(_init, out_shardings=out_sh)
            _JIT_CACHE[cache_key] = fn
        return fn(key)

    # -- routed-exchange plumbing -------------------------------------------
    def _route_caps(self, b: int) -> Tuple[int, int]:
        """Static (cap, ov_cap) bucket sizes for b flat ids per shard.

        cap = per-owner all_to_all bucket; ov_cap = all-gather overflow
        lane for skew beyond ``route_cap_factor`` x the uniform share.
        """
        n = self.num_shards
        cap = int(-(-self.route_cap_factor * b // n))
        cap = max(8, -(-cap // 8) * 8)
        ov_cap = self.route_ov_cap
        if ov_cap is None:
            ov_cap = max(8, b // 16)
        ov_cap = max(8, -(-ov_cap // 8) * 8)
        return cap, ov_cap

    def exchange_bytes(self, flat_per_shard: int) -> dict:
        """Analytic per-shard interconnect bytes per train step.

        Counts bytes each shard *receives* for one lookup + one update
        of ``flat_per_shard`` ids (ring-collective accounting:
        all_gather/all_to_all of an (n*c,) buffer delivers (n-1)*c
        elements; psum_scatter of (n*c, D) moves (n-1)*c*D).  Used for
        the BASELINE.md scaling table — the real 1->N curve is not
        measurable on this rig (single chip), so the payload model is
        the stand-in.
        """
        n, d = self.num_shards, self.dim
        b = flat_per_shard
        i4 = f4 = 4
        cap, ov = self._route_caps(b)
        ag_lookup = (n - 1) * b * i4 + (n - 1) * b * d * f4
        ag_update = (n - 1) * b * i4 + (n - 1) * b * d * f4
        rt_lookup = ((n - 1) * cap * i4          # a2a ids out
                     + (n - 1) * cap * d * f4    # a2a rows back
                     + (n - 1) * ov * i4         # overflow ids gather
                     + (n - 1) * ov * d * f4)    # overflow rows scatter
        rt_update = ((n - 1) * cap * i4 + (n - 1) * cap * d * f4
                     + (n - 1) * ov * (i4 + d * f4))
        return {
            "n": n, "flat_per_shard": b, "cap": cap, "ov_cap": ov,
            "allgather": {"lookup": ag_lookup, "update": ag_update,
                          "total": ag_lookup + ag_update},
            "routed": {"lookup": rt_lookup, "update": rt_update,
                       "total": rt_lookup + rt_update},
        }

    def _owned_rows_for(self, table_local, ids, valid):
        """Fetch rows for owned ids; invalid positions read zero."""
        rows = self._fetch_rows(
            table_local, jnp.where(valid, ids // self.num_shards, 0))
        return rows * valid.astype(rows.dtype)[:, None]

    def _owned_grad_candidates(self, flat_ids_local, flat_grads_local,
                               routed: Optional[bool] = None):
        """Inside a shard_map body: grads for rows THIS shard owns.

        Exchange-strategy dispatch for the update path.  Returns
        ``(mine (K,) bool, local_rows (K,), g (K, D))`` candidate rows —
        the same row may appear multiple times (allgather: per
        occurrence; routed: once per source shard); callers either
        ``_dedup_rows`` or scatter-add, both of which sum duplicates.

        Args:
            routed: force (True) / forbid (False) the routed exchange;
                None follows ``self.route_mode``.  Per-occurrence
                callers pass False (routing pre-sums duplicates).
        """
        axis, n = self.axis_name, self.num_shards
        if n == 1:
            # single shard owns everything: the allgather/mask/psum
            # machinery is all no-ops semantically but NOT free (the
            # mask multiply + where stream ~13 MB each at the bench
            # shape) — skip it (tools/probe_fused_update.py r4)
            return (jnp.ones(flat_ids_local.shape, bool),
                    flat_ids_local, flat_grads_local)
        my = jax.lax.axis_index(axis)
        if routed is None:
            routed = self.route_mode == "routed"
        if not routed:
            all_ids = jax.lax.all_gather(flat_ids_local, axis, tiled=True)
            all_grads = jax.lax.all_gather(flat_grads_local, axis,
                                           tiled=True)
            mine = all_ids % n == my
            local_rows = jnp.where(mine, all_ids // n, 0)
            g = all_grads * mine.astype(all_grads.dtype)[:, None]
            return mine, local_rows, g
        b = flat_ids_local.shape[0]
        cap, ov_cap = self._route_caps(b)
        uid, slot = exchange.sort_dedup(flat_ids_local)
        # pre-sum this shard's duplicate ids before they travel
        gsum = jax.ops.segment_sum(flat_grads_local, slot, num_segments=b)
        plan = exchange.plan_route(uid, n, cap, ov_cap)
        send_g, ov_g = exchange.scatter_planned(plan, gsum)
        recv_ids = jax.lax.all_to_all(plan.send_ids, axis, 0, 0,
                                      tiled=True)          # (n*cap,)
        recv_g = jax.lax.all_to_all(send_g, axis, 0, 0,
                                    tiled=True)            # (n*cap, D)
        all_ov_ids = jax.lax.all_gather(plan.ov_ids, axis,
                                        tiled=True)        # (n*ov_cap,)
        all_ov_g = jax.lax.all_gather(ov_g, axis, tiled=True)
        ov_mine = (all_ov_ids < exchange.BIG) & (all_ov_ids % n == my)
        cand_ids = jnp.concatenate(
            [recv_ids, jnp.where(ov_mine, all_ov_ids, exchange.BIG)])
        cand_g = jnp.concatenate(
            [recv_g, all_ov_g * ov_mine.astype(all_ov_g.dtype)[:, None]])
        mine = cand_ids < exchange.BIG
        local_rows = jnp.where(mine, cand_ids // n, 0)
        return mine, local_rows, cand_g

    # -- lookup ------------------------------------------------------------
    def lookup(self, state: ShardedTableState,
               ids: jnp.ndarray,
               return_dropped: bool = False) -> jnp.ndarray:
        """Collective lookup: batch-sharded ids -> batch-sharded rows.

        Args:
            state: sharded table state.
            ids: int32 global row ids, shape (B, ...) sharded on axis 0.
            return_dropped: also return the global count of ids the
                routed exchange dropped to double overflow (per-owner
                skew beyond ``cap`` AND spill beyond ``ov_cap`` —
                exchange.py module docstring).  Always 0 on the
                allgather path.  The same ids drive the update, so this
                one counter observes both directions.

        Returns:
            ids.shape + (D,) embeddings, batch-sharded like ``ids``
            (and a () int32 dropped-id count if ``return_dropped``).
        """
        n = self.num_shards
        axis = self.axis_name
        orig_shape = ids.shape

        def _build_lookup():
            return shard_map(
                self._lookup_ag_body, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis)),
                out_specs=P(axis, None))

        def _build_lookup_routed():
            return shard_map(
                self._lookup_routed_body, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis)),
                out_specs=(P(axis, None), P()))

        flat = ids.reshape(-1).astype(jnp.int32)
        # pad to a multiple of the shard count (query sizes are user
        # controlled; eval/debug lookups are often tiny)
        padded = -flat.shape[0] % n
        if padded:
            flat = jnp.concatenate([flat, jnp.zeros((padded,), flat.dtype)])
        if self.route_mode == "routed":
            out, dropped = self._jitted("lookup_routed",
                                        _build_lookup_routed)(
                state.table, flat)
        else:
            out = self._jitted("lookup_ag", _build_lookup)(state.table,
                                                           flat)
            dropped = jnp.zeros((), jnp.int32)
        if padded:
            out = out[:-padded]
        out = out.reshape(orig_shape + (self.dim,))
        if return_dropped:
            return out, dropped
        return out

    def _lookup_ag_body(self, table_local, flat_ids_local):
        n, axis = self.num_shards, self.axis_name
        if n == 1:
            # single shard: direct gather, no collective/mask overhead
            return self._fetch_rows(table_local, flat_ids_local)
        my = jax.lax.axis_index(axis)
        all_ids = jax.lax.all_gather(flat_ids_local, axis,
                                     tiled=True)       # (B,)
        owner = all_ids % n
        local_rows = jnp.where(owner == my, all_ids // n, 0)
        rows = self._fetch_rows(table_local, local_rows)   # (B, D)
        rows = rows * (owner == my).astype(rows.dtype)[:, None]
        # exactly one owner contributes per id -> psum_scatter back
        # to the id's home shard.
        return jax.lax.psum_scatter(rows, axis, scatter_dimension=0,
                                    tiled=True)        # (b, D)

    def _lookup_routed_body(self, table_local, flat_ids_local):
        n, axis = self.num_shards, self.axis_name
        my = jax.lax.axis_index(axis)
        b = flat_ids_local.shape[0]
        cap, ov_cap = self._route_caps(b)
        uid, slot = exchange.sort_dedup(flat_ids_local)
        plan = exchange.plan_route(uid, n, cap, ov_cap)
        # req block i = ids shard i wants from me (all owned by me)
        req = jax.lax.all_to_all(plan.send_ids, axis, 0, 0,
                                 tiled=True)           # (n*cap,)
        rows = self._owned_rows_for(table_local, req,
                                    req < exchange.BIG)
        # back[k] = row for plan.send_ids[k]
        back = jax.lax.all_to_all(rows, axis, 0, 0,
                                  tiled=True)          # (n*cap, D)
        # overflow lane = the allgather path restricted to the spill
        all_ov = jax.lax.all_gather(plan.ov_ids, axis,
                                    tiled=True)        # (n*ov_cap,)
        ov_rows = self._owned_rows_for(
            table_local, all_ov,
            (all_ov < exchange.BIG) & (all_ov % n == my))
        ov_back = jax.lax.psum_scatter(
            ov_rows, axis, scatter_dimension=0,
            tiled=True)                                # (ov_cap, D)
        out = exchange.gather_planned(plan, back, ov_back, slot)
        return out, jax.lax.psum(plan.dropped, axis)

    # -- shared update plumbing --------------------------------------------
    def _flatten_pad(self, ids, grads, valid_mask):
        flat_ids = ids.reshape(-1).astype(jnp.int32)
        flat_grads = grads.reshape(flat_ids.shape[0], -1).astype(self.dtype)
        if valid_mask is not None:
            flat_grads = flat_grads * valid_mask.reshape(-1, 1).astype(
                self.dtype)
        padded = -flat_ids.shape[0] % self.num_shards
        if padded:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.zeros((padded,), flat_ids.dtype)])
            flat_grads = jnp.concatenate(
                [flat_grads,
                 jnp.zeros((padded, flat_grads.shape[1]),
                           flat_grads.dtype)])
        return flat_ids, flat_grads

    @staticmethod
    def _dedup_rows(mine, local_rows, g):
        """Sort-based static-shape dedup: duplicate rows' grads sum.

        Foreign ids become the ``_BIG`` sentinel: they sort to the back,
        carry zero grads, and their scatters drop out of bounds.

        Returns (rep (B,) unique local rows w/ sentinels,
                 row_grad (B, D), seg_valid (B,) float).
        """
        eff = jnp.where(mine, local_rows, _BIG)
        order = jnp.argsort(eff)
        sid = eff[order]
        sg = g[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        num = sid.shape[0]
        row_grad = jax.ops.segment_sum(sg, seg, num_segments=num)
        rep = jnp.full((num,), _BIG, sid.dtype).at[seg].set(sid)
        seg_valid = (rep < _BIG).astype(g.dtype)
        return rep, row_grad, seg_valid

    # -- adagrad update ----------------------------------------------------
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
            dedup: True = exact dedup (duplicates sum before the
                update); False = sort-free per-occurrence semantics.

        Returns:
            Updated state (same shardings; donate for in-place).
        """
        n = self.num_shards
        axis = self.axis_name
        if self.optimizer == "adam":
            if self.update_mode == "dense":
                return self._apply_grads_adam_dense(state, ids, grads, lr,
                                                    valid_mask)
            return self._apply_grads_adam(state, ids, grads, lr,
                                          valid_mask)
        if self.update_mode == "dense" and dedup:
            # dense-apply IS exact dedup; per-occurrence (dedup=False)
            # semantics need the sparse path
            return self._apply_grads_adagrad_dense(state, ids, grads, lr,
                                                   valid_mask)

        def _build():
            return shard_map(
                functools.partial(self._adagrad_sparse_body, lr, dedup),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis),
                          P(axis, None)),
                out_specs=(P(axis, None), P(axis, None)))

        flat_ids, flat_grads = self._flatten_pad(ids, grads, valid_mask)
        new_table, new_acc = self._jitted("upd_adagrad", _build, lr,
                                          dedup)(
            state.table, state.accumulator, flat_ids, flat_grads)
        return state._replace(table=new_table, accumulator=new_acc)

    def _adagrad_sparse_body(self, lr, dedup, table_local, acc_local,
                             flat_ids_local, flat_grads_local):
        n = self.num_shards
        mine, local_rows, g = self._owned_grad_candidates(
            flat_ids_local, flat_grads_local,
            routed=None if dedup else False)

        if dedup:
            rows, row_grad, valid = self._dedup_rows(mine, local_rows, g)
        else:
            # per-occurrence semantics: each occurrence contributes
            # its own squared grad; every occurrence scales by the
            # post-batch accumulator (deterministic, sort-free)
            rows = jnp.where(mine, local_rows, _BIG)
            row_grad = g
            valid = mine.astype(g.dtype)

        sq = jnp.mean(jnp.square(row_grad), axis=1) * valid
        pr_a, acc_lines = self._expand_scalar(rows, sq)
        new_acc = acc_local.at[pr_a].add(acc_lines)
        acc_rows = self._fetch_scalars(
            new_acc, jnp.minimum(rows, self.vocab_size // n - 1))
        scale = (lr / jnp.sqrt(jnp.clip(acc_rows, 1e-12)))[:, None] \
            * valid[:, None]
        pr_t, lines = self._expand(rows, -scale * row_grad)
        new_table = table_local.at[pr_t].add(lines)
        return new_table, new_acc

    # -- dense-apply updates -------------------------------------------------
    # One scatter-add of the batch's grads into a dense per-shard buffer,
    # then whole-table elementwise optimizer passes.  Numerically
    # identical to the sparse exact-dedup path (duplicate ids' grads sum
    # in the buffer; untouched rows see zero grads -> no-op), but avoids
    # the TPU-hostile argsort + per-random-row scatter tax: sequential
    # full-table passes run at HBM streaming bandwidth.  Chosen by
    # ``update_mode`` ("auto" gates on local shard size).

    def _scatter_dense_grads(self, table_like, rows, g):
        """Scatter (N, D) grads into a zeroed dense (V/P, P*D) buffer.

        On TPU the buffer is bf16: it is a full-table-sized intermediate,
        so halving it halves the three largest HBM flows of the dense
        update (zero-fill, scatter read-modify-write, optimizer-pass
        read) — grads are O(1e-3) and feed an f32 update, so bf16's
        8-bit mantissa is far below the batch-gradient noise floor.
        CPU/interpret keeps f32 so golden equivalence tests stay exact.
        """
        pr, lines = self._expand(rows, g)
        dt = (jnp.bfloat16 if jax.default_backend() == "tpu"
              else table_like.dtype)
        return jnp.zeros(table_like.shape, dt).at[pr].add(lines.astype(dt))

    def _apply_grads_adagrad_dense(self, state: ShardedTableState,
                                   ids: jnp.ndarray, grads: jnp.ndarray,
                                   lr: float,
                                   valid_mask: Optional[jnp.ndarray]
                                   ) -> ShardedTableState:
        axis = self.axis_name

        def _build():
            return shard_map(
                functools.partial(self._adagrad_dense_body, lr),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis),
                          P(axis, None)),
                out_specs=(P(axis, None), P(axis, None)))

        flat_ids, flat_grads = self._flatten_pad(ids, grads, valid_mask)
        new_table, new_acc = self._jitted("upd_adagrad_dense", _build,
                                          lr)(
            state.table, state.accumulator, flat_ids, flat_grads)
        return state._replace(table=new_table, accumulator=new_acc)

    def _adagrad_dense_body(self, lr, table_local, acc_local,
                            flat_ids_local, flat_grads_local):
        mine, rows, g = self._owned_grad_candidates(
            flat_ids_local, flat_grads_local)
        dense_g = self._scatter_dense_grads(table_local, rows, g)
        if jax.default_backend() == "tpu" and self.pack > 1:
            from rec_now_tpu.ops.pallas.table_update_kernel import (
                adagrad_dense_pass)
            return adagrad_dense_pass(table_local, acc_local,
                                      dense_g, lr=lr,
                                      pack=self.pack, dim=self.dim)
        vp_l, width = table_local.shape
        gl = dense_g.astype(table_local.dtype).reshape(
            vp_l, self.pack, self.dim)
        sq = jnp.mean(jnp.square(gl), axis=2)          # (VPl, P)
        new_acc = acc_local + sq
        scale = lr / jnp.sqrt(jnp.clip(new_acc, 1e-12))
        upd = (scale[:, :, None] * gl).reshape(vp_l, width)
        return table_local - upd, new_acc

    def _apply_grads_adam_dense(self, state: ShardedTableState,
                                ids: jnp.ndarray, grads: jnp.ndarray,
                                lr: float,
                                valid_mask: Optional[jnp.ndarray]
                                ) -> ShardedTableState:
        """Lazy sparse-Adam semantics via dense passes.

        A second (narrow) ones-scatter builds the touched mask; moments
        decay only on touched rows, matching the sparse path.
        """
        axis = self.axis_name

        def _build():
            return shard_map(
                functools.partial(self._adam_dense_body, lr),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis, None),
                          P(axis), P(axis, None), P()),
                out_specs=(P(axis, None), P(axis, None), P(axis, None)))

        flat_ids, flat_grads = self._flatten_pad(ids, grads, valid_mask)
        new_count = state.count + 1
        new_table, new_m, new_v = self._jitted("upd_adam_dense", _build,
                                               lr)(
            state.table, state.m, state.v, flat_ids, flat_grads,
            new_count)
        return ShardedTableState(table=new_table,
                                 accumulator=state.accumulator,
                                 m=new_m, v=new_v, count=new_count)

    def _adam_dense_body(self, lr, table_local, m_local, v_local,
                         flat_ids_local, flat_grads_local, t):
        b1, b2, eps = self.beta1, self.beta2, self.eps
        mine, rows, g = self._owned_grad_candidates(
            flat_ids_local, flat_grads_local)
        dense_g = self._scatter_dense_grads(table_local, rows, g)
        pr_s, cnt_lines = self._expand_scalar(
            rows, mine.astype(table_local.dtype))
        cnt = jnp.zeros(
            (table_local.shape[0], self.pack),
            table_local.dtype).at[pr_s].add(cnt_lines)
        if jax.default_backend() == "tpu" and self.pack > 1:
            from rec_now_tpu.ops.pallas.table_update_kernel import (
                adam_dense_pass)
            return adam_dense_pass(table_local, m_local, v_local,
                                   dense_g, cnt, t, lr=lr, b1=b1,
                                   b2=b2, eps=eps, pack=self.pack,
                                   dim=self.dim)
        touched = (cnt > 0)[:, :, None]                # (VPl, P, 1)

        vp_l, width = table_local.shape
        gl = dense_g.astype(table_local.dtype).reshape(
            vp_l, self.pack, self.dim)
        m3 = m_local.reshape(vp_l, self.pack, self.dim)
        v3 = v_local.reshape(vp_l, self.pack, self.dim)
        m_new = jnp.where(touched, b1 * m3 + (1 - b1) * gl, m3)
        v_new = jnp.where(touched, b2 * v3 + (1 - b2) * jnp.square(gl),
                          v3)
        tf_ = t.astype(table_local.dtype)
        mhat = m_new / (1 - b1 ** tf_)
        vhat = v_new / (1 - b2 ** tf_)
        upd = jnp.where(touched, lr * mhat / (jnp.sqrt(vhat) + eps),
                        0.0)
        return (table_local - upd.reshape(vp_l, width),
                m_new.reshape(vp_l, width),
                v_new.reshape(vp_l, width))

    # -- adam update -------------------------------------------------------
    def _apply_grads_adam(self, state: ShardedTableState,
                          ids: jnp.ndarray, grads: jnp.ndarray, lr: float,
                          valid_mask: Optional[jnp.ndarray]
                          ) -> ShardedTableState:
        """Lazy row-wise sparse Adam on owned rows (always deduped)."""
        axis = self.axis_name

        def _build():
            return shard_map(
                functools.partial(self._adam_sparse_body, lr),
                mesh=self.mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis, None),
                          P(axis), P(axis, None), P()),
                out_specs=(P(axis, None), P(axis, None), P(axis, None)))

        flat_ids, flat_grads = self._flatten_pad(ids, grads, valid_mask)
        new_count = state.count + 1
        new_table, new_m, new_v = self._jitted("upd_adam", _build, lr)(
            state.table, state.m, state.v, flat_ids, flat_grads,
            new_count)
        return ShardedTableState(table=new_table,
                                 accumulator=state.accumulator,
                                 m=new_m, v=new_v, count=new_count)

    def _adam_sparse_body(self, lr, table_local, m_local, v_local,
                          flat_ids_local, flat_grads_local, t):
        n = self.num_shards
        b1, b2, eps = self.beta1, self.beta2, self.eps
        mine, local_rows, g = self._owned_grad_candidates(
            flat_ids_local, flat_grads_local)

        rows, row_grad, valid = self._dedup_rows(mine, local_rows, g)
        safe = jnp.minimum(rows, self.vocab_size // n - 1)
        m_rows = self._fetch_rows(m_local, safe)
        v_rows = self._fetch_rows(v_local, safe)
        m_new = b1 * m_rows + (1 - b1) * row_grad
        v_new = b2 * v_rows + (1 - b2) * jnp.square(row_grad)
        tf_ = t.astype(table_local.dtype)
        mhat = m_new / (1 - b1 ** tf_)
        vhat = v_new / (1 - b2 ** tf_)
        update = lr * mhat / (jnp.sqrt(vhat) + eps)

        # set-via-delta: adding (new - old) on the disjoint lane
        # slice equals a set; sentinel rows drop out of bounds
        pr_m, dm = self._expand(rows, (m_new - m_rows) * valid[:, None])
        pr_v, dv = self._expand(rows, (v_new - v_rows) * valid[:, None])
        pr_t, dt = self._expand(rows, -update * valid[:, None])
        return (table_local.at[pr_t].add(dt),
                m_local.at[pr_m].add(dm),
                v_local.at[pr_v].add(dv))
