"""End-to-end training: lookup -> interaction -> heads -> joint loss ->
sparse + dense optimizer update, as one jitted, donated, mesh-aware step.

New scope relative to the reference (no trainer — SURVEY.md §2.4); this
is the subsystem the external "Numerous" PS framework provided.

TPU-native structure of one step (BASELINE.json's target pipeline):

1. ids are offset into the shared table's id space (host-free, on
   device) and gathered through the (sharded) embedding table — the only
   cross-chip communication besides the dense-grad psum;
2. the model and losses run data-parallel; under jit with sharded batch
   inputs XLA auto-inserts the dense-gradient psum;
3. in-batch pairwise/listwise losses are computed *per data shard*
   inside ``shard_map`` (a mini-batch's pair structure is local by
   construction — same semantics as the reference running per PS
   worker) and reduced as global pair-weighted means via ``psum``;
4. dense params update with optax Adam; embedding rows update with the
   sparse row-wise Adagrad (rows-touched-only);
5. the whole step donates its state: tables update in place in HBM.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rec_now_tpu.embedding.sharded import (ShardedEmbeddingTable,
                                           ShardedTableState)
from rec_now_tpu.losses.pairwise import pairwise_loss, bpr_loss_func
from rec_now_tpu.losses.listwise import (
    to_listwise_sample, listwise_loss_via_softmax_cross_entropy_with_logits)
from rec_now_tpu.losses.pointwise import sigmoid_cross_entropy_with_logits
from rec_now_tpu.models.feature_config import FeatureConfig
from rec_now_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rec_now_tpu.training.data import Batch
from rec_now_tpu.training.metrics import (CorpusGroupIndexer,
                                          DeviceGroupedAUC,
                                          DeviceStreamingAUC,
                                          StreamingGAUC,
                                          batch_gauc_stats)
from rec_now_tpu.training.wire import PackedBatch, WireFormat


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Losses + optimization hyper-parameters."""
    pointwise_weight: float = 1.0
    pairwise_weight: float = 0.0
    listwise_weight: float = 0.0
    click_occurance_power: float = 0.0
    pairwise_factor: float = 1.0
    dense_lr: float = 1e-3
    sparse_lr: float = 0.05
    sparse_optimizer: str = "adagrad"   # "adagrad" | "adam" (lazy, rowwise)
    sparse_update_mode: str = "auto"    # "auto" | "sparse" | "dense"
    sparse_route_mode: str = "auto"     # "auto" | "allgather" | "routed"
    # raise on the host when the routed exchange drops ids to double
    # overflow (metrics["sparse_dropped"] > 0) — off by default: drops
    # need adversarially skewed ids (exchange.py:20-24) and training
    # degrades gracefully (dropped ids lose one gradient update)
    route_strict: bool = False
    # routed-exchange bucket sizing (forwarded to ShardedEmbeddingTable):
    # per-owner bucket = cap_factor x the uniform share; ov_cap bounds
    # the all-gather overflow lane (None = b//16 heuristic)
    route_cap_factor: float = 2.0
    route_ov_cap: Optional[int] = None
    num_tasks: int = 1          # >1: multi-task (CTR + CVR) heads
    # CAN co-action (benchmark config #5): when set, a second sharded
    # table holds per-item co-action DNN parameters, looked up by this
    # sparse field's ids and passed to the model as a third input.
    can_param_field: Optional[int] = None
    can_dnn_dims: tuple = (16,)
    # wire dense compression: 'f16' (lossless to ~1e-3) or 'u8'
    # (per-window per-feature affine; ~15% fewer wire bytes — opt-in,
    # see training/wire.py)
    wire_dense_mode: str = "f16"
    # wire id compression: 'packed' (bit-packed words) or 'hot8'
    # (LOSSLESS hot-id byte codes + escape stream for skewed id
    # distributions; single-process only — see training/wire.py)
    wire_id_mode: str = "packed"


class TrainState(NamedTuple):
    """Everything a step mutates (donated into the jitted step)."""
    params: Any
    opt_state: Any
    table: ShardedTableState
    step: jnp.ndarray
    can_table: Optional[ShardedTableState] = None


class Trainer:
    """Wires a model family to the embedding engine and loss stack.

    Example:
        trainer = Trainer(model, FeatureConfig(), TrainerConfig(
            pairwise_weight=1.0))
        state = trainer.init(jax.random.PRNGKey(0), example_batch)
        for batch in data:
            state, metrics = trainer.train_step(state, *trainer.put(batch))
    """

    def __init__(self, model, feature_config: FeatureConfig,
                 config: TrainerConfig,
                 mesh: Optional[Mesh] = None):
        self.model = model
        self.fc = feature_config
        self.cfg = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.table = ShardedEmbeddingTable(
            vocab_size=feature_config.total_rows,
            dim=feature_config.embedding_dim, mesh=self.mesh,
            optimizer=config.sparse_optimizer,
            update_mode=config.sparse_update_mode,
            route_mode=config.sparse_route_mode,
            route_cap_factor=config.route_cap_factor,
            route_ov_cap=config.route_ov_cap)
        self.can_table = None
        if config.can_param_field is not None:
            from rec_now_tpu.models.can_dcn_model import CANDCNModel
            can_dim = CANDCNModel.can_param_size(
                feature_config.embedding_dim, config.can_dnn_dims)
            # co-action params multiply embeddings; center the init at
            # small values (the CAN layer output starts near zero and
            # the table learns from there)
            self.can_table = ShardedEmbeddingTable(
                vocab_size=feature_config.rows_per_field, dim=can_dim,
                mesh=self.mesh, initializer_scale=0.05,
                optimizer=config.sparse_optimizer,
                update_mode=config.sparse_update_mode,
                route_mode=config.sparse_route_mode,
                route_cap_factor=config.route_cap_factor,
                route_ov_cap=config.route_ov_cap)
        self.tx = optax.adam(config.dense_lr)
        # pass the per-sample domain only to models that route on it
        # (MultiTaskModel's STAR towers); single-task towers don't take it
        import inspect
        try:
            sig = inspect.signature(type(model).__call__)
            self._takes_domain = "domain_idx" in sig.parameters
        except (TypeError, ValueError):
            self._takes_domain = False
        self._train_step = None
        self._train_many = None
        self._eval_step = None

    # -- placement ---------------------------------------------------------
    def put(self, batch: Batch) -> Tuple:
        """Device-put a host batch with batch-axis sharding."""
        def shard(x, ndim):
            spec = P(DATA_AXIS, *([None] * (ndim - 1)))
            return jax.device_put(jnp.asarray(x),
                                  NamedSharding(self.mesh, spec))
        return (shard(batch.dense, 2), shard(batch.sparse_ids, 2),
                shard(batch.labels, 1), shard(batch.group_ids, 1),
                shard(batch.cvr_labels, 1), shard(batch.domain_idx, 1))

    def put_local(self, batch: Batch) -> Tuple:
        """Assemble a HOST-LOCAL batch slice into global sharded arrays.

        The multi-host twin of :meth:`put`: on a pod slice every process
        feeds only its own rows (local batch = global batch /
        ``jax.process_count()``), and
        ``jax.make_array_from_process_local_data`` stitches the
        per-process shards into one global batch-sharded array.  With a
        single process this is bit-identical to :meth:`put`.

        Args:
            batch: this host's local slice of the global batch.

        Returns:
            The same tuple layout :meth:`put` produces, ready for
            :meth:`train_step`.
        """
        from rec_now_tpu.parallel.multihost import put_local_batch
        return tuple(
            put_local_batch(self.mesh, np.asarray(getattr(batch, f)))
            for f in ("dense", "sparse_ids", "labels", "group_ids",
                      "cvr_labels", "domain_idx"))

    def check_dropped(self, metrics) -> None:
        """Raise when strict routing is on and the exchange dropped ids.

        Call at a host-sync point (log/eval cadence) — reading the
        metric forces a device sync, so per-step calls would serialize
        the pipeline.
        """
        if not self.cfg.route_strict:
            return
        dropped = metrics.get("sparse_dropped")
        if dropped is None:
            return
        d = int(jax.device_get(jnp.max(jnp.asarray(dropped))))
        if d > 0:
            raise RuntimeError(
                f"routed exchange dropped {d} ids to double overflow "
                "(route_strict=True); raise route_cap_factor/"
                "route_ov_cap or switch sparse_route_mode='allgather'")

    def _put_auto(self, batch: Batch) -> Tuple:
        """:meth:`put`, or :meth:`put_local` on a multi-process slice.

        Methods that place batches internally (init, evaluate) route
        through this so they accept host-LOCAL batches transparently on
        a pod slice (where ``put`` cannot build the global array).
        """
        if jax.process_count() > 1:
            return self.put_local(batch)
        return self.put(batch)

    # -- init --------------------------------------------------------------
    def init(self, key: jax.Array, batch: Batch) -> TrainState:
        """Initialize params, optimizer and the sharded table.

        Args:
            key: PRNG key (identical on every process of a pod slice).
            batch: an example batch — host-local slice on multi-process.
        """
        k_model, k_table, k_can = jax.random.split(key, 3)
        dense, ids, labels, groups, cvr, domain = self._put_auto(batch)
        emb_shape = ids.shape + (self.fc.embedding_dim,)
        dummy_emb = jnp.zeros(emb_shape, jnp.float32)
        if self.can_table is not None:
            dummy_can = jnp.zeros((ids.shape[0], self.can_table.dim),
                                  jnp.float32)
            params = self.model.init(k_model, dense, dummy_emb, dummy_can)
        else:
            params = self.model.init(k_model, dense, dummy_emb)
        opt_state = self.tx.init(params)
        # dense params/opt state are replicated over the mesh explicitly
        # so their shardings survive checkpoint round-trips
        replicated = NamedSharding(self.mesh, P())
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(opt_state, replicated)
        table_state = self.table.init(k_table)
        can_state = (self.can_table.init(k_can)
                     if self.can_table is not None else None)
        return TrainState(params=params, opt_state=opt_state,
                          table=table_state,
                          step=jax.device_put(jnp.zeros((), jnp.int32),
                                              replicated),
                          can_table=can_state)

    # -- losses ------------------------------------------------------------
    def _ranking_losses(self, logits, labels, groups):
        """Per-data-shard pairwise + listwise losses, globally reduced.

        Inside shard_map when the mesh has >1 device: each shard builds
        its local (b, b) pair structure (in-batch semantics stay local,
        like the reference per worker) and the scalars combine as
        pair-count-weighted global means.
        """
        cfg = self.cfg

        def local(logits, labels, groups, axis_name=None):
            out = {}
            if cfg.pairwise_weight != 0.0:
                if jax.default_backend() == "tpu":
                    from rec_now_tpu.ops.pallas.pairwise_kernel import (
                        pairwise_loss_pallas)
                    pl_sum, n_pair = pairwise_loss_pallas(
                        logits, labels, groups,
                        factor=cfg.pairwise_factor,
                        click_occurance_power=cfg.click_occurance_power,
                        return_num_pair=True, reduce_mean=False,
                        # trainer labels are clicks in {0, 1}: enables
                        # the single-sweep occurrence closed form
                        binary_labels=True)
                else:
                    pl_sum, n_pair = pairwise_loss(
                        logits, labels, groups,
                        pairloss_func=functools.partial(
                            bpr_loss_func, factor=cfg.pairwise_factor,
                            reduce_mean=False),
                        click_occurance_power=cfg.click_occurance_power,
                        return_num_pair=True)
                if axis_name:
                    pl_sum = jax.lax.psum(pl_sum, axis_name)
                    n_pair = jax.lax.psum(n_pair, axis_name)
                out["pairwise"] = pl_sum / (n_pair + 1e-10)
            if cfg.listwise_weight != 0.0:
                if jax.default_backend() == "tpu":
                    from rec_now_tpu.ops.pallas.listwise_kernel import (
                        listwise_loss_pallas)
                    lsum, lcount = listwise_loss_pallas(
                        groups, labels, logits, reduce_mean=False)
                else:
                    lw = to_listwise_sample(groups, labels, logits)
                    row_losses = \
                        listwise_loss_via_softmax_cross_entropy_with_logits(
                            lw.labels, lw.logits, do_reduce=False,
                            row_valid=lw.row_valid)
                    lsum = jnp.sum(row_losses)
                    lcount = jnp.sum(lw.row_valid.astype(jnp.float32))
                if axis_name:
                    lsum = jax.lax.psum(lsum, axis_name)
                    lcount = jax.lax.psum(lcount, axis_name)
                out["listwise"] = jnp.where(lcount > 0,
                                            lsum / jnp.maximum(lcount, 1.0),
                                            0.0)
            return out

        if self.mesh.size > 1:
            @functools.partial(
                jax.shard_map, mesh=self.mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P())
            def sharded(lg, lb, gr):
                return local(lg, lb, gr, axis_name=DATA_AXIS)
            return sharded(logits, labels, groups)
        return local(logits, labels, groups)

    def _loss_fn(self, params, emb, can_emb, dense, labels, groups, cvr,
                 domain):
        cfg = self.cfg
        metrics = {}
        kw = {"domain_idx": domain} if self._takes_domain else {}
        if can_emb is not None:
            logits = self.model.apply(params, dense, emb, can_emb, **kw)
        else:
            logits = self.model.apply(params, dense, emb, **kw)
        if cfg.num_tasks > 1:
            task_logits = logits                           # (T, B)
            logits = task_logits[0]
            cvr_loss = jnp.mean(sigmoid_cross_entropy_with_logits(
                cvr, task_logits[1]))
            metrics["cvr_loss"] = cvr_loss
        loss = jnp.zeros((), jnp.float32)
        if cfg.pointwise_weight != 0.0:
            pw = jnp.mean(sigmoid_cross_entropy_with_logits(labels, logits))
            metrics["pointwise"] = pw
            loss = loss + cfg.pointwise_weight * pw
        ranking = self._ranking_losses(logits, labels, groups)
        if "pairwise" in ranking:
            metrics["pairwise"] = ranking["pairwise"]
            loss = loss + cfg.pairwise_weight * ranking["pairwise"]
        if "listwise" in ranking:
            metrics["listwise"] = ranking["listwise"]
            loss = loss + cfg.listwise_weight * ranking["listwise"]
        if cfg.num_tasks > 1:
            loss = loss + metrics["cvr_loss"]
        metrics["loss"] = loss
        return loss, (metrics, logits)

    # -- steps -------------------------------------------------------------
    def _step_body(self, state: TrainState, dense, ids, labels, groups,
                   cvr, domain):
        """One optimization step (pure; shared by jit and scan paths)."""
        fc, table, tx, cfg = self.fc, self.table, self.tx, self.cfg
        can_table = self.can_table
        gids = fc.global_ids(ids)
        emb, dropped = table.lookup(state.table, gids,
                                    return_dropped=True)   # (B, F, D)
        if can_table is not None:
            can_ids = ids[:, cfg.can_param_field] % fc.rows_per_field
            can_emb, can_dropped = can_table.lookup(
                state.can_table, can_ids, return_dropped=True)
            dropped = dropped + can_dropped
            (loss, (metrics, _)), (gp, gemb, gcan) = \
                jax.value_and_grad(
                    self._loss_fn, argnums=(0, 1, 2), has_aux=True)(
                    state.params, emb, can_emb, dense, labels,
                    groups, cvr, domain)
            new_can = can_table.apply_grads(
                state.can_table, can_ids, gcan, lr=cfg.sparse_lr)
        else:
            (loss, (metrics, _)), (gp, gemb) = jax.value_and_grad(
                self._loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, emb, None, dense, labels, groups,
                    cvr, domain)
            new_can = state.can_table
        updates, opt_state = tx.update(gp, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        new_table = table.apply_grads(state.table, gids, gemb,
                                      lr=cfg.sparse_lr)
        # ids lost to routed-exchange double overflow (same ids drive
        # lookup and update, so one counter observes both); 0 on the
        # allgather path and on uniformly-hashed id spaces
        metrics["sparse_dropped"] = dropped
        return TrainState(params=params, opt_state=opt_state,
                          table=new_table,
                          step=state.step + 1,
                          can_table=new_can), metrics

    def _build_train_step(self):
        return jax.jit(self._step_body, donate_argnums=(0,))

    def _build_train_many(self):
        def many(state: TrainState, dense_s, ids_s, labels_s, groups_s,
                 cvr_s, domain_s):
            def body(state, xs):
                state, metrics = self._step_body(state, *xs)
                return state, metrics
            state, metrics_seq = jax.lax.scan(
                body, state,
                (dense_s, ids_s, labels_s, groups_s, cvr_s, domain_s))
            return state, metrics_seq
        return jax.jit(many, donate_argnums=(0,))

    def _eval_body(self, state: TrainState, dense, ids, domain):
        """Pure eval forward (shared by jit and scanned-eval paths)."""
        fc, table = self.fc, self.table
        can_table, cfg = self.can_table, self.cfg
        gids = fc.global_ids(ids)
        emb = table.lookup(state.table, gids)
        kw = {"domain_idx": domain} if self._takes_domain else {}
        if can_table is not None:
            can_ids = ids[:, cfg.can_param_field] % fc.rows_per_field
            can_emb = can_table.lookup(state.can_table, can_ids)
            return self.model.apply(state.params, dense, emb, can_emb,
                                    **kw)
        return self.model.apply(state.params, dense, emb, **kw)

    def _build_eval_step(self):
        return jax.jit(self._eval_body)

    def train_step(self, state: TrainState, dense, ids, labels, groups,
                   cvr, domain
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One jitted, state-donating optimization step."""
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step(state, dense, ids, labels, groups, cvr,
                                domain)

    def eval_step(self, state: TrainState, dense, ids,
                  domain=None) -> jnp.ndarray:
        """Logits for an eval batch (no state mutation)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        if domain is None:
            domain = jnp.zeros((ids.shape[0],), jnp.int32)
        return self._eval_step(state, dense, ids, domain)

    def train_many(self, state: TrainState, batches
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Run multiple steps as ONE on-device ``lax.scan``.

        Stacks the host batches to (S, B, ...) device arrays and executes
        the whole window in a single dispatch — amortizing host/runtime
        round-trip latency, which dominates when per-step compute is in
        the millisecond range (the production inner loop).

        Args:
            state: current train state (donated).
            batches: list of host :class:`Batch` of identical shape.

        Returns:
            (final state, metrics stacked over steps).
        """
        if self._train_many is None:
            self._train_many = self._build_train_many()
        stacked = [np.stack([getattr(b, f) for b in batches])
                   for f in ("dense", "sparse_ids", "labels", "group_ids",
                             "cvr_labels", "domain_idx")]

        def shard(x):
            spec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
            return jax.device_put(jnp.asarray(x),
                                  NamedSharding(self.mesh, spec))
        return self._train_many(state, *[shard(x) for x in stacked])

    # -- packed wire path --------------------------------------------------
    @property
    def wire(self) -> WireFormat:
        """Wire format bound to this trainer's feature layout.

        ``num_shards`` = mesh size: the u8 dense affine is computed per
        batch shard, so every PackedBatch field (scale included) is
        batch-sharded — the invariant the multi-host assembly path
        relies on.
        """
        if getattr(self, "_wire", None) is None:
            id_mode = self.cfg.wire_id_mode
            if id_mode == "hot8" and jax.process_count() > 1:
                # the hot table is baked into each process's compiled
                # decode; per-process tables would diverge on a pod
                import warnings
                warnings.warn("wire_id_mode='hot8' is single-process "
                              "only; falling back to 'packed'")
                id_mode = "packed"
            self._wire = WireFormat(self.fc.num_sparse,
                                    self.fc.rows_per_field,
                                    dense_mode=self.cfg.wire_dense_mode,
                                    num_shards=self.mesh.size,
                                    id_mode=id_mode)
        return self._wire

    def put_packed_window(self, batches,
                          raw_groups: bool = False) -> PackedBatch:
        """Compress a window of host batches and start its transfer.

        Packing is vectorized numpy; ``jax.device_put`` dispatches the
        (much smaller) transfer asynchronously, so calling this for
        window k+1 right after dispatching window k overlaps the wire
        with compute — the production double-buffering loop.

        ``raw_groups`` ships group ids unremapped (pre-mapped corpus
        slots; the device-GAUC eval path).
        """
        packed = self.wire.pack_window(batches, raw_groups=raw_groups)

        def shard(x):
            spec = P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
            return jax.device_put(jnp.asarray(x),
                                  NamedSharding(self.mesh, spec))
        return PackedBatch(*[shard(x) for x in packed])

    def put_packed_window_local(self, batches,
                                raw_groups: bool = False) -> PackedBatch:
        """Multi-host twin of :meth:`put_packed_window`.

        Each process packs only its LOCAL window (local batch = global
        batch / process count) with the affine computed per local
        device shard, then every field — all batch-sharded on axis 1,
        ``dense_scale`` included — assembles into the global array via
        ``jax.make_array_from_process_local_data``.  The in-batch group
        remap is offset by ``process_index * local_batch`` so group ids
        from different processes cannot collide in global in-batch
        statistics (device-eval GAUC).  With one process this is
        bit-identical to :meth:`put_packed_window` (tested).

        This is what makes the production scan-window inner loop (and
        the device-resident eval) run unchanged on a pod slice — the
        boundary the reference delegated to its PS framework
        (rec_now/rec_block/embedding_util.py:310).
        """
        from rec_now_tpu.parallel.multihost import put_local_batch
        nproc = jax.process_count()
        batches = list(batches)
        local_b = int(np.asarray(batches[0].labels).shape[-1])
        if not raw_groups and local_b * nproc > 0x10000:
            # only the in-batch remap packs batch positions into the
            # uint16 group field; raw (corpus-slot) groups are already
            # < num_group_slots <= 65536 at any batch size, so
            # large-batch multi-host device eval stays legal
            raise ValueError(
                "uint16 group wire needs global batch <= 65536 for the "
                f"in-batch group remap; got {local_b * nproc}")
        if self.mesh.size % nproc:   # also catches mesh.size < nproc
            raise ValueError(
                f"mesh size {self.mesh.size} must be a multiple of the "
                f"process count {nproc}")
        local_shards = self.mesh.size // nproc
        packed = self.wire.pack_window(batches, num_shards=local_shards,
                                       raw_groups=raw_groups)
        if nproc > 1 and not raw_groups:
            # raw (corpus-slot) groups are already globally consistent
            # (hash-assigned on a pod); only the per-batch remap needs
            # the per-process de-collision offset
            off = np.uint32(jax.process_index() * local_b)
            packed = packed._replace(
                group_ids=(packed.group_ids.astype(np.uint32)
                           + off).astype(np.uint16))

        def put(x):
            return put_local_batch(self.mesh, np.asarray(x),
                                   batch_axis=1)
        return PackedBatch(*[put(x) for x in packed])

    def put_packed_auto(self, batches,
                        raw_groups: bool = False) -> PackedBatch:
        """:meth:`put_packed_window`, or the ``_local`` twin on a pod."""
        if jax.process_count() > 1:
            return self.put_packed_window_local(batches,
                                                raw_groups=raw_groups)
        return self.put_packed_window(batches, raw_groups=raw_groups)

    def _build_train_many_packed(self):
        wire = self.wire

        def many(state: TrainState, packed: PackedBatch):
            def body(state, xs):
                state, metrics = self._step_body(state, *wire.decode(xs))
                return state, metrics
            return jax.lax.scan(body, state, packed)
        return jax.jit(many, donate_argnums=(0,))

    def train_many_packed(self, state: TrainState, packed: PackedBatch
                          ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Scan a whole pre-transferred packed window on device."""
        # the hot8 id table is baked into the traced decode as a
        # constant; a table rebuild (escape-cap overflow) bumps
        # hot_version and must invalidate the compiled program
        ver = self.wire.hot_version
        if (getattr(self, "_train_many_packed", None) is None
                or getattr(self, "_packed_step_wire_ver", None) != ver):
            self._train_many_packed = self._build_train_many_packed()
            self._packed_step_wire_ver = ver
        return self._train_many_packed(state, packed)

    def train_pipelined(self, state: TrainState, host_batches,
                        window: int = 5
                        ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Windowed training with transfer/compute overlap.

        Splits ``host_batches`` into windows of ``window`` steps; each
        window runs as one on-device scan while the next window's packed
        transfer is in flight.  Steady-state throughput is
        max(compute, wire) instead of their sum.

        Returns (final state, last window's stacked metrics).
        """
        batches = list(host_batches)
        windows = [batches[i:i + window]
                   for i in range(0, len(batches), window)]
        dev = self.put_packed_auto(windows[0])
        metrics_seq = None
        for i in range(len(windows)):
            nxt = (self.put_packed_auto(windows[i + 1])
                   if i + 1 < len(windows) else None)
            state, metrics_seq = self.train_many_packed(state, dev)
            dev = nxt
        return state, metrics_seq

    # -- loops -------------------------------------------------------------
    def fit(self, state: TrainState, batches,
            log_every: int = 0,
            log_fn: Callable[[int, Dict], None] = None
            ) -> Tuple[TrainState, Dict[str, float]]:
        """Run the stream of host batches; return final state + metrics."""
        last = {}
        for i, batch in enumerate(batches):
            state, metrics = self.train_step(state, *self.put(batch))
            if log_every and (i + 1) % log_every == 0:
                last = {k: float(v) for k, v in metrics.items()}
                self.check_dropped(last)
                if log_fn:
                    log_fn(i + 1, last)
        if not last:
            last = {k: float(v) for k, v in metrics.items()}
            self.check_dropped(last)
        return state, last

    def evaluate(self, state: TrainState, batches) -> Dict[str, float]:
        """Exact AUC/GAUC over an eval stream (host-side accumulation).

        Multi-task states additionally report ``cvr_auc``/``cvr_gauc``
        from the CVR head's logits against the conversion labels.
        """
        acc = StreamingGAUC()
        cvr_acc = StreamingGAUC() if self.cfg.num_tasks > 1 else None
        multi = jax.process_count() > 1
        for batch in batches:
            dense, ids, labels, groups, cvr, domain = self._put_auto(batch)
            logits = self.eval_step(state, dense, ids, domain)
            b_groups, b_labels, b_cvr = (batch.group_ids, batch.labels,
                                         batch.cvr_labels)
            if multi:
                # the metric needs globally-consistent (group, label,
                # logit) triples on every host; gather the host-local
                # label slices alongside the sharded logits
                from jax.experimental import multihost_utils
                b_groups, b_labels, b_cvr, logits = \
                    multihost_utils.process_allgather(
                        (b_groups, b_labels, b_cvr, logits), tiled=True)
            if logits.ndim == 2:                           # multi-task
                if cvr_acc is not None:
                    cvr_acc.update(np.asarray(b_groups),
                                   np.asarray(b_cvr),
                                   np.asarray(logits[1]))
                logits = logits[0]
            acc.update(np.asarray(b_groups),
                       np.asarray(b_labels), np.asarray(logits))
        result = acc.result()
        if cvr_acc is not None:
            cvr_res = cvr_acc.result()
            result["cvr_auc"] = cvr_res["auc"]
            result["cvr_gauc"] = cvr_res["gauc"]
        return result

    # -- device-resident eval ----------------------------------------------
    def _build_eval_many_packed(self, num_buckets: int,
                                gauc_mode: str, group_buckets: int):
        wire, multi = self.wire, self.cfg.num_tasks > 1
        corpus = gauc_mode == "corpus"

        def many(state: TrainState, carry, packed: PackedBatch,
                 step_w: jnp.ndarray):
            def body(carry, xs):
                packed_step, sw = xs
                hist, cvr_hist, aux0, aux1 = carry
                dense, ids, labels, groups, cvr, domain = wire.decode(
                    packed_step)
                logits = self._eval_body(state, dense, ids, domain)
                main = logits[0] if multi else logits
                # sw == 0 marks a window-padding step (repeats of the
                # last real batch, added so every window has ONE shape
                # and the scanned program never recompiles on a ragged
                # tail); its examples must not count
                ex_w = jnp.full(labels.shape, sw, jnp.float32)
                hist = DeviceStreamingAUC.accumulate(hist, labels, main,
                                                     weights=ex_w)
                if corpus:
                    # groups carry pre-mapped corpus slots (raw wire)
                    aux0 = DeviceGroupedAUC.accumulate(
                        aux0, groups, labels, main, group_buckets,
                        weights=ex_w)
                else:
                    w, t = batch_gauc_stats(labels, main, groups)
                    aux0, aux1 = aux0 + sw * w, aux1 + sw * t
                if multi:
                    cvr_hist = DeviceStreamingAUC.accumulate(
                        cvr_hist, cvr, logits[1], weights=ex_w)
                    if corpus:   # aux1 is free: CVR corpus group hist
                        aux1 = DeviceGroupedAUC.accumulate(
                            aux1, groups, cvr, logits[1], group_buckets,
                            weights=ex_w)
                return (hist, cvr_hist, aux0, aux1), ()
            carry, _ = jax.lax.scan(body, carry, (packed, step_w))
            return carry
        # donate the carry: the corpus group histogram is ~100 MB at
        # production slot counts and must update in place across
        # window calls
        return jax.jit(many, donate_argnums=(1,))

    def evaluate_device(self, state: TrainState, batches,
                        window: int = 8,
                        num_buckets: int = 4096,
                        gauc: str = "corpus",
                        num_group_slots: int = 8192,
                        group_buckets: int = 512) -> Dict[str, float]:
        """Device-resident eval sweep: no per-example host traffic.

        ``evaluate`` is the exact oracle but streams every logit to the
        host and sorts there — at training throughput a full held-out
        epoch stalls on the host link and single-threaded numpy.  This
        path instead scans packed windows on device (same compressed
        wire as training, transfer of window k+1 overlapping compute of
        window k) and accumulates sufficient statistics on device:

        * bucketed AUC histograms (error O(1/num_buckets), see
          :class:`DeviceStreamingAUC`);
        * ``gauc='corpus'`` (default): CORPUS-level GAUC — per-group
          (positive, negative) score-bucket histograms of shape
          (2, num_group_slots, group_buckets), merged across windows
          in the scan carry.  Group ids are pre-mapped on the host
          into dense corpus slots (exact dict mapping single-process,
          consistent hash on a pod — :class:`CorpusGroupIndexer`) and
          travel the u16 group wire field unremapped.  Matches the
          exact host GAUC to the O(1/group_buckets) tie error
          (< 1e-3 at the defaults; tests/training/test_device_gauc.py);
        * ``gauc='inbatch'``: the r2 behavior — pair-weighted in-batch
          GAUC win/total sums (the statistic the in-batch pairwise
          loss optimizes).

        The final host fetch is 2 * num_buckets floats, plus the
        2 * G * K group histogram under 'corpus'.

        Returns {'auc', 'gauc', 'gauc_mode', 'num_pos', 'num_neg'
        [, 'gauc_groups', 'gauc_overflow'][, 'cvr_auc']}.
        """
        if gauc not in ("corpus", "inbatch"):
            raise ValueError(f"unknown gauc mode {gauc!r}")
        if num_group_slots > 0x10000:
            raise ValueError(
                "corpus group slots travel the uint16 group wire: "
                f"num_group_slots must be <= 65536, got {num_group_slots}")
        corpus = gauc == "corpus"
        key = (num_buckets, gauc, group_buckets if corpus else 0,
               self.wire.hot_version)   # hot8 table baked as constant
        if getattr(self, "_eval_many_key", None) != key:
            self._eval_many_packed = self._build_eval_many_packed(
                num_buckets, gauc, group_buckets)
            self._eval_many_key = key
        batches = list(batches)
        if not batches:
            raise ValueError("evaluate_device needs at least one batch")
        indexer = None
        if corpus:
            indexer = CorpusGroupIndexer(
                num_group_slots, use_hash=jax.process_count() > 1)
            batches = [
                b._replace(group_ids=indexer.assign(b.group_ids))
                for b in batches]
        # pad the ragged tail with zero-weight repeats of the last
        # batch: every window then has ONE (window, batch) shape and
        # the scanned program compiles exactly once per sweep shape
        n_real = len(batches)
        n_pad = -n_real % window
        batches = batches + [batches[-1]] * n_pad
        windows = [batches[i:i + window]
                   for i in range(0, len(batches), window)]
        step_ws = [np.ones((window,), np.float32)
                   for _ in range(len(windows))]
        if n_pad:
            step_ws[-1][window - n_pad:] = 0.0
        # distinct buffers: the carry is DONATED, and donating one
        # buffer twice is an error
        hist = jnp.zeros((2, num_buckets), jnp.float32)
        cvr0 = jnp.zeros((2, num_buckets), jnp.float32)
        if corpus:
            ghist0 = DeviceGroupedAUC.init(num_group_slots,
                                           group_buckets)
            carry = (hist, cvr0, ghist0,
                     DeviceGroupedAUC.init(num_group_slots,
                                           group_buckets)
                     if self.cfg.num_tasks > 1 else jnp.zeros(()))
        else:
            carry = (hist, cvr0, jnp.zeros(()), jnp.zeros(()))
        dev = self.put_packed_auto(windows[0], raw_groups=corpus)
        for i in range(len(windows)):
            nxt = (self.put_packed_auto(windows[i + 1],
                                        raw_groups=corpus)
                   if i + 1 < len(windows) else None)
            carry = self._eval_many_packed(state, carry, dev,
                                           jnp.asarray(step_ws[i]))
            dev = nxt
        d_hist, d_cvr, aux0, aux1 = carry
        if corpus:
            # reduce (2G, K) -> (3, G) ON DEVICE: the host fetch is
            # O(G), not the ~100 MB full histogram (seconds over a
            # thin host link)
            aux0 = _jit_gauc_finish(aux0)
            if self.cfg.num_tasks > 1:
                aux1 = _jit_gauc_finish(aux1)
        hist, cvr_hist, aux0, aux1 = jax.device_get(
            (d_hist, d_cvr, aux0, aux1))
        result = {
            "auc": DeviceStreamingAUC.auc_from_hist(hist),
            "gauc_mode": gauc,
            "num_pos": float(np.asarray(hist)[0].sum()),
            "num_neg": float(np.asarray(hist)[1].sum()),
        }
        if corpus:
            gr = DeviceGroupedAUC.gauc_from_stats(aux0)
            result["gauc"] = gr["gauc"]
            result["gauc_groups"] = gr["num_groups"]
            if indexer.overflowed:
                result["gauc_overflow"] = float(indexer.overflowed)
        else:
            win, total = aux0, aux1
            result["gauc"] = (float(win / total)
                              if float(total) > 0 else 0.5)
        if self.cfg.num_tasks > 1:
            result["cvr_auc"] = DeviceStreamingAUC.auc_from_hist(cvr_hist)
            if corpus:
                result["cvr_gauc"] = DeviceGroupedAUC.gauc_from_stats(
                    aux1)["gauc"]
        return result


# cached once: a fresh jax.jit wrapper per eval sweep would retrace
_jit_gauc_finish = jax.jit(DeviceGroupedAUC.finish)
