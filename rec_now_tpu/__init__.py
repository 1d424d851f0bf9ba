"""rec_now_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CTR / ranking framework.

A from-scratch re-design of the capabilities of the `rec_now` reference
library (a TF2/Keras recommendation building-block zoo) as a complete
TPU-first training framework:

* ``rec_now_tpu.layers``    — the feature-interaction layer zoo (FM, DCN,
  DCN-v2/mix, CIN, CAN, inner-PNN, SENET, sparse GNN, MMoE, PLE, STAR,
  stacked/multi dense, pooling, fix-length, cartesian product, multi-hash)
  as Flax modules designed around static shapes and MXU-friendly
  contractions.
* ``rec_now_tpu.losses``    — in-batch pairwise / listwise loss
  construction rewritten as fixed-shape masked computations (no dynamic
  shapes anywhere), plus focal / pointwise losses.
* ``rec_now_tpu.rec_block`` — attention blocks and slot/segment embedding
  utilities (the parameter-server-style feature ingestion path) on
  ``jax.ops.segment_sum``.
* ``rec_now_tpu.embedding`` — embedding-table engine: single-chip tables
  and row-sharded multi-chip tables with collective-based lookup under
  ``shard_map``, with sparse (rows-touched-only) optimizer updates.
* ``rec_now_tpu.ops``       — hot-path compute ops with Pallas TPU kernels
  (fused CIN contraction, batched multi-expert dense) and XLA fallbacks.
* ``rec_now_tpu.parallel``  — device-mesh helpers for data-parallel ×
  table-sharded training.
* ``rec_now_tpu.training``  — train step/loop, AUC/GAUC metrics, synthetic
  Criteo-style data, checkpointing.
* ``rec_now_tpu.models``    — the benchmark model families (FM, DCN-v2 +
  SENET, xDeepFM CIN + iPNN, MMoE + PLE + STAR multi-task).
"""

__version__ = "0.1.0"
