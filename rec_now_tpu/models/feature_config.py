"""Feature configuration for the benchmark model families.

New scope relative to the reference (which has no config system —
SURVEY.md §5): a minimal frozen config describing the Criteo-style input
layout used by all five benchmark configs (BASELINE.json): ``num_dense``
dense floats and ``num_sparse`` categorical fields embedded at
``embedding_dim`` from one shared id space.

All sparse fields share a single (mod-sharded) table; field f's raw ids
are offset into disjoint ranges so the whole batch's lookups ride one
collective exchange (see rec_now_tpu/embedding/sharded.py).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Input layout shared by the benchmark models."""
    num_dense: int = 13
    num_sparse: int = 26
    rows_per_field: int = 100_000
    embedding_dim: int = 16

    @property
    def total_rows(self) -> int:
        return self.num_sparse * self.rows_per_field

    def field_offsets(self) -> np.ndarray:
        """(num_sparse,) id offset of each field in the shared table."""
        return (np.arange(self.num_sparse) * self.rows_per_field
                ).astype(np.int32)

    def global_ids(self, raw_ids: jnp.ndarray) -> jnp.ndarray:
        """Offset per-field raw ids (B, F) into the shared id space."""
        offs = jnp.asarray(self.field_offsets())
        return (raw_ids % self.rows_per_field) + offs[None, :]


Batch = Tuple  # alias documented in training.data
