"""Compressed host->device wire format for training batches.

New scope relative to the reference (its PS framework owned the wire).
The host->HBM link is the scarcest resource when feeding a TPU rec
model: a raw batch costs 172 B/example (13xf32 dense + 26xi32 ids +
4xf32/i32 scalars) while the information content is far smaller.  This
module packs batches host-side (numpy, vectorized) and decodes on device
inside the jitted step (a few cheap shifts — VPU noise):

  * sparse ids:  bit-packed to ``ceil(log2(rows_per_field))`` bits each
    (17 bits for the standard 100k/field layout) into uint32 words;
  * dense:       float16 (post-log1p features span ~[-20, 20] with ~1e-3
    resolution — far inside f16 range);
  * labels/cvr:  uint8 (0/1); domain index: uint8;
  * group ids:   uint16 when the group space fits, else uint32.

Standard layout: 91 B/example vs 172 raw — 1.9x more examples/s through
the same link.  Packing is vectorized numpy (runs on the prefetch
thread); decoding is traced into the jitted train step so the packed
form is also what crosses the PCIe/tunnel link.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from rec_now_tpu.training.data import Batch


class PackedBatch(NamedTuple):
    """Host-side packed batch (numpy); leading axes preserved."""
    dense: np.ndarray       # (..., num_dense) float16
    id_words: np.ndarray    # (..., num_words) uint32 bit-packed ids
    labels: np.ndarray      # (...,) uint8
    group_ids: np.ndarray   # (...,) uint16 | uint32
    cvr_labels: np.ndarray  # (...,) uint8
    domain_idx: np.ndarray  # (...,) uint8 serving domain


def id_bits(rows_per_field: int) -> int:
    """Bits per id: ceil(log2(rows_per_field)), min 1, max 32."""
    return max(1, min(32, math.ceil(math.log2(max(2, rows_per_field)))))


def num_words(num_sparse: int, bits: int) -> int:
    """uint32 words per example (+1 pad word so decode is branchless)."""
    return (num_sparse * bits + 31) // 32 + 1


def pack_ids(ids: np.ndarray, bits: int) -> np.ndarray:
    """Bit-pack (..., F) ids (< 2**bits) into (..., W) uint32 words."""
    f = ids.shape[-1]
    w = num_words(f, bits)
    out = np.zeros(ids.shape[:-1] + (w,), np.uint32)
    vals = ids.astype(np.uint32)
    for i in range(f):
        start = i * bits
        wi, sh = start // 32, start % 32
        # low word: numpy << on uint32 keeps the low 32 bits, which is
        # exactly the contribution to this word
        out[..., wi] |= vals[..., i] << np.uint32(sh)
        if sh + bits > 32:
            out[..., wi + 1] |= vals[..., i] >> np.uint32(32 - sh)
    return out


def unpack_ids(words: jnp.ndarray, num_sparse: int,
               bits: int) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_ids` -> (..., F) int32."""
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 \
        else jnp.uint32(0xFFFFFFFF)
    cols = []
    for i in range(num_sparse):
        start = i * bits
        wi, sh = start // 32, start % 32
        lo = words[..., wi] >> jnp.uint32(sh)
        if sh:  # sh == 0 -> the low word already holds all the bits
            hi = words[..., wi + 1] << jnp.uint32(32 - sh)
            lo = lo | hi
        cols.append((lo & mask).astype(jnp.int32))
    return jnp.stack(cols, axis=-1)


class WireFormat:
    """Pack/decode pair bound to a feature layout."""

    def __init__(self, num_sparse: int, rows_per_field: int,
                 num_groups: int = 1 << 31):
        self.num_sparse = num_sparse
        self.bits = id_bits(rows_per_field)
        self.words = num_words(num_sparse, self.bits)
        self.group_dtype = (np.uint16 if num_groups <= 1 << 16
                            else np.uint32)

    def pack(self, batch: Batch) -> PackedBatch:
        """Compress one host batch (arbitrary leading axes)."""
        return PackedBatch(
            dense=batch.dense.astype(np.float16),
            id_words=pack_ids(batch.sparse_ids, self.bits),
            labels=batch.labels.astype(np.uint8),
            group_ids=batch.group_ids.astype(self.group_dtype),
            cvr_labels=batch.cvr_labels.astype(np.uint8),
            domain_idx=batch.domain_idx.astype(np.uint8))

    def pack_window(self, batches: Sequence[Batch]) -> PackedBatch:
        """Stack + compress a window of identically-shaped batches."""
        return PackedBatch(
            dense=np.stack([b.dense for b in batches]
                           ).astype(np.float16),
            id_words=pack_ids(
                np.stack([b.sparse_ids for b in batches]), self.bits),
            labels=np.stack([b.labels for b in batches]
                            ).astype(np.uint8),
            group_ids=np.stack([b.group_ids for b in batches]
                               ).astype(self.group_dtype),
            cvr_labels=np.stack([b.cvr_labels for b in batches]
                                ).astype(np.uint8),
            domain_idx=np.stack([b.domain_idx for b in batches]
                                ).astype(np.uint8))

    def decode(self, packed) -> Tuple[jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray, jnp.ndarray]:
        """Device-side decode -> (dense f32, ids i32, labels f32,
        groups i32, cvr f32, domain i32).  Traced inside jit."""
        dense = packed.dense.astype(jnp.float32)
        ids = unpack_ids(packed.id_words, self.num_sparse, self.bits)
        labels = packed.labels.astype(jnp.float32)
        groups = packed.group_ids.astype(jnp.int32)
        cvr = packed.cvr_labels.astype(jnp.float32)
        domain = packed.domain_idx.astype(jnp.int32)
        return dense, ids, labels, groups, cvr, domain

    @staticmethod
    def wire_cost(num_dense: int, num_sparse: int,
                  rows_per_field: int,
                  num_groups: int = 1 << 31) -> Tuple[int, int]:
        """(packed, raw) bytes per example."""
        bits = id_bits(rows_per_field)
        packed = (num_dense * 2 + num_words(num_sparse, bits) * 4
                  + 1 + (2 if num_groups <= 1 << 16 else 4) + 1 + 1)
        raw = num_dense * 4 + num_sparse * 4 + 4 + 4 + 4 + 4
        return packed, raw
