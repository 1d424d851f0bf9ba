"""Multi-hash embedding layers (hash trick with collision mitigation).

Reference: rec_now/layers/multi_hash_layer.py:11-238.  ``num_hash``
independently-salted hash functions map ids into [0, num_bins); each hash
has its own embedding table (:class:`MultiHashLayer`) or all hashes share
one offset-indexed table (:class:`FastMultiHashLayer`); outputs combine
by sum / mean / concat.

TPU-native: ids are hashed on device with the splitmix64 mixer
(rec_now_tpu/ops/hashing.py) instead of TF's string SipHash; the Fast
variant does one gather of shape (B, L, Nh) from a single
(num_bins * num_hash, D) table — a single HBM gather instead of Nh.

Symbols: B batch, L ids per sample, D embedding dim, Nh num hash.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Initializer, get_initializer
from rec_now_tpu.ops.hashing import salted_hash


def _resolve_salts(salts, num_hash: int):
    if isinstance(salts, int):
        out = [salts + i for i in range(num_hash)]
    else:
        out = list(salts)
    while len(out) < num_hash:
        out.append(out[-1] + 1)
    return out


def _default_embedding_init():
    return nn.initializers.uniform(scale=2e-4)  # ~U(-1e-4, 1e-4) centered


def _uniform_pm(scale: float):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class MultiHashLayer(nn.Module):
    """Per-hash embedding tables, combined by sum/mean/concat."""
    num_bins: int
    embedding_dim: int = -1
    num_hash: int = 2
    salts: Union[int, Sequence[int]] = 1
    embeddings_initializer: Optional[Initializer] = None

    def _embed_init(self):
        if self.embeddings_initializer is None:
            return _uniform_pm(1e-4)
        return get_initializer(self.embeddings_initializer)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 combiner: Optional[str] = "sum"):
        """Hash (and optionally embed) ids.

        Args:
            inputs: int ids, shape (B,) or (B, L).
            combiner: 'concat' | 'sum' | 'mean' | None over the Nh
                outputs.

        Returns:
            With embedding: (B[, L], D) for sum/mean, (B[, L], Nh*D) for
            concat, else a list.  Without embedding: hashed bin ids.
        """
        salts = _resolve_salts(self.salts, self.num_hash)
        outputs = []
        for i in range(self.num_hash):
            hashed = salted_hash(inputs, salts[i], self.num_bins)
            if self.embedding_dim > 0:
                table = self.param(f"embedding_{i}", self._embed_init(),
                                   (self.num_bins, self.embedding_dim))
                outputs.append(jnp.take(table, hashed, axis=0))
            else:
                outputs.append(hashed)
        if len(outputs) == 1:
            return outputs[-1]
        if combiner == "concat":
            if self.embedding_dim > 0:
                return jnp.concatenate(outputs, axis=-1)
            return jnp.stack(outputs, axis=-1)
        if combiner == "sum" and self.embedding_dim > 0:
            return sum(outputs[1:], outputs[0])
        if combiner == "mean" and self.embedding_dim > 0:
            return sum(outputs[1:], outputs[0]) * (1.0 / len(outputs))
        return outputs

    def get(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Sum-combined embedding of ids (reference :103-107)."""
        return self(inputs, combiner="sum")

    def get_pooling(self, keys: jnp.ndarray,
                    weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Weighted sum-pooled embedding over the id axis.

        Args:
            keys: (B, L) ids.
            weights: optional (B, L) weights.

        Returns:
            (B, D).
        """
        emb = self.get(keys)                              # (B, L, D)
        if weights is not None:
            emb = weights[..., None] * emb
        if emb.ndim > 2:
            axes = tuple(range(1, emb.ndim - 1))
            return jnp.sum(emb, axis=axes)
        return emb


class FastMultiHashLayer(nn.Module):
    """Single shared (num_bins * num_hash, D) table with offset ids.

    Matches reference :122-238: hash i looks up rows
    [i * num_bins, (i+1) * num_bins); one gather fetches all Nh
    embeddings at once.
    """
    num_bins: int
    embedding_dim: int = -1
    num_hash: int = 2
    salts: Union[int, Sequence[int]] = 1
    embeddings_initializer: Optional[Initializer] = None

    def _embed_init(self):
        if self.embeddings_initializer is None:
            return _uniform_pm(1e-4)
        return get_initializer(self.embeddings_initializer)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 combiner: Optional[str] = "sum"):
        """Hash (and optionally embed) ids via the shared table.

        Args / returns: see :class:`MultiHashLayer`; for
        ``combiner=None`` with embedding the raw (B[, L], Nh, D) stack is
        returned.
        """
        salts = _resolve_salts(self.salts, self.num_hash)
        hashed = [salted_hash(inputs, salts[i], self.num_bins)
                  + i * self.num_bins
                  for i in range(self.num_hash)]
        stacked = jnp.stack(hashed, axis=-1)              # (B[,L], Nh)
        if self.embedding_dim <= 0:
            if combiner == "concat":
                return stacked
            return stacked
        table = self.param("embedding", self._embed_init(),
                           (self.num_bins * self.num_hash,
                            self.embedding_dim))
        emb = jnp.take(table, stacked, axis=0)            # (B[,L], Nh, D)
        if combiner == "concat":
            return jnp.reshape(emb, (*emb.shape[:-2],
                                     emb.shape[-2] * emb.shape[-1]))
        if combiner == "sum":
            return jnp.sum(emb, axis=-2)
        if combiner == "mean":
            return jnp.mean(emb, axis=-2)
        return emb

    def get(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Sum-combined embedding of ids."""
        return self(inputs, combiner="sum")

    def get_pooling(self, keys: jnp.ndarray,
                    weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Weighted sum-pooled embedding over the id axis -> (B, D)."""
        emb = self.get(keys)
        if weights is not None:
            emb = weights[..., None] * emb
        if emb.ndim > 2:
            axes = tuple(range(1, emb.ndim - 1))
            return jnp.sum(emb, axis=axes)
        return emb
