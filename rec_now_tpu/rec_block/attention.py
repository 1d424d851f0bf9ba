"""Target attention over user behavior history.

Reference: rec_now/rec_block/attention.py:12-82.

* :func:`attention_by_dot_product` — dot-product target attention with
  optional negative-score filtering.  Pure contractions; one fused XLA
  region.
* :class:`DNNAttention` — DIN-style attention.  The reference builds a
  Keras model *inside the call path* (attention.py:67-74, flagged
  non-idiomatic in SURVEY.md §2.2); here it is a proper Flax module so
  parameters live in the variable tree like everything else.  An
  optional ``mask`` argument handles padded history (the reference
  relied on zero embeddings contributing zero scores).

Symbols: B batch, L history length, D embedding dim.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.core.config import Activation, get_activation


def attention_by_dot_product(user_emb: jnp.ndarray,
                             doc_emb: jnp.ndarray,
                             filter_neg: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dot-product target attention.

    Args:
        user_emb: (B, L, D) user behavior embeddings.
        doc_emb: (B, D) target item embedding.
        filter_neg: clamp negative attention scores to zero.

    Returns:
        attn_mat: (B, D) attention-weighted sum of the history.
        attn_score_sum: (B, 1) sum of attention scores.
    """
    attn_score = jnp.sum(user_emb * doc_emb[:, None, :], axis=2,
                         keepdims=True)                   # (B, L, 1)
    if filter_neg:
        attn_score = jnp.maximum(attn_score, 0.0)
    attn_mat = jnp.sum(user_emb * attn_score, axis=1)     # (B, D)
    attn_score_sum = jnp.sum(jnp.squeeze(attn_score, axis=2), axis=1,
                             keepdims=True)               # (B, 1)
    return attn_mat, attn_score_sum


class DNNAttention(nn.Module):
    """DIN-style DNN attention: MLP([hist, target]) -> sigmoid scores."""
    dnn_dims: Sequence[int]
    dnn_activation: Activation = "relu"

    @nn.compact
    def __call__(self, user_emb: jnp.ndarray, doc_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compute DNN attention.

        Args:
            user_emb: (B, L, D) behavior history.
            doc_emb: (B, D) target item.
            mask: optional (B, L) bool validity of history positions.

        Returns:
            attn_mat: (B, D) weighted history sum.
            attn_score_sum: (B, 1) score sum.
        """
        length = user_emb.shape[1]
        doc_tiled = jnp.broadcast_to(doc_emb[:, None, :],
                                     (doc_emb.shape[0], length,
                                      doc_emb.shape[-1]))  # (B, L, D)
        x = jnp.concatenate([user_emb, doc_tiled], axis=-1)  # (B, L, 2D)

        dims = list(self.dnn_dims)
        if dims[-1] != 1:
            dims.append(1)
        act = get_activation(self.dnn_activation)
        for i, dim in enumerate(dims):
            x = nn.Dense(dim, name=f"layer{i}")(x)
            if i < len(dims) - 1:
                x = act(x)
        attn_score = jax.nn.sigmoid(x)                    # (B, L, 1)
        if mask is not None:
            attn_score = attn_score * mask[..., None].astype(attn_score.dtype)

        attn_mat = jnp.sum(user_emb * attn_score, axis=1)  # (B, D)
        attn_score_sum = jnp.sum(jnp.squeeze(attn_score, axis=2), axis=1,
                                 keepdims=True)            # (B, 1)
        return attn_mat, attn_score_sum


def attention_by_dnn(user_emb: jnp.ndarray, doc_emb: jnp.ndarray,
                     dnn_dims: Sequence[int],
                     dnn_activation: Activation = "relu",
                     dnn_name: str = "din", *, rngs=None, params=None):
    """Functional wrapper mirroring the reference signature.

    Initializes (or reuses) a :class:`DNNAttention` module and applies
    it.  Returns ``(attn_mat, attn_score_sum, params)`` — ``params``
    replaces the reference's returned Keras model (attention.py:82).
    """
    module = DNNAttention(dnn_dims=list(dnn_dims),
                          dnn_activation=dnn_activation, name=None)
    if params is None:
        if rngs is None:
            rngs = jax.random.PRNGKey(0)
        params = module.init(rngs, user_emb, doc_emb)
    attn_mat, score_sum = module.apply(params, user_emb, doc_emb)
    return attn_mat, score_sum, params
