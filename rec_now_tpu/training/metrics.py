"""AUC / GAUC evaluation metrics.

New scope relative to the reference (no metrics — SURVEY.md §5); needed
for the north-star parity measurement (BASELINE.json: "AUC/GAUC parity").

* :func:`binary_auc` — exact batch AUC on device via a rank sort
  (Mann-Whitney U), O(B log B), jit-able.
* :func:`batch_gauc` — in-batch grouped AUC with the same fixed-shape
  (B, B) masked-pair machinery as the pairwise loss: per group,
  concordant / total (pos, neg) pairs; groups weighted by their pair
  count.  Matches the GAUC the in-batch pairwise loss optimizes.
* :class:`StreamingGAUC` — exact corpus-level GAUC on the host: buffers
  (group, label, score) triples in numpy and computes per-group AUC at
  the end (groups span batches, which no fixed-shape in-batch statistic
  can capture).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def binary_auc(labels: jnp.ndarray, scores: jnp.ndarray,
               sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Exact ROC AUC via the rank statistic.  Returns 0.5 when degenerate.

    Args:
        labels: (B,) 0/1.
        scores: (B,) monotone scores (logits fine).
        sample_weight: optional (B,) weights.

    Returns:
        scalar AUC in [0, 1].
    """
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    scores = jnp.reshape(scores, (-1,))
    if sample_weight is None:
        sample_weight = jnp.ones_like(labels)
    w = jnp.reshape(sample_weight, (-1,)).astype(jnp.float32)

    order = jnp.argsort(scores)
    sorted_labels = labels[order]
    sorted_w = w[order]
    sorted_scores = scores[order]
    n = sorted_scores.shape[0]
    idx = jnp.arange(n)

    neg_w = sorted_w * (1.0 - sorted_labels)
    cum_neg = jnp.cumsum(neg_w)                        # inclusive
    cum_neg_before = cum_neg - neg_w

    # tie-group extents per element (ties share avg rank -> each positive
    # counts all strictly-lower negative weight plus half its tie group's
    # negative weight)
    same_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_scores[1:] == sorted_scores[:-1]])
    start = jax.lax.cummax(jnp.where(same_prev, 0, idx))
    same_next = jnp.concatenate(
        [sorted_scores[1:] == sorted_scores[:-1], jnp.zeros((1,), bool)])
    end = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(same_next, n - 1, idx))))

    neg_below_group = cum_neg_before[start]
    group_tied_neg = cum_neg[end] - neg_below_group
    u = jnp.sum(sorted_w * sorted_labels
                * (neg_below_group + 0.5 * group_tied_neg))
    pos_w = jnp.sum(w * labels)
    neg_w_total = jnp.sum(w * (1.0 - labels))
    denom = pos_w * neg_w_total
    return jnp.where(denom > 0, u / jnp.where(denom > 0, denom, 1.0), 0.5)


def batch_gauc_stats(labels: jnp.ndarray, scores: jnp.ndarray,
                     group_ids: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(concordant-win sum, pair total) for in-batch GAUC (jit-safe).

    Separated from :func:`batch_gauc` so a scanned eval loop can
    accumulate the two sufficient statistics across batches and divide
    once at the end (pair-weighted streaming in-batch GAUC).
    """
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    scores = jnp.reshape(scores, (-1,))
    g = jnp.reshape(group_ids, (-1,))

    same = (g[:, None] == g[None, :])
    pos_neg = (labels[:, None] > labels[None, :])
    pair = jnp.logical_and(same, pos_neg).astype(jnp.float32)  # (B, B)
    s_i = scores[:, None]
    s_j = scores[None, :]
    concordant = (s_i > s_j).astype(jnp.float32) \
        + 0.5 * (s_i == s_j).astype(jnp.float32)
    return jnp.sum(pair * concordant), jnp.sum(pair)


def batch_gauc(labels: jnp.ndarray, scores: jnp.ndarray,
               group_ids: jnp.ndarray) -> jnp.ndarray:
    """In-batch grouped AUC via fixed-shape (B, B) pair statistics.

    GAUC = sum_g pairs_g * AUC_g / sum_g pairs_g, computed without any
    dynamic grouping: concordant(i, j) over same-group (pos_i, neg_j)
    pairs, ties counted half.

    Returns 0.5 when the batch has no valid (pos, neg) same-group pair.
    """
    win, total = batch_gauc_stats(labels, scores, group_ids)
    return jnp.where(total > 0, win / jnp.where(total > 0, total, 1.0), 0.5)


class DeviceStreamingAUC:
    """Device-side bucketed streaming AUC (bounded host traffic).

    ``Trainer.evaluate`` streams logits to the host and sorts there —
    exact, but a full held-out epoch stalls on the host link and on
    single-threaded numpy.  This accumulator instead keeps per-bucket
    positive/negative weight histograms ON DEVICE: ``update`` is one
    cached-jitted scatter-add of shape-(K,) segment sums, and
    ``result`` moves 2·K floats (not 2·N) once at the end.

    Scores are mapped through sigmoid into K uniform probability
    buckets; pairs landing in the same bucket count half, so the
    approximation error is O(1/K) — < 1e-3 at the default K=4096
    (tested against the exact host AUC in tests/training/test_metrics.py).

    The histogram state is a functional value (returned, not mutated)
    so it can thread through a ``lax.scan`` eval loop.
    """

    def __init__(self, num_buckets: int = 4096):
        self.k = int(num_buckets)
        self.hist = jnp.zeros((2, self.k), jnp.float32)

    @staticmethod
    def accumulate(hist: jnp.ndarray, labels: jnp.ndarray,
                   logits: jnp.ndarray,
                   weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Pure update: add one batch to a (2, K) histogram (jit-safe)."""
        k = hist.shape[1]
        labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
        logits = jnp.reshape(logits, (-1,))
        w = (jnp.ones_like(labels) if weights is None
             else jnp.reshape(weights, (-1,)).astype(jnp.float32))
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        b = jnp.clip((p * k).astype(jnp.int32), 0, k - 1)
        pos = jax.ops.segment_sum(w * labels, b, num_segments=k)
        neg = jax.ops.segment_sum(w * (1.0 - labels), b, num_segments=k)
        return hist + jnp.stack([pos, neg])

    def update(self, labels, logits, weights=None) -> None:
        """Accumulate one batch (dispatches one tiny jitted kernel)."""
        self.hist = _jit_accumulate(self.hist, jnp.asarray(labels),
                                    jnp.asarray(logits),
                                    None if weights is None
                                    else jnp.asarray(weights))

    @staticmethod
    def auc_from_hist(hist: np.ndarray) -> float:
        """AUC from a (2, K) bucket histogram (host, O(K))."""
        pos, neg = np.asarray(hist, np.float64)
        neg_below = np.cumsum(neg) - neg
        u = float(np.sum(pos * (neg_below + 0.5 * neg)))
        denom = pos.sum() * neg.sum()
        return u / denom if denom > 0 else 0.5

    def result(self) -> Dict[str, float]:
        """{'auc', 'num_pos', 'num_neg'} — one 2·K-float device fetch."""
        hist = np.asarray(jax.device_get(self.hist), np.float64)
        return {"auc": self.auc_from_hist(hist),
                "num_pos": float(hist[0].sum()),
                "num_neg": float(hist[1].sum())}


@jax.jit
def _jit_accumulate(hist, labels, logits, weights):
    return DeviceStreamingAUC.accumulate(hist, labels, logits, weights)


class DeviceGroupedAUC:
    """Device-side CORPUS-level GAUC via per-group score histograms.

    The reference's flagship online metric is corpus GAUC — per-group
    AUC over groups that span batches (README.md:5 credits the in-batch
    pairwise loss with >1% of it).  The exact host path
    (:class:`StreamingGAUC`) streams every (group, label, score) triple
    off the device; this accumulator instead keeps a
    ``(2 * num_groups, num_buckets)`` positive/negative score-bucket
    histogram ON DEVICE, indexed by a host-assigned dense corpus group
    slot (see ``Trainer.evaluate_device``): ``accumulate`` is two
    K-wide ROW scatter-adds into the (donated) scan carry, ``finish``
    reduces to (3, G) per-group sufficient statistics on device, and
    the host fetches O(G) floats once at the end.

    Per-group AUC from its (2, K) histogram has the same O(1/K) tie
    error as :class:`DeviceStreamingAUC` — < 1e-3 at K=512 against the
    exact host GAUC (tested).  Groups beyond ``num_groups`` clamp into
    the last slot (surfaced via ``overflow`` by the caller).
    """

    @staticmethod
    def init(num_groups: int, num_buckets: int) -> jnp.ndarray:
        """(2 * G, K) histogram: rows [0, G) positive, [G, 2G) negative.

        The slot-major-by-row layout makes ``accumulate`` a LINE
        scatter of K-wide rows — TPU scatters move whole rows, and the
        flat (2, G*K) scalar-scatter form measured ~10x slower at
        G*K in the millions (r4).
        """
        return jnp.zeros((2 * num_groups, num_buckets), jnp.float32)

    @staticmethod
    def accumulate(ghist: jnp.ndarray, slots: jnp.ndarray,
                   labels: jnp.ndarray, logits: jnp.ndarray,
                   num_buckets: int,
                   weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Pure update: add one batch (jit-safe, scan-friendly).

        Two row scatter-adds straight into the (donated) carry — no
        per-step G*K zero-fill or stack/add churn.

        Args:
            ghist: (2 * G, K) running histogram (:meth:`init` layout).
            slots: (B,) int corpus group slots in [0, G).
            labels: (B,) 0/1.
            logits: (B,) scores.
            num_buckets: K (static, == ghist.shape[1]).
            weights: optional (B,) example weights (0 = ignore).
        """
        k = num_buckets
        g = ghist.shape[0] // 2
        labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
        logits = jnp.reshape(logits, (-1,))
        slots = jnp.clip(jnp.reshape(slots, (-1,)).astype(jnp.int32),
                         0, g - 1)
        w = (jnp.ones_like(labels) if weights is None
             else jnp.reshape(weights, (-1,)).astype(jnp.float32))
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        b = jnp.clip((p * k).astype(jnp.int32), 0, k - 1)
        onehot = (b[:, None] == jnp.arange(k)[None, :]).astype(
            jnp.float32)                                   # (B, K)
        pos_rows = onehot * (w * labels)[:, None]
        neg_rows = onehot * (w * (1.0 - labels))[:, None]
        return ghist.at[slots].add(pos_rows).at[g + slots].add(neg_rows)

    @staticmethod
    def finish(ghist: jnp.ndarray) -> jnp.ndarray:
        """Device-side per-group sufficient statistics (jit this).

        Reduces the (2 * G, K) histogram to (3, G): the Mann-Whitney U
        numerator and the positive/negative totals per group — so the
        host fetch is O(G), not O(G * K) (the full histogram is ~100 MB
        at production slot counts, which over a thin host link costs
        seconds).
        """
        g = ghist.shape[0] // 2
        pos, neg = ghist[:g], ghist[g:]                    # (G, K)
        neg_below = jnp.cumsum(neg, axis=1) - neg
        u = jnp.sum(pos * (neg_below + 0.5 * neg), axis=1)
        return jnp.stack([u, pos.sum(axis=1), neg.sum(axis=1)])

    @staticmethod
    def gauc_from_stats(stats: np.ndarray,
                        weight_by: str = "pairs") -> Dict[str, float]:
        """Host finish from (3, G) per-group stats."""
        u, n_pos, n_neg = np.asarray(stats, np.float64)
        denom = n_pos * n_neg
        valid = denom > 0
        auc_g = np.where(valid, u / np.where(valid, denom, 1.0), 0.0)
        w = denom if weight_by == "pairs" else n_pos + n_neg
        w = np.where(valid, w, 0.0)
        total_w = w.sum()
        return {
            "gauc": float((w * auc_g).sum() / total_w)
            if total_w > 0 else float("nan"),
            "num_groups": float(valid.sum()),
        }

    @staticmethod
    def gauc_from_hist(ghist: np.ndarray, num_buckets: int,
                       weight_by: str = "pairs") -> Dict[str, float]:
        """Host-side finish from the full (2 * G, K) histogram."""
        h = np.asarray(ghist, np.float64)
        g = h.shape[0] // 2
        pos, neg = h[:g], h[g:]
        neg_below = np.cumsum(neg, axis=1) - neg             # (G, K)
        u = np.sum(pos * (neg_below + 0.5 * neg), axis=1)    # (G,)
        stats = np.stack([u, pos.sum(axis=1), neg.sum(axis=1)])
        return DeviceGroupedAUC.gauc_from_stats(stats, weight_by)


class CorpusGroupIndexer:
    """Host-side group-id -> dense corpus slot mapping for device GAUC.

    Single-process: a dict assigns each distinct group id the next
    dense index — EXACT grouping while the corpus has fewer than
    ``num_slots`` groups; overflow groups fold into the hash space of
    the last ``num_slots // 8`` slots (surfaced via ``overflowed``).

    Multi-process: a dict would be process-local and inconsistent, so
    every process uses the same salted multiplicative hash — grouping
    is consistent everywhere with birthday-bound collisions
    (E[colliding groups] ~ n_groups^2 / (2 * num_slots)).
    """

    def __init__(self, num_slots: int, use_hash: bool = False):
        self.num_slots = int(num_slots)
        self.use_hash = bool(use_hash)
        self._map: Dict[int, int] = {}
        # groups whose slot is shared with a different group: dict-mode
        # overflow spills, or hash-mode collisions.  Surfaced by
        # evaluate_device as ``gauc_overflow`` so degraded grouping is
        # never silent.
        self.overflowed = 0
        self._collided: set = set()

    def assign(self, group_ids: np.ndarray) -> np.ndarray:
        """(B,) raw group ids -> (B,) dense slots in [0, num_slots)."""
        g = np.asarray(group_ids).reshape(-1)
        if self.use_hash:
            h = (g.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + np.uint64(0xD6E8FEB8)) >> np.uint64(13)
            slots = (h % np.uint64(self.num_slots)).astype(np.int64)
            # collision accounting (the hash itself needs no dict, but
            # silent group merges would bias GAUC unobservably)
            uniq, first = np.unique(g, return_index=True)
            for gid, slot in zip(uniq.tolist(), slots[first].tolist()):
                prev = self._map.get(slot)
                if prev is None:
                    self._map[slot] = gid
                elif prev != gid and gid not in self._collided:
                    self._collided.add(gid)
                    self.overflowed += 1
            return slots
        cap = self.num_slots - max(1, self.num_slots // 8)
        uniq, inv = np.unique(g, return_inverse=True)
        slots = np.empty(uniq.shape, np.int64)
        for i, gid in enumerate(uniq.tolist()):
            slot = self._map.get(gid)
            if slot is None:
                if len(self._map) < cap:
                    slot = len(self._map)
                else:   # overflow: hash into the reserved tail slots
                    self.overflowed += 1
                    slot = cap + hash(gid) % (self.num_slots - cap)
                self._map[gid] = slot
            slots[i] = slot
        return slots[inv]


class StreamingGAUC:
    """Host-side exact GAUC over an eval stream.

    Accumulates (group, label, score) and computes, at ``result()``,
    the impression-weighted mean of per-group AUCs over groups having
    both classes — the standard production GAUC definition.
    """

    def __init__(self, weight_by: str = "pairs"):
        if weight_by not in ("pairs", "impressions"):
            raise ValueError(weight_by)
        self.weight_by = weight_by
        self._groups: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []
        self._scores: List[np.ndarray] = []

    def update(self, group_ids, labels, scores):
        """Buffer one batch (accepts numpy or jax arrays)."""
        self._groups.append(np.asarray(group_ids).reshape(-1))
        self._labels.append(np.asarray(labels).reshape(-1))
        self._scores.append(np.asarray(scores).reshape(-1))

    @staticmethod
    def _auc(labels: np.ndarray, scores: np.ndarray) -> float:
        order = np.argsort(scores)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(scores) + 1)
        # average ranks over ties
        sorted_scores = scores[order]
        _, inv, counts = np.unique(sorted_scores, return_inverse=True,
                                   return_counts=True)
        cum = np.cumsum(counts)
        avg = (cum - (counts - 1) / 2.0)
        ranks[order] = avg[inv]
        n_pos = labels.sum()
        n_neg = len(labels) - n_pos
        if n_pos == 0 or n_neg == 0:
            return float("nan")
        u = ranks[labels > 0].sum() - n_pos * (n_pos + 1) / 2.0
        return float(u / (n_pos * n_neg))

    def result(self) -> Dict[str, float]:
        """Compute {'gauc', 'auc', 'num_groups'} over everything buffered."""
        g = np.concatenate(self._groups)
        y = np.concatenate(self._labels)
        s = np.concatenate(self._scores)
        auc_all = self._auc(y, s)
        total_w = 0.0
        acc = 0.0
        num_groups = 0
        for gid in np.unique(g):
            m = g == gid
            yl, sl = y[m], s[m]
            n_pos = yl.sum()
            n_neg = len(yl) - n_pos
            if n_pos == 0 or n_neg == 0:
                continue
            w = (n_pos * n_neg if self.weight_by == "pairs"
                 else len(yl))
            acc += w * self._auc(yl, sl)
            total_w += w
            num_groups += 1
        gauc = float(acc / total_w) if total_w > 0 else float("nan")
        return {"gauc": gauc, "auc": float(auc_all),
                "num_groups": float(num_groups)}
