"""Evaluator: batch collection + metric aggregation.

Parity target: the reference's ProxyEvaluator/TopK/Loss evaluators
(recbole/evaluator/proxy_evaluator.py, evaluators.py), re-designed so the
per-batch reduction runs ON DEVICE inside the jitted eval step: each batch
contributes per-metric (K,) partial sums over its valid users; the host only
accumulates scalars. No topk-index matrices travel back to the host.
"""

import numpy as np
import jax.numpy as jnp

from .metrics import TOPK_METRIC_FNS, VALUE_METRIC_FNS


def topk_metric_sums(metrics, pos_index, pos_len, user_mask):
    """Per-batch device-side reduction for ranking metrics.

    Args:
        metrics: static list of lowercase metric names.
        pos_index: (B, K) 0/1 relevance of each top-k slot.
        pos_len: (B,) ground-truth positive counts.
        user_mask: (B,) validity of each row (padding rows are 0).

    Returns:
        dict metric -> (K,) sum over valid users, plus "_count" scalar.
    """
    w = user_mask.astype(jnp.float32)[:, None]
    out = {}
    for name in metrics:
        mat = TOPK_METRIC_FNS[name](pos_index.astype(jnp.float32), pos_len)
        out[name] = jnp.sum(mat * w, axis=0)
    out["_count"] = jnp.sum(user_mask.astype(jnp.float32))
    return out


def gauc_metric_sums(scores, pos_sorted_or_matrix, pos_len, user_len,
                     user_mask, sorted_already=False):
    """Per-batch device-side GAUC partials (parity: reference RankEvaluator
    average_rank + gauc_, evaluators.py:153-286 / metrics.py:167-220).

    Args:
        scores: (B, C) float scores, invalid slots already at -inf.
        pos_sorted_or_matrix: (B, C) 0/1 positives aligned with scores.
        pos_len: (B,) positive counts.
        user_len: (B,) candidate-list lengths (incl. -inf padding slots,
            matching the reference's note on padding influencing ranks).
        user_mask: (B,) row validity.

    Returns:
        {"gauc_num": scalar, "gauc_den": scalar} — weighted AUC numerator
        (sum of user_auc * pos_len over valid users) and denominator.
    """
    B, C = scores.shape
    order = jnp.argsort(-scores, axis=1)
    ss = jnp.take_along_axis(scores, order, 1)
    pos_sorted = jnp.take_along_axis(pos_sorted_or_matrix, order, 1)
    # average rank over tie groups (scipy rankdata 'average' semantics)
    obs = jnp.concatenate(
        [jnp.ones((B, 1), bool), ss[:, 1:] != ss[:, :-1]], axis=1)
    grp = jnp.cumsum(obs.astype(jnp.int32), axis=1)            # 1-based groups
    idx = jnp.arange(1, C + 1, dtype=jnp.float32)[None, :]
    rows = jnp.arange(B)[:, None]
    gstart = jnp.full((B, C + 1), jnp.inf).at[rows, grp].min(
        jnp.broadcast_to(idx, (B, C)))
    gend = jnp.zeros((B, C + 1)).at[rows, grp].max(
        jnp.broadcast_to(idx, (B, C)))
    avg_rank = 0.5 * (jnp.take_along_axis(gstart, grp, 1)
                      + jnp.take_along_axis(gend, grp, 1))     # (B, C)
    pos_rank_sum = jnp.sum(avg_rank * pos_sorted.astype(jnp.float32), axis=1)

    pos_len = pos_len.astype(jnp.float32)
    user_len = user_len.astype(jnp.float32)
    neg_len = user_len - pos_len
    valid = (pos_len > 0) & (neg_len > 0) & (user_mask > 0)
    pair_num = (user_len + 1.0) * pos_len - pos_len * (pos_len + 1.0) / 2.0 \
        - pos_rank_sum
    user_auc = jnp.where(valid, pair_num / jnp.maximum(neg_len * pos_len, 1.0),
                         0.0)
    w = jnp.where(valid, pos_len, 0.0)
    return {"gauc_num": jnp.sum(user_auc * w), "gauc_den": jnp.sum(w)}


RANK_METRICS = {"gauc"}


class TopKCollector:
    """Host-side accumulator for ranking (top-k + rank) metrics."""

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk_metrics = [m for m in self.metrics if m in TOPK_METRIC_FNS]
        self.rank_metrics = [m for m in self.metrics if m in RANK_METRICS]
        self.topk = list(config["topk"])
        if any(k <= 0 for k in self.topk):
            raise ValueError("topk must be positive")
        self.max_k = max(self.topk)
        self.decimals = config["metric_decimal_place"]
        self.reset()

    @property
    def needs_gauc(self):
        return "gauc" in self.rank_metrics

    def reset(self):
        self._sums = {m: np.zeros(self.max_k, dtype=np.float64)
                      for m in self.topk_metrics}
        self._count = 0.0
        self._gauc_num = 0.0
        self._gauc_den = 0.0

    def collect(self, batch_sums):
        for m in self.topk_metrics:
            self._sums[m] += np.asarray(batch_sums[m], dtype=np.float64)
        self._count += float(batch_sums["_count"])
        if "gauc_num" in batch_sums:
            self._gauc_num += float(batch_sums["gauc_num"])
            self._gauc_den += float(batch_sums["gauc_den"])

    def evaluate(self):
        result = {}
        for m in self.topk_metrics:
            means = self._sums[m] / max(self._count, 1.0)
            for k in self.topk:
                result[f"{m}@{k}"] = round(float(means[k - 1]), self.decimals)
        if "gauc" in self.rank_metrics:
            result["gauc"] = round(self._gauc_num / max(self._gauc_den, 1.0),
                                   self.decimals)
        return result


class ValueCollector:
    """Host-side accumulator for individual (value) metrics: AUC/MAE/RMSE/LogLoss.

    The reference stacks all (true, pred) pairs and computes at the end
    (evaluators.py:289-367); we do the same — these eval sets are small relative
    to training and AUC needs a global sort anyway.
    """

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.decimals = config["metric_decimal_place"]
        self.reset()

    def reset(self):
        self._trues = []
        self._preds = []

    def collect(self, trues, preds, mask=None):
        trues = np.asarray(trues).ravel()
        preds = np.asarray(preds).ravel()
        if mask is not None:
            keep = np.asarray(mask).ravel().astype(bool)
            trues, preds = trues[keep], preds[keep]
        self._trues.append(trues)
        self._preds.append(preds)

    def evaluate(self):
        trues = jnp.asarray(np.concatenate(self._trues))
        preds = jnp.asarray(np.concatenate(self._preds))
        result = {}
        for m in self.metrics:
            result[m] = round(float(VALUE_METRIC_FNS[m](trues, preds)), self.decimals)
        return result
