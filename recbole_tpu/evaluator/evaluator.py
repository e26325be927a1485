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


class TopKCollector:
    """Host-side accumulator for ranking metrics."""

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = list(config["topk"])
        if any(k <= 0 for k in self.topk):
            raise ValueError("topk must be positive")
        self.max_k = max(self.topk)
        self.decimals = config["metric_decimal_place"]
        self.reset()

    def reset(self):
        self._sums = {m: np.zeros(self.max_k, dtype=np.float64) for m in self.metrics}
        self._count = 0.0

    def collect(self, batch_sums):
        for m in self.metrics:
            self._sums[m] += np.asarray(batch_sums[m], dtype=np.float64)
        self._count += float(batch_sums["_count"])

    def evaluate(self):
        result = {}
        for m in self.metrics:
            means = self._sums[m] / max(self._count, 1.0)
            for k in self.topk:
                result[f"{m}@{k}"] = round(float(means[k - 1]), self.decimals)
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
