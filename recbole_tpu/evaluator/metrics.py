"""Top-k ranking metrics, vectorized for device execution.

Parity target: reference numpy metric fns (recbole/evaluator/metrics.py:27-355).
Same math, but branch-free (B, K) array programs that run under jit on TPU —
the reference's per-row Python loops (mrr_/map_/ndcg_) are replaced by clipped
gathers and cumulative ops on the VPU.

All top-k fns take:
    pos_index: (B, K) 0/1 — whether the item at rank k is a ground-truth positive
    pos_len:   (B,)   — number of ground-truth positives of each user
and return a (B, K) matrix of the metric at every cutoff 1..K, matching the
reference's all-cutoffs-in-one-pass contract.
"""

import jax.numpy as jnp


def hit_(pos_index, pos_len):
    return (jnp.cumsum(pos_index, axis=1) > 0).astype(jnp.float32)


def mrr_(pos_index, pos_len):
    K = pos_index.shape[1]
    first = jnp.argmax(pos_index, axis=1)                      # (B,)
    has_hit = jnp.take_along_axis(pos_index, first[:, None], 1)[:, 0] > 0
    ranks = jnp.arange(K)[None, :]
    rr = jnp.where((ranks >= first[:, None]) & has_hit[:, None],
                   1.0 / (first[:, None] + 1.0), 0.0)
    return rr.astype(jnp.float32)


def precision_(pos_index, pos_len):
    K = pos_index.shape[1]
    return jnp.cumsum(pos_index, axis=1) / jnp.arange(1, K + 1)[None, :]


def recall_(pos_index, pos_len):
    denom = jnp.maximum(pos_len, 1)[:, None]
    return jnp.cumsum(pos_index, axis=1) / denom


def map_(pos_index, pos_len):
    K = pos_index.shape[1]
    pre = precision_(pos_index, pos_len)
    sum_pre = jnp.cumsum(pre * pos_index, axis=1)
    actual_len = jnp.minimum(pos_len, K)
    # denominator at cutoff k is min(k, actual_len) (reference normalization)
    denom = jnp.minimum(jnp.arange(1, K + 1)[None, :],
                        jnp.maximum(actual_len, 1)[:, None])
    return sum_pre / denom


def ndcg_(pos_index, pos_len):
    K = pos_index.shape[1]
    gains = 1.0 / jnp.log2(jnp.arange(2.0, K + 2.0))           # (K,)
    icum = jnp.cumsum(gains)                                   # ideal DCG prefix
    idcg_len = jnp.clip(jnp.minimum(pos_len, K), 1, K)
    # idcg at cutoff k = icum[min(k, idcg_len) - 1]
    idx = jnp.minimum(jnp.arange(1, K + 1)[None, :], idcg_len[:, None]) - 1
    idcg = icum[idx]
    dcg = jnp.cumsum(pos_index * gains[None, :], axis=1)
    return dcg / idcg


TOPK_METRIC_FNS = {
    "hit": hit_,
    "mrr": mrr_,
    "map": map_,
    "recall": recall_,
    "ndcg": ndcg_,
    "precision": precision_,
}


# ---------------------------------------------------------------- value metrics

def auc_(trues, preds):
    """Pairwise-rank AUC over the full prediction set; ties get average rank
    (parity: reference auc_ / hand-rolled ROC, metrics.py:224)."""
    order = jnp.argsort(preds)
    sorted_true = trues[order]
    sorted_pred = preds[order]
    n = preds.shape[0]
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    # average ranks across ties via segment means over equal-pred runs
    new_grp = jnp.concatenate([jnp.ones(1, bool), sorted_pred[1:] != sorted_pred[:-1]])
    grp_id = jnp.cumsum(new_grp) - 1
    grp_sum = jnp.zeros(n).at[grp_id].add(ranks)
    grp_cnt = jnp.zeros(n).at[grp_id].add(1.0)
    avg_rank = (grp_sum / jnp.maximum(grp_cnt, 1.0))[grp_id]
    n_pos = jnp.sum(sorted_true)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(avg_rank * sorted_true)
    return (rank_sum_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)


def mae_(trues, preds):
    return jnp.mean(jnp.abs(trues - preds))


def rmse_(trues, preds):
    return jnp.sqrt(jnp.mean((trues - preds) ** 2))


def log_loss_(trues, preds):
    eps = 1e-7  # float32-safe (1 - 1e-15 rounds to 1.0 in f32 -> nan)
    p = jnp.clip(preds, eps, 1.0 - eps)
    return -jnp.mean(trues * jnp.log(p) + (1.0 - trues) * jnp.log(1.0 - p))


VALUE_METRIC_FNS = {
    "auc": auc_,
    "mae": mae_,
    "rmse": rmse_,
    "logloss": log_loss_,
}
