"""Loss functions.

Parity target: recbole/model/loss.py — BPRLoss, RegLoss, EmbLoss, EmbMarginLoss,
plus the fork's soft-cross-entropy family (loss.py:106-166). All take an
optional per-row ``weight`` so fixed-shape padded batches are exact: padding
rows carry weight 0 and means are taken over the weight sum.
"""

import jax
import jax.numpy as jnp


def _wmean(values, weight):
    if weight is None:
        return jnp.mean(values)
    w = weight.astype(values.dtype)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


def bpr_loss(pos_score, neg_score, weight=None, gamma=1e-10):
    """-log sigmoid(pos - neg)  (parity: BPRLoss, loss.py:23)."""
    return _wmean(-jnp.log(gamma + jax.nn.sigmoid(pos_score - neg_score)), weight)


def bce_loss(logits, labels, weight=None):
    """Numerically-stable binary cross entropy on logits."""
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _wmean(loss, weight)


def ce_loss(logits, targets, weight=None):
    """Cross entropy over the item axis; targets are int ids.

    Computed as logsumexp(logits) - logits[target] so the (B, n_items)
    log-softmax matrix never materializes — for CE-over-all-items sequential
    models the logits matmul fuses straight into a row reduction plus one
    gather (the HBM-bandwidth win; the reference materializes full softmax
    via torch CrossEntropyLoss)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    pos = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return _wmean(lse - pos, weight)


def soft_ce_loss(logits, target_dist, weight=None):
    """mean over rows of sum(-target * log_softmax(logits))
    (parity: fork SoftCrossEntropyLoss, loss.py:106)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(target_dist * logp, axis=-1)
    return _wmean(per_row, weight)


def mse_loss(preds, labels, weight=None):
    return _wmean(jnp.square(preds - labels), weight)


def mask_rows(w, *tensors):
    """Zero padded scan rows (weight 0) out of batch representations before
    norm-based regularizers. Returns the tensors unchanged (as a tuple) when
    ``w`` is None."""
    if w is None:
        return tensors
    return tuple(t * w.reshape((-1,) + (1,) * (t.ndim - 1)) for t in tensors)


def fro_norm(t):
    """Frobenius norm of a whole parameter tensor (the reference's
    ``weight.norm(2)`` regularizer form)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(t ** 2), 1e-12))


def emb_loss(*embeddings, norm=2):
    """Sum of per-embedding p-norms over looked-up rows, divided by the LAST
    embedding's batch dim (parity: EmbLoss, loss.py:70-84 — each embedding
    contributes its own torch.norm, not a pooled root)."""
    total = 0.0
    for e in embeddings:
        total = total + jnp.maximum(
            jnp.sum(jnp.abs(e) ** norm), 1e-12) ** (1.0 / norm)
    return total / jnp.maximum(embeddings[-1].shape[0], 1)


def reg_loss(params_list, norm=2):
    """L2 over whole parameter tensors (parity: RegLoss, loss.py:52)."""
    total = 0.0
    for p in params_list:
        total = total + jnp.linalg.norm(p.reshape(-1), ord=norm)
    return total


def emb_margin_loss(*embeddings, power=2):
    """Sum over rows of max(Σ|e|^power − 1, 0) — penalizes rows whose
    power-norm exceeds 1 (parity: EmbMarginLoss, loss.py:85-101)."""
    total = 0.0
    for e in embeddings:
        sq = jnp.sum(e ** power, axis=-1)
        total = total + jnp.sum(jnp.maximum(sq - 1.0, 0.0))
    return total
