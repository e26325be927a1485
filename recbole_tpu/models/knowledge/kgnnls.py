"""KGNN-LS: KGCN with label-smoothness regularization.

Parity target: reference KGNNLS
(recbole/model/knowledge_aware_recommender/kgnnls.py) — the KGCN aggregation
plus a label-smoothness term: the user's interaction labels (1 for train
positives, 0 for a construction-time sample of random user-item pairs, 0.5
unknown) are propagated over the item's sampled multi-hop neighborhood with
user-relation attention weights (kgnnls.py:298-371), holding out the batch
item itself, and the propagated label of the held-out item is scored with a
BCE-with-logits loss against the true label (kgnnls.py:385-401).

The reference keys its interaction table as a python dict of
``user * 10**len(str(n_entities)) + entity`` (kgnnls.py:89-132); here the
same lookup is two padded per-user membership tables (history matrix for
the 1-labels, a sampled matrix for the 0-labels) — static shapes, pure
gathers/compares, no host dict in the hot path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..losses import bce_loss, emb_loss
from .. import register_model
from .kgcn import KGCN


def sample_neg_label_table(users, items, n_users, n_items, seed):
    """Sample as many 0-labeled (user, item) pairs as there are positives,
    rejecting collisions with the positive set, and return them as a padded
    per-user matrix (parity: reference sample_neg_interaction,
    kgnnls.py:113-132 — ids drawn uniformly from the INCLUSIVE ranges
    [0, n_users] x [0, n_items])."""
    rng = np.random.RandomState(seed)
    offset = np.int64(n_items + 1)
    pos = set((users.astype(np.int64) * offset + items).tolist())
    need = len(users)
    got = set()
    while len(got) < need:
        u = rng.randint(0, n_users + 1, size=2 * (need - len(got)))
        i = rng.randint(0, n_items + 1, size=u.shape[0])
        for k in (u.astype(np.int64) * offset + i).tolist():
            if k not in pos and k not in got:
                got.add(k)
                if len(got) == need:
                    break
    keys = np.fromiter(got, np.int64, len(got))
    nu = (keys // offset).astype(np.int64)
    ni = (keys % offset).astype(np.int32)
    order = np.argsort(nu, kind="stable")
    nu, ni = nu[order], ni[order]
    counts = np.bincount(nu, minlength=n_users + 1)
    width = max(int(counts.max()), 1)
    table = np.zeros((n_users + 1, width), np.int32)
    lens = counts.astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for u in np.unique(nu):
        s = starts[u]
        table[u, :counts[u]] = ni[s:s + counts[u]]
    return table, lens


@register_model("KGNNLS")
class KGNNLS(KGCN):
    default_config = {**KGCN.default_config, "ls_weight": 0.5}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.ls_weight = config["ls_weight"]
        hist, hlen = dataset.history_item_matrix()
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)
        users = dataset.inter_feat[dataset.uid_field]
        items = dataset.inter_feat[dataset.iid_field]
        neg_table, neg_lens = sample_neg_label_table(
            users, items, self.n_users, self.n_items,
            config["seed"] or 2020)
        self.neg_hist = self.register_const("neg_hist", neg_table)
        self.neg_len = self.register_const("neg_len", neg_lens)

    def _initial_labels(self, user, ents):
        """Interaction-table lookup for a (B, M) entity block: 1.0 for the
        user's train positives, 0.0 for the sampled negative pairs, 0.5
        unknown (reference lookup_interaction_table, kgnnls.py:317-324)."""
        h = self.hist[user]                                      # (B, H)
        hv = jnp.arange(h.shape[1])[None, :] < self.hlen[user][:, None]
        pos = jnp.any((ents[:, :, None] == h[:, None, :])
                      & hv[:, None, :], -1)
        nh = self.neg_hist[user]
        nv = jnp.arange(nh.shape[1])[None, :] < self.neg_len[user][:, None]
        neg = jnp.any((ents[:, :, None] == nh[:, None, :])
                      & nv[:, None, :], -1)
        return jnp.where(pos, 1.0, jnp.where(neg, 0.0, 0.5))

    def _label_smoothness(self, params, user, item, label, weight):
        """Exact reference label propagation (kgnnls.py:298-371): initial
        labels per hop with the batch item held out at 0.5, labeled entities
        pinned by reset masks, n_iter rounds of attention-weighted neighbor
        label mixing (same ÷D score mean and ÷S neighbor mean as the KGCN
        aggregator), BCE-with-logits on the held-out item's propagated
        label (kgnnls.py:385-401)."""
        D = self.embedding_size
        u_e = params["user_embedding"][user]                     # (B, D)
        entities = [item[:, None]]
        relations = []
        for _ in range(self.n_iter):
            prev = entities[-1]
            entities.append(self.adj_ent[prev].reshape(prev.shape[0], -1))
            relations.append(self.adj_rel[prev].reshape(prev.shape[0], -1))
        labels, resets = [], []
        for ents in entities:
            lbl = self._initial_labels(user, ents)
            holdout = ents != item[:, None]
            resets.append((lbl != 0.5) & holdout)
            labels.append(jnp.where(holdout, lbl, 0.5))
        for it in range(self.n_iter):
            new_labels = []
            for hop in range(self.n_iter - it):
                B, M = labels[hop].shape
                neigh = labels[hop + 1].reshape(B, M, self.S)
                rels = params["relation_embedding"][
                    relations[hop].reshape(B, M, self.S)]
                scores = jax.nn.softmax(
                    jnp.einsum("bd,bmsd->bms", u_e, rels,
                               preferred_element_type=jnp.float32) / D, -1)
                agg = jnp.mean(scores * neigh, -1)               # (B, M)
                new_labels.append(jnp.where(resets[hop], labels[hop], agg))
            labels = new_labels
        pred = labels[0][:, 0]                                   # (B,)
        return bce_loss(pred, label, weight)

    def calculate_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        label = batch[self.LABEL]
        w = batch.get("_weight")
        i_repr = self._item_repr(params, user, item)
        u_e = params["user_embedding"][user]
        logits = jnp.sum(u_e * i_repr, -1)
        loss = bce_loss(logits, label, w)
        ls_loss = self._label_smoothness(params, user, item, label, w)
        # EmbLoss over the BATCH representations (parity: reference
        # kgnnls.py:404-419 l2_loss(user_e, item_e))
        if w is not None:
            u_e = u_e * w[:, None]
            i_repr = i_repr * w[:, None]
        reg = self.reg_weight * emb_loss(u_e, i_repr)
        return loss + self.ls_weight * ls_loss + reg
