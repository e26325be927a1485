"""KGNN-LS: KGCN with label-smoothness regularization.

Parity target: reference KGNNLS
(recbole/model/knowledge_aware_recommender/kgnnls.py) — the KGCN aggregation
plus a label-smoothness term: the user's interaction labels are propagated
over the item's sampled neighborhood with user-relation edge weights, and the
predicted label of the held-out item is pushed toward its true label.
"""

import jax
import jax.numpy as jnp

from ..losses import bce_loss, emb_loss
from .. import register_model
from .kgcn import KGCN


@register_model("KGNNLS")
class KGNNLS(KGCN):
    default_config = {**KGCN.default_config, "ls_weight": 0.5}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.ls_weight = config["ls_weight"]
        hist, hlen = dataset.history_item_matrix()
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def _label_smoothness(self, params, user, item, label):
        """One round of label propagation over the item's 1-hop sample: the
        held-out item's propagated label should match its true label."""
        u_e = params["user_embedding"][user]                   # (B, D)
        neigh = self.adj_ent[item]                             # (B, S)
        rels = self.adj_rel[item]
        # initial labels of neighbors: 1 if in user's history, else 0.5 (unknown)
        h = self.hist[user]                                    # (B, H)
        valid = jnp.arange(h.shape[1])[None, :] < self.hlen[user][:, None]
        in_hist = jnp.any((neigh[:, :, None] == h[:, None, :])
                          & valid[:, None, :], -1)
        neigh_labels = jnp.where(in_hist, 1.0, 0.5)
        weights = jax.nn.softmax(
            jnp.einsum("bd,bsd->bs", u_e,
                       params["relation_embedding"][rels],
                       preferred_element_type=jnp.float32), -1)
        pred = jnp.sum(weights * neigh_labels, -1)
        return (pred - label) ** 2

    def calculate_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        label = batch[self.LABEL]
        w = batch.get("_weight")
        i_repr = self._item_repr(params, user, item)
        u_e = params["user_embedding"][user]
        logits = jnp.sum(u_e * i_repr, -1)
        loss = bce_loss(logits, label, w)
        ls = self._label_smoothness(params, user, item, label)
        ls_loss = jnp.mean(ls) if w is None else \
            jnp.sum(ls * w) / jnp.maximum(jnp.sum(w), 1.0)
        # EmbLoss over the BATCH representations (parity: reference
        # kgnnls.py:404-419 l2_loss(user_e, item_e))
        if w is not None:
            u_e = u_e * w[:, None]
            i_repr = i_repr * w[:, None]
        reg = self.reg_weight * emb_loss(u_e, i_repr)
        return loss + self.ls_weight * ls_loss + reg
