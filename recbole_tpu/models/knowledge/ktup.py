"""KTUP: translation-based user preference modeling, joint with TransH.

Parity target: reference KTUP (recbole/model/knowledge_aware_recommender/ktup.py)
— user-item scoring through an induced relation ("preference"): a (straight-
through) Gumbel softmax over preferences selects the translation; items and
users are projected onto the preference hyperplane (TransH); joint alternating
training (train_rec_step/train_kg_step = 5/5) with a TransH margin loss.
"""

import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
from ..losses import bpr_loss, emb_margin_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("KTUP")
class KTUP(KnowledgeRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"train_rec_step": 5, "train_kg_step": 5,
                      "embedding_size": 64, "use_st_gumbel": True,
                      "L1_flag": False, "margin": 1.0, "kg_weight": 1.0,
                      "align_weight": 1.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.use_st_gumbel = config["use_st_gumbel"]
        self.L1 = config["L1_flag"]
        self.margin = config["margin"]
        self.kg_weight = config["kg_weight"]
        self.align_weight = config["align_weight"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 6)
        D = self.embedding_size
        return {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            "item_embedding": xavier_normal(ks[1], (self.n_items, D)),
            "entity_embedding": xavier_normal(ks[2], (self.n_entities, D)),
            "relation_embedding": xavier_normal(ks[3], (self.n_relations, D)),
            "relation_norm": xavier_normal(ks[4], (self.n_relations, D)),
            "pref_embedding": xavier_normal(ks[5], (self.n_relations, D)),
            "pref_norm": xavier_normal(jax.random.fold_in(ks[5], 1),
                                       (self.n_relations, D)),
        }

    def _dist(self, x):
        return jnp.sum(jnp.abs(x), -1) if self.L1 else jnp.sum(x ** 2, -1)

    def _preference(self, params, u_e, i_e, rng):
        """Soft (or straight-through) preference over relations."""
        logits = jnp.dot(u_e + i_e,
                         (params["pref_embedding"]
                          + params["relation_embedding"]).T / 2.0,
                         preferred_element_type=jnp.float32)
        if self.use_st_gumbel and rng is not None:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-10,
                                   maxval=1.0) + 1e-10))
            y = jax.nn.softmax(logits + g, -1)
            hard = jax.nn.one_hot(jnp.argmax(y, -1), logits.shape[-1])
            probs = hard + y - jax.lax.stop_gradient(y)
        else:
            probs = jax.nn.softmax(logits, -1)
        pref = jnp.dot(probs, (params["pref_embedding"]
                               + params["relation_embedding"]) / 2.0,
                       preferred_element_type=jnp.float32)
        norm = jnp.dot(probs, (params["pref_norm"]
                               + params["relation_norm"]) / 2.0,
                       preferred_element_type=jnp.float32)
        return pref, norm

    @staticmethod
    def _project(e, norm):
        norm = norm / jnp.maximum(jnp.linalg.norm(norm, axis=-1,
                                                  keepdims=True), 1e-12)
        return e - jnp.sum(e * norm, -1, keepdims=True) * norm

    def _rec_score(self, params, user, item, rng):
        u_e = params["user_embedding"][user]
        i_e = params["item_embedding"][item] + params["entity_embedding"][
            jnp.clip(item, 0, self.n_entities - 1)]
        pref, norm = self._preference(params, u_e, i_e, rng)
        u_p = self._project(u_e, norm)
        i_p = self._project(i_e, norm)
        return -self._dist(u_p + pref - i_p)

    def calculate_loss(self, params, batch, rng=None):
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        pos = self._rec_score(params, batch[self.USER_ID],
                              batch[self.ITEM_ID], r1)
        neg = self._rec_score(params, batch[self.USER_ID],
                              batch[self.NEG_ITEM_ID], r2)
        rec_loss = bpr_loss(pos, neg, batch.get("_weight"))
        # item-entity alignment (items share entity ids; pull them together)
        i = batch[self.ITEM_ID]
        align = jnp.mean(jnp.sum(
            (params["item_embedding"][i]
             - params["entity_embedding"][i]) ** 2, -1))
        return rec_loss, self.align_weight * align

    def calculate_kg_loss(self, params, batch, rng=None):
        h = batch[self.HEAD_ENTITY_ID]
        r = batch[self.RELATION_ID]
        pos_t = batch[self.TAIL_ENTITY_ID]
        neg_t = batch[self.NEG_TAIL_ENTITY_ID]
        norm = params["relation_norm"][r]
        h_e = self._project(params["entity_embedding"][h], norm)
        pt_e = self._project(params["entity_embedding"][pos_t], norm)
        nt_e = self._project(params["entity_embedding"][neg_t], norm)
        r_e = params["relation_embedding"][r]
        pos = self._dist(h_e + r_e - pt_e)
        neg = self._dist(h_e + r_e - nt_e)
        hinge = jnp.maximum(pos - neg + self.margin, 0.0)
        w = batch.get("_weight")
        loss = jnp.mean(hinge) if w is None else \
            jnp.sum(hinge * w) / jnp.maximum(jnp.sum(w), 1.0)
        reg = emb_margin_loss(h_e, r_e, pt_e, nt_e) / jnp.maximum(h.shape[0], 1)
        return self.kg_weight * loss, self.kg_weight * reg

    def predict(self, params, batch):
        return self._rec_score(params, batch[self.USER_ID],
                               batch[self.ITEM_ID], None)

    def score_items(self, params, batch, items):
        B, C = items.shape
        flat = {self.USER_ID: jnp.repeat(batch[self.USER_ID], C),
                self.ITEM_ID: items.reshape(-1)}
        return self.predict(params, flat).reshape(B, C)
