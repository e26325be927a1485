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
        if self.use_st_gumbel:
            # straight-through Gumbel softmax (reference ktup.py:98-124);
            # at eval (rng=None) we drop the noise but keep the hard
            # argmax output the reference's ST estimator emits
            if rng is not None:
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(rng, logits.shape, minval=1e-10,
                                       maxval=1.0) + 1e-10))
            else:
                g = 0.0
            y = jax.nn.softmax(logits + g, -1)
            hard = jax.nn.one_hot(jnp.argmax(y, -1), logits.shape[-1])
            probs = hard + y - jax.lax.stop_gradient(y)
        else:
            # parity: reference _get_preferences (ktup.py:126-135) applies NO
            # softmax when use_st_gumbel is off — the raw logits mix the
            # relation/norm tables directly
            probs = logits
        pref = jnp.dot(probs, (params["pref_embedding"]
                               + params["relation_embedding"]) / 2.0,
                       preferred_element_type=jnp.float32)
        norm = jnp.dot(probs, (params["pref_norm"]
                               + params["relation_norm"]) / 2.0,
                       preferred_element_type=jnp.float32)
        return pref, norm

    @staticmethod
    def _project(e, norm):
        # reference _transH_projection (ktup.py:138-140) uses the RAW norm
        # vector — no unit normalization
        return e - jnp.sum(e * norm, -1, keepdims=True) * norm

    @staticmethod
    def _orthogonal(rel, norm, w=None):
        """Σ rows (n·r)² / ‖r‖² (parity: orthogonalLoss, ktup.py:225-230)."""
        val = (jnp.sum(norm * rel, -1) ** 2
               / jnp.maximum(jnp.sum(rel ** 2, -1), 1e-12))
        if w is not None:
            val = val * w
        return jnp.sum(val)

    def _align(self, params, ids, mask):
        """Masked mean item↔entity distance (parity: alignLoss,
        ktup.py:232-236, L1_flag-aware)."""
        d = self._dist(params["item_embedding"][ids]
                       - params["entity_embedding"][ids])
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)

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
        w = batch.get("_weight")
        rec_loss = bpr_loss(pos, neg, w)
        # orthogonality of the FULL preference tables (reference ktup.py:172)
        orth = self._orthogonal(params["pref_embedding"], params["pref_norm"])
        # item-entity alignment over pos AND neg items (reference
        # ktup.py:173-175); padded scan rows masked via _weight
        ids = jnp.concatenate([batch[self.ITEM_ID], batch[self.NEG_ITEM_ID]])
        m = (jnp.ones_like(pos) if w is None else w)
        align = self._align(params, ids, jnp.concatenate([m, m]))
        return rec_loss, orth, self.align_weight * align

    def calculate_kg_loss(self, params, batch, rng=None):
        h = batch[self.HEAD_ENTITY_ID]
        r = batch[self.RELATION_ID]
        pos_t = batch[self.TAIL_ENTITY_ID]
        neg_t = batch[self.NEG_TAIL_ENTITY_ID]
        norm = params["relation_norm"][r]
        h_raw = params["entity_embedding"][h]
        pt_raw = params["entity_embedding"][pos_t]
        nt_raw = params["entity_embedding"][neg_t]
        r_e = params["relation_embedding"][r]
        h_e = self._project(h_raw, norm)
        pt_e = self._project(pt_raw, norm)
        nt_e = self._project(nt_raw, norm)
        pos = self._dist(h_e + r_e - pt_e)
        neg = self._dist(h_e + r_e - nt_e)
        hinge = jnp.maximum(pos - neg + self.margin, 0.0)
        w = batch.get("_weight")
        loss = jnp.mean(hinge) if w is None else \
            jnp.sum(hinge * w) / jnp.maximum(jnp.sum(w), 1.0)
        # parity: reference ktup.py:207-219 — orthogonal on the BATCH
        # relation/norm rows, EmbMarginLoss on the RAW (pre-projection)
        # lookups, both plain sums inside kg_weight; then item-entity
        # alignment over batch entities that are items
        m = jnp.ones_like(hinge) if w is None else w
        orth = self._orthogonal(r_e, norm, m)
        mc = m[:, None]
        reg = emb_margin_loss(h_raw * mc, pt_raw * mc, nt_raw * mc, r_e * mc)
        ent = jnp.concatenate([h, pos_t, neg_t])
        ent_m = jnp.concatenate([m, m, m]) * (ent < self.n_items)
        align = self._align(params, jnp.clip(ent, 0, self.n_items - 1), ent_m)
        return (self.kg_weight * (loss + orth + reg),
                self.align_weight * align)

    def predict(self, params, batch):
        return self._rec_score(params, batch[self.USER_ID],
                               batch[self.ITEM_ID], None)

    def score_items(self, params, batch, items):
        B, C = items.shape
        flat = {self.USER_ID: jnp.repeat(batch[self.USER_ID], C),
                self.ITEM_ID: items.reshape(-1)}
        return self.predict(params, flat).reshape(B, C)
