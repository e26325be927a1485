"""CFKG: Collaborative Filtering with Knowledge Graph (translation-based).

Parity target: reference CFKG (recbole/model/knowledge_aware_recommender/cfkg.py)
— one embedding space for users and entities; a user-item interaction is a
triple (user, [UI-Relation], item). Loss over BOTH streams: rec triples and
kg triples, inner-product (BPR-style) or margin (TransE) variant.
"""

import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
from ..losses import bpr_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("CFKG")
class CFKG(KnowledgeRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "loss_function": "inner_product",
                      "margin": 1.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.loss_function = config["loss_function"]
        self.margin = config["margin"]
        if self.loss_function not in ("inner_product", "transe"):
            raise ValueError("loss_function must be inner_product or transe")

    def init_params(self, rng):
        ks = jax.random.split(rng, 3)
        return {
            "user_embedding": xavier_normal(ks[0], (self.n_users, self.embedding_size)),
            "entity_embedding": xavier_normal(ks[1], (self.n_entities, self.embedding_size)),
            # relations incl. the trailing [UI-Relation]
            "relation_embedding": xavier_normal(ks[2], (self.n_relations, self.embedding_size)),
        }

    def _ui_rel(self, params):
        return params["relation_embedding"][self.n_relations - 1]

    def _score(self, h_e, r_e, t_e):
        if self.loss_function == "inner_product":
            return jnp.sum((h_e + r_e) * t_e, -1)
        return -jnp.sum((h_e + r_e - t_e) ** 2, -1)

    def calculate_loss(self, params, batch, rng=None):
        w = batch.get("_weight")
        # rec triples
        u_e = params["user_embedding"][batch[self.USER_ID]]
        pos_e = params["entity_embedding"][batch[self.ITEM_ID]]
        neg_e = params["entity_embedding"][batch[self.NEG_ITEM_ID]]
        ui = self._ui_rel(params)[None, :]
        rec_loss = self._pair_loss(self._score(u_e, ui, pos_e),
                                   self._score(u_e, ui, neg_e), w)
        # kg triples
        h_e = params["entity_embedding"][batch[self.HEAD_ENTITY_ID]]
        r_e = params["relation_embedding"][batch[self.RELATION_ID]]
        pt_e = params["entity_embedding"][batch[self.TAIL_ENTITY_ID]]
        nt_e = params["entity_embedding"][batch[self.NEG_TAIL_ENTITY_ID]]
        kg_loss = self._pair_loss(self._score(h_e, r_e, pt_e),
                                  self._score(h_e, r_e, nt_e), w)
        return rec_loss, kg_loss

    def _pair_loss(self, pos, neg, w):
        if self.loss_function == "inner_product":
            return bpr_loss(pos, neg, w)
        hinge = jnp.maximum(self.margin - pos + neg, 0.0)
        if w is None:
            return jnp.mean(hinge)
        return jnp.sum(hinge * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        i_e = params["entity_embedding"][batch[self.ITEM_ID]]
        return self._score(u_e, self._ui_rel(params)[None, :], i_e)

    def full_sort_predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]] + \
            self._ui_rel(params)[None, :]
        items = params["entity_embedding"][:self.n_items]
        if self.loss_function == "inner_product":
            return jnp.dot(u_e, items.T, preferred_element_type=jnp.float32)
        d = jnp.sum(u_e ** 2, -1, keepdims=True) \
            - 2 * jnp.dot(u_e, items.T, preferred_element_type=jnp.float32) \
            + jnp.sum(items ** 2, -1)[None, :]
        return -d
