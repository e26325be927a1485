"""CFKG: Collaborative Filtering with Knowledge Graph (translation-based).

Parity target: reference CFKG (recbole/model/knowledge_aware_recommender/cfkg.py)
— one embedding space for users and entities; a user-item interaction is a
triple (user, [UI-Relation], item). ONE loss over the concatenated rec+kg
triples: softplus inner-product or triplet-margin (TransE) variant.
"""

import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
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
            # n_relations + 1 rows: the EXTRA trailing row is [UI-Relation]
            # (parity: reference cfkg.py:50, Embedding(n_relations + 1))
            "relation_embedding": xavier_normal(
                ks[2], (self.n_relations + 1, self.embedding_size)),
        }

    def _ui_rel(self, params):
        return params["relation_embedding"][self.n_relations]

    def _score(self, h_e, r_e, t_e):
        if self.loss_function == "inner_product":
            return jnp.sum((h_e + r_e) * t_e, -1)
        # transe: NEGATIVE L2 distance (sqrt — reference cfkg.py:84-88)
        return -jnp.sqrt(jnp.maximum(
            jnp.sum((h_e + r_e - t_e) ** 2, -1), 1e-12))

    def calculate_loss(self, params, batch, rng=None):
        # parity: reference cfkg.py:90-109 — rec and kg triples are
        # CONCATENATED and reduced by ONE mean (InnerProductLoss softplus
        # form, or TripletMarginLoss for transe), not two per-stream means
        w = batch.get("_weight")
        u_e = params["user_embedding"][batch[self.USER_ID]]
        pos_e = params["entity_embedding"][batch[self.ITEM_ID]]
        neg_e = params["entity_embedding"][batch[self.NEG_ITEM_ID]]
        ui = jnp.broadcast_to(self._ui_rel(params)[None, :], u_e.shape)
        h_e = params["entity_embedding"][batch[self.HEAD_ENTITY_ID]]
        r_e = params["relation_embedding"][batch[self.RELATION_ID]]
        pt_e = params["entity_embedding"][batch[self.TAIL_ENTITY_ID]]
        nt_e = params["entity_embedding"][batch[self.NEG_TAIL_ENTITY_ID]]
        anchor = jnp.concatenate([u_e + ui, h_e + r_e])
        pos_t = jnp.concatenate([pos_e, pt_e])
        neg_t = jnp.concatenate([neg_e, nt_e])
        if self.loss_function == "inner_product":
            pos_s = jnp.sum(anchor * pos_t, -1)
            neg_s = jnp.sum(anchor * neg_t, -1)
            per = jax.nn.softplus(-pos_s) + jax.nn.softplus(neg_s)
        else:
            d_pos = jnp.sqrt(jnp.maximum(
                jnp.sum((anchor - pos_t) ** 2, -1), 1e-12))
            d_neg = jnp.sqrt(jnp.maximum(
                jnp.sum((anchor - neg_t) ** 2, -1), 1e-12))
            per = jnp.maximum(d_pos - d_neg + self.margin, 0.0)
        if w is None:
            return jnp.mean(per)
        w2 = jnp.concatenate([w, w])
        return jnp.sum(per * w2) / jnp.maximum(jnp.sum(w2), 1.0)

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
        return -jnp.sqrt(jnp.maximum(d, 1e-12))
