"""CKE: Collaborative Knowledge-base Embedding.

Parity target: reference CKE (recbole/model/knowledge_aware_recommender/cke.py)
— item representation = item embedding + linked-entity embedding; BPR rec loss
+ TransR-style BPR kg loss over relation-projected entities + L2 regs.
Trained in RSKG mode: each rec batch carries sampled kg triples + neg tails.
"""

import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal
from ..losses import bpr_loss, emb_loss, mask_rows
from ...utils.enums import InputType
from .. import register_model


@register_model("CKE")
class CKE(KnowledgeRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "kg_embedding_size": 64,
                      "reg_weights": [1e-2, 1e-2]}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.kg_embedding_size = config["kg_embedding_size"]
        self.reg_weights = config["reg_weights"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        return {
            "user_embedding": xavier_normal(ks[0], (self.n_users, self.embedding_size)),
            "item_embedding": xavier_normal(ks[1], (self.n_items, self.embedding_size)),
            "entity_embedding": xavier_normal(ks[2], (self.n_entities, self.embedding_size)),
            "relation_embedding": xavier_normal(ks[3], (self.n_relations, self.kg_embedding_size)),
            # the reference stores trans_w as a 2-D (n_rel, D*Dk) Embedding
            # (cke.py:48) — xavier fans must be computed on THAT shape
            # (std = sqrt(2/(n_rel + D*Dk))), then reshaped
            "trans_w": xavier_normal(
                ks[4], (self.n_relations,
                        self.embedding_size * self.kg_embedding_size)
            ).reshape(self.n_relations, self.embedding_size,
                      self.kg_embedding_size),
        }

    @staticmethod
    def _l2norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    def _kg_embedding(self, params, h, r, pos_t, neg_t):
        w = params["trans_w"][r]                               # (B, D, Dk)
        proj = lambda e: jnp.einsum("bd,bdk->bk", e, w,
                                    preferred_element_type=jnp.float32)
        h_e = self._l2norm(proj(params["entity_embedding"][h]))
        pos_e = self._l2norm(proj(params["entity_embedding"][pos_t]))
        neg_e = self._l2norm(proj(params["entity_embedding"][neg_t]))
        r_e = self._l2norm(params["relation_embedding"][r])
        return h_e, r_e, pos_e, neg_e

    def calculate_loss(self, params, batch, rng=None):
        u = batch[self.USER_ID]
        pos = batch[self.ITEM_ID]
        neg = batch[self.NEG_ITEM_ID]
        w = batch.get("_weight")
        u_e = params["user_embedding"][u]
        pos_e = params["item_embedding"][pos] + params["entity_embedding"][pos]
        neg_e = params["item_embedding"][neg] + params["entity_embedding"][neg]
        rec_loss = bpr_loss(jnp.sum(u_e * pos_e, -1), jnp.sum(u_e * neg_e, -1), w)

        h_e, r_e, pt_e, nt_e = self._kg_embedding(
            params, batch[self.HEAD_ENTITY_ID], batch[self.RELATION_ID],
            batch[self.TAIL_ENTITY_ID], batch[self.NEG_TAIL_ENTITY_ID])
        pos_score = jnp.sum((h_e + r_e - pt_e) ** 2, -1)
        neg_score = jnp.sum((h_e + r_e - nt_e) ** 2, -1)
        kg_loss = bpr_loss(neg_score, pos_score, w)

        reg_loss = (self.reg_weights[0]
                    * emb_loss(*mask_rows(w, u_e, pos_e, neg_e))
                    + self.reg_weights[1]
                    * emb_loss(*mask_rows(w, h_e, r_e, pt_e, nt_e)))
        return rec_loss, kg_loss, reg_loss

    def predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        i = batch[self.ITEM_ID]
        i_e = params["item_embedding"][i] + params["entity_embedding"][i]
        return jnp.sum(u_e * i_e, -1)

    def full_sort_predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        all_e = params["item_embedding"] \
            + params["entity_embedding"][:self.n_items]
        return jnp.dot(u_e, all_e.T, preferred_element_type=jnp.float32)
