"""MKR: multi-task KG-enhanced recommendation with cross-compress units.

Parity target: reference MKR (recbole/model/knowledge_aware_recommender/mkr.py)
— low layers: cross&compress units couple item and entity embeddings; RS head
scores user MLP output against the item vector; KGE head predicts the tail
from [head; relation]. Trained by MKRTrainer: calculate_rs_loss every epoch,
calculate_kg_loss every kge_interval epochs.
"""

import jax
import jax.numpy as jnp

from ..base import KnowledgeRecommender
from ..layers import xavier_normal, mlp_init, mlp_apply
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("MKR")
class MKR(KnowledgeRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_size": 64, "kg_embedding_size": 64,
                      "low_layers_num": 1, "high_layers_num": 1,
                      "reg_weight": 1e-6, "use_inner_product": True,
                      "kge_interval": 3, "dropout_prob": 0.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.L = config["low_layers_num"]
        self.H = config["high_layers_num"]
        self.reg_weight = config["reg_weight"]
        self.use_inner = config["use_inner_product"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 8)
        D = self.embedding_size
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            # entity-sized: the KG pass looks up HEAD ENTITY ids in the item
            # table (parity: reference mkr.py:64-83, Embedding(n_entities))
            "item_embedding": xavier_normal(ks[1], (self.n_entities, D)),
            "entity_embedding": xavier_normal(ks[2], (self.n_entities, D)),
            "relation_embedding": xavier_normal(ks[3], (self.n_relations, D)),
            "user_mlp": mlp_init(ks[4], [D] * (self.L + 1), "xavier_normal"),
            "tail_mlp": mlp_init(ks[5], [D] * (self.L + 1), "xavier_normal"),
            "kge_mlp": mlp_init(ks[6], [2 * D] * self.H + [D], "xavier_normal"),
            "cc": [],
        }
        for i in range(self.L):
            kk = jax.random.fold_in(ks[7], i)
            k1, k2, k3, k4 = jax.random.split(kk, 4)
            params["cc"].append({
                "vv": xavier_normal(k1, (D, 1)), "ev": xavier_normal(k2, (D, 1)),
                "ve": xavier_normal(k3, (D, 1)), "ee": xavier_normal(k4, (D, 1)),
                "bv": jnp.zeros(D), "be": jnp.zeros(D),
            })
        if not self.use_inner:
            params["rs_mlp"] = mlp_init(jax.random.fold_in(rng, 7),
                                        [2 * D] * self.H + [1], "xavier_normal")
        return params

    def _cross_compress(self, params, v, e):
        """v, e: (B, D) -> coupled (B, D) pair (cross&compress unit)."""
        for cc in params["cc"]:
            c = v[:, :, None] * e[:, None, :]                  # (B, D, D)
            ct = c.transpose(0, 2, 1)
            v_out = (jnp.einsum("bij,jo->bi", c, cc["vv"])
                     + jnp.einsum("bij,jo->bi", ct, cc["ev"]) + cc["bv"])
            e_out = (jnp.einsum("bij,jo->bi", c, cc["ve"])
                     + jnp.einsum("bij,jo->bi", ct, cc["ee"]) + cc["be"])
            v, e = v_out, e_out
        return v, e

    def _rs_reprs(self, params, user, item):
        u = mlp_apply(params["user_mlp"],
                      params["user_embedding"][user], act="sigmoid")
        v = params["item_embedding"][item]
        e = params["entity_embedding"][item]
        v, _ = self._cross_compress(params, v, e)
        return u, v

    def _rs_forward(self, params, user, item):
        u, v = self._rs_reprs(params, user, item)
        if self.use_inner:
            return jnp.sum(u * v, -1)
        return mlp_apply(params["rs_mlp"],
                         jnp.concatenate([u, v], -1), act="sigmoid",
                         final_act=False)[:, 0]

    def calculate_rs_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        w = batch.get("_weight")
        u, v = self._rs_reprs(params, user, item)
        if self.use_inner:
            logits = jnp.sum(u * v, -1)
        else:
            logits = mlp_apply(params["rs_mlp"],
                               jnp.concatenate([u, v], -1), act="sigmoid",
                               final_act=False)[:, 0]
        loss = bce_loss(logits, batch[self.LABEL], w)
        # sum-of-squares/2 of the BATCH representations (parity: reference
        # mkr.py:123-145 _l2_loss over forward's user/item embeddings);
        # padded scan rows are masked out via _weight
        if w is not None:
            u = u * w[:, None]
            v = v * w[:, None]
        reg = self.reg_weight * (jnp.sum(u ** 2) + jnp.sum(v ** 2)) / 2.0
        return loss + reg

    calculate_loss = calculate_rs_loss

    def calculate_kg_loss(self, params, batch, rng=None):
        h = batch[self.HEAD_ENTITY_ID]
        r = batch[self.RELATION_ID]
        t = batch[self.TAIL_ENTITY_ID]
        v = params["item_embedding"][h]
        e = params["entity_embedding"][h]
        _, h_e = self._cross_compress(params, v, e)
        r_e = params["relation_embedding"][r]
        t_e = mlp_apply(params["tail_mlp"],
                        params["entity_embedding"][t], act="sigmoid")
        # tail_pred gets its own sigmoid BEFORE the dot (reference
        # mkr.py:113-115)
        pred = jax.nn.sigmoid(mlp_apply(
            params["kge_mlp"], jnp.concatenate([h_e, r_e], -1),
            act="sigmoid", final_act=False))
        w = batch.get("_weight")
        score = jax.nn.sigmoid(jnp.sum(pred * t_e, -1))
        # parity: reference mkr.py:149-170 — loss_kge = Σ_rows(−σ(score)) +
        # B·reg·(Σ h_e²/2 + Σ t_e²/2) over the BATCH head/tail reps (the
        # scalar l2 broadcasts over the row vector before .sum())
        if w is None:
            w = jnp.ones_like(score)
        eff_b = jnp.sum(w)
        h_sq = jnp.sum((h_e * w[:, None]) ** 2)
        t_sq = jnp.sum((t_e * w[:, None]) ** 2)
        return (jnp.sum(-score * w)
                + eff_b * self.reg_weight * (h_sq + t_sq) / 2.0)

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._rs_forward(params, batch[self.USER_ID], batch[self.ITEM_ID]))
