"""NGCF: neural graph collaborative filtering.

Parity target: reference NGCF (recbole/model/general_recommender/ngcf.py) —
per layer: sum-aggregation W1(x + Lx) + element-wise W2(Lx * x), LeakyReLU,
message dropout, L2-normalized layer outputs concatenated. Same COO
segment-sum propagation backbone as LightGCN.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_uniform, dropout_apply
from ..losses import bpr_loss, emb_loss, mask_rows
from ...utils.enums import InputType
from .. import register_model
from .lightgcn import build_norm_adj


@register_model("NGCF")
class NGCF(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "hidden_size_list": [64, 64, 64],
                      "node_dropout": 0.0, "message_dropout": 0.1,
                      "reg_weight": 1e-5}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden = list(config["hidden_size_list"])
        self.message_dropout = config["message_dropout"]
        self.reg_weight = config["reg_weight"]
        from ...ops.graph import BipartiteProp
        self.prop = BipartiteProp(dataset.inter_matrix("csr"),
                                  self.n_users, self.n_items)
        self.scan_epochs_ok = not self.prop.heavy
        self.n_nodes = self.n_users + self.n_items

    def init_params(self, rng):
        ks = jax.random.split(rng, 2 + 2 * len(self.hidden))
        params = {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, self.embedding_size)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, self.embedding_size)),
            "gnn": [],
            "_const": self.prop.init_consts(),
        }
        dims = [self.embedding_size] + self.hidden
        for li in range(len(self.hidden)):
            params["gnn"].append({
                "w1": xavier_uniform(ks[2 + 2 * li], (dims[li], dims[li + 1])),
                "b1": jnp.zeros(dims[li + 1]),
                "w2": xavier_uniform(ks[3 + 2 * li], (dims[li], dims[li + 1])),
                "b2": jnp.zeros(dims[li + 1]),
            })
        return params

    def _spmm(self, params, x):
        return self.prop(params["_const"], x)

    def propagate(self, params, rng=None):
        x = jnp.concatenate([params["user_embedding"],
                             params["item_embedding"]], axis=0)
        outs = [x]
        for layer in params["gnn"]:
            lx = self._spmm(params, x)
            sum_part = jnp.dot(x + lx, layer["w1"],
                               preferred_element_type=jnp.float32) + layer["b1"]
            bi_part = jnp.dot(lx * x, layer["w2"],
                              preferred_element_type=jnp.float32) + layer["b2"]
            # negative_slope 0.2 (reference ngcf.py:139) — jax defaults 0.01
            x = jax.nn.leaky_relu(sum_part + bi_part, negative_slope=0.2)
            if rng is not None and self.message_dropout > 0:
                rng, dk = jax.random.split(rng)
                x = dropout_apply(dk, x, self.message_dropout)
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
            outs.append(x)
        final = jnp.concatenate(outs, axis=-1)
        return final[:self.n_users], final[self.n_users:]

    def calculate_loss(self, params, batch, rng=None):
        ue, ie = self.propagate(params, rng)
        u, pos, neg = (batch[self.USER_ID], batch[self.ITEM_ID],
                       batch[self.NEG_ITEM_ID])
        pos_score = jnp.sum(ue[u] * ie[pos], axis=-1)
        neg_score = jnp.sum(ue[u] * ie[neg], axis=-1)
        w = batch.get("_weight")
        loss = bpr_loss(pos_score, neg_score, w)
        reg = emb_loss(*mask_rows(w, ue[u], ie[pos], ie[neg]))
        return loss + self.reg_weight * reg

    def predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.sum(ue[batch[self.USER_ID]] * ie[batch[self.ITEM_ID]], axis=-1)

    def full_sort_predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.dot(ue[batch[self.USER_ID]], ie.T,
                       preferred_element_type=jnp.float32)
