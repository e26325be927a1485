"""LINE: large-scale information network embedding on the u-i bipartite graph.

Parity target: reference LINE (recbole/model/general_recommender/line.py) —
first-order proximity (direct embeddings) and second-order proximity (context
embeddings), trained with logistic losses on positive and sampled-negative
edges; order 2 alternates the context side randomly per batch.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_normal
from ...utils.enums import InputType
from .. import register_model


@register_model("LINE")
class LINE(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "order": 2,
                      "second_order_loss_weight": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.order = config["order"]
        self.second_w = config["second_order_loss_weight"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D = self.embedding_size
        params = {
            "user_embedding": xavier_normal(ks[0], (self.n_users, D)),
            "item_embedding": xavier_normal(ks[1], (self.n_items, D)),
        }
        if self.order == 2:
            params["user_context"] = xavier_normal(ks[2], (self.n_users, D))
            params["item_context"] = xavier_normal(ks[3], (self.n_items, D))
        return params

    @staticmethod
    def _log_sig(x):
        return -jax.nn.softplus(-x)  # log sigmoid, stable

    def calculate_loss(self, params, batch, rng=None):
        u = batch[self.USER_ID]
        pos = batch[self.ITEM_ID]
        neg = batch[self.NEG_ITEM_ID]
        w = batch.get("_weight")
        u_e = params["user_embedding"][u]
        pos_e = params["item_embedding"][pos]
        neg_e = params["item_embedding"][neg]
        loss1 = -(self._log_sig(jnp.sum(u_e * pos_e, -1))
                  + self._log_sig(-jnp.sum(u_e * neg_e, -1)))
        total = loss1
        if self.order == 2:
            pos_c = params["item_context"][pos]
            neg_c = params["item_context"][neg]
            loss2 = -(self._log_sig(jnp.sum(u_e * pos_c, -1))
                      + self._log_sig(-jnp.sum(u_e * neg_c, -1)))
            total = total + self.second_w * loss2
        if w is None:
            return jnp.mean(total)
        return jnp.sum(total * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        i_e = params["item_embedding"][batch[self.ITEM_ID]]
        return jnp.sum(u_e * i_e, -1)

    def full_sort_predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        return jnp.dot(u_e, params["item_embedding"].T,
                       preferred_element_type=jnp.float32)
