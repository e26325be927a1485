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

    def calculate_loss(self, params, batch, rng=None):
        # parity: reference line.py:28-33, 129-163 — NegSamplingLoss is
        # -mean(SIGMOID(±score)) (not log-sigmoid), and each batch randomly
        # picks the u-u or i-i context side (random.random() < 0.5); at
        # eval/no-rng we take the u-u branch deterministically
        u = batch[self.USER_ID]
        pos = batch[self.ITEM_ID]
        neg = batch[self.NEG_ITEM_ID]
        w = batch.get("_weight")
        u_e = params["user_embedding"][u]
        pos_e = params["item_embedding"][pos]
        s_pos = jnp.sum(u_e * pos_e, -1)

        def wmean(x):
            if w is None:
                return jnp.mean(x)
            return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

        if rng is not None:
            rng, kb, ku = jax.random.split(rng, 3)
            use_uu = jax.random.bernoulli(kb)
            neg_user = jax.random.randint(ku, u.shape, 1, self.n_users)
        else:
            use_uu = jnp.bool_(True)
            neg_user = u
        # uu branch: negative edge (u, neg_item); ii branch: (neg_user, pos)
        s_neg_uu = jnp.sum(u_e * params["item_embedding"][neg], -1)
        s_neg_ii = jnp.sum(params["user_embedding"][neg_user] * pos_e, -1)
        s_neg = jnp.where(use_uu, s_neg_uu, s_neg_ii)
        total = (wmean(-jax.nn.sigmoid(s_pos))
                 + wmean(-jax.nn.sigmoid(-s_neg)))
        if self.order == 2:
            pc_uu = jnp.sum(u_e * params["item_context"][pos], -1)
            nc_uu = jnp.sum(u_e * params["item_context"][neg], -1)
            pc_ii = jnp.sum(pos_e * params["user_context"][u], -1)
            nc_ii = jnp.sum(pos_e * params["user_context"][neg_user], -1)
            pos_con = jnp.where(use_uu, pc_uu, pc_ii)
            neg_con = jnp.where(use_uu, nc_uu, nc_ii)
            total = total + self.second_w * (
                wmean(-jax.nn.sigmoid(pos_con))
                + wmean(-jax.nn.sigmoid(-neg_con)))
        return total

    def predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        i_e = params["item_embedding"][batch[self.ITEM_ID]]
        return jnp.sum(u_e * i_e, -1)

    def full_sort_predict(self, params, batch):
        u_e = params["user_embedding"][batch[self.USER_ID]]
        return jnp.dot(u_e, params["item_embedding"].T,
                       preferred_element_type=jnp.float32)
