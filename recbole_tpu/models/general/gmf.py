"""GMF: generalized matrix factorization (fork model).

Parity target: fork GMF (recbole/model/general_recommender/gmf.py:8-60) —
element-wise product of embeddings through a learned linear head, sigmoid+BCE.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init, xavier_uniform
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("GMF")
class GMF(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_dimension": 128, "weight_decay": 1e-8,
                      "valid_metric": "Hit@10"}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_dim = config["embedding_dimension"]

    def init_params(self, rng):
        ku, ki, kw = jax.random.split(rng, 3)
        return {
            "user_embedding": normal_init(ku, (self.n_users, self.embedding_dim)),
            "item_embedding": normal_init(ki, (self.n_items, self.embedding_dim)),
            "w": xavier_uniform(kw, (self.embedding_dim, 1)),
            "b": jnp.zeros(1),
        }

    def _logits(self, params, user, item):
        u = params["user_embedding"][user]
        i = params["item_embedding"][item]
        return (jnp.dot(u * i, params["w"],
                        preferred_element_type=jnp.float32)[:, 0] + params["b"][0])

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        return bce_loss(logits, batch[self.LABEL], batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def full_sort_predict(self, params, batch):
        u = params["user_embedding"][batch[self.USER_ID]]      # (B, D)
        # (u*i)@w == (u*w) @ i^T with w broadcast — one MXU matmul over items
        uw = u * params["w"][:, 0][None, :]
        return jnp.dot(uw, params["item_embedding"].T,
                       preferred_element_type=jnp.float32) + params["b"][0]
