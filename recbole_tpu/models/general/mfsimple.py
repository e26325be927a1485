"""MFSimple: biased matrix factorization with BCE (fork model).

Parity target: fork MFSimple (recbole/model/general_recommender/mfsimple.py:8-64)
— normal(0.01) embeddings, user/item/global biases, sigmoid + BCE pointwise.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("MFSimple")
class MFSimple(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_dimension": 128, "weight_decay": 1e-8,
                      "learning_rate": 0.002, "training_neg_sample_num": 8,
                      "epochs": 256}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_dim = config["embedding_dimension"]

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_embedding": normal_init(ku, (self.n_users, self.embedding_dim)),
            "item_embedding": normal_init(ki, (self.n_items, self.embedding_dim)),
            "user_bias": jnp.zeros(self.n_users),
            "item_bias": jnp.zeros(self.n_items),
            "bias": jnp.zeros(1),
        }

    def _logits(self, params, user, item):
        u = params["user_embedding"][user]
        i = params["item_embedding"][item]
        return (jnp.sum(u * i, axis=-1) + params["user_bias"][user]
                + params["item_bias"][item] + params["bias"][0])

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        return bce_loss(logits, batch[self.LABEL], batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def full_sort_predict(self, params, batch):
        u = params["user_embedding"][batch[self.USER_ID]]
        ub = params["user_bias"][batch[self.USER_ID]]
        scores = jnp.dot(u, params["item_embedding"].T,
                         preferred_element_type=jnp.float32)
        return scores + ub[:, None] + params["item_bias"][None, :] + params["bias"][0]
