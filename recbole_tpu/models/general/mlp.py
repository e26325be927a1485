"""MLP: neural CF with an MLP tower over user/item embeddings (fork model).

Parity target: fork MLP (recbole/model/general_recommender/mlp.py:8-90) —
'cat' (concat embeddings) or 'mul' (element-wise product) variants, dropout
before each hidden layer, sigmoid + BCE.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init, mlp_init, xavier_uniform, dropout_apply
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("MLP")
class MLP(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_dimension": 50, "weight_decay": 1e-8,
                      "learning_rate": 0.002, "training_neg_sample_num": 8,
                      "train_batch_size": 4096, "dropout": 0.8,
                      "ff_layers": [50, 25], "mlp_variant": "cat"}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_dim = config["embedding_dimension"]
        self.dropout = config["dropout"]
        self.ff_layers = list(config["ff_layers"])
        self.variant = config["mlp_variant"]
        if self.variant not in ("cat", "mul"):
            raise ValueError(f"mlp_variant {self.variant!r} not implemented")
        self.in_dim = self.embedding_dim * (2 if self.variant == "cat" else 1)

    def init_params(self, rng):
        ku, ki, km, ko = jax.random.split(rng, 4)
        return {
            "user_embedding": normal_init(ku, (self.n_users, self.embedding_dim)),
            "item_embedding": normal_init(ki, (self.n_items, self.embedding_dim)),
            "mlp": mlp_init(km, [self.in_dim] + self.ff_layers, "xavier_uniform"),
            "out_w": xavier_uniform(ko, (self.ff_layers[-1], 1)),
            "out_b": jnp.zeros(1),
        }

    def _logits(self, params, user, item, rng=None):
        u = params["user_embedding"][user]
        i = params["item_embedding"][item]
        x = jnp.concatenate([u, i], -1) if self.variant == "cat" else u * i
        for layer in params["mlp"]:
            if rng is not None and self.dropout > 0:
                rng, dk = jax.random.split(rng)
                x = dropout_apply(dk, x, self.dropout)
            x = jax.nn.relu(
                jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
                + layer["b"])
        return jnp.dot(x, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID], rng)
        return bce_loss(logits, batch[self.LABEL], batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))
