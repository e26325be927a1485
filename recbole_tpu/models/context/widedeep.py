"""WideDeep: wide linear + deep MLP.

Parity target: reference WideDeep
(recbole/model/context_aware_recommender/widedeep.py) — y = first_order +
MLP(flatten(emb)), sigmoid + BCE.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("WideDeep")
class WideDeep(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [32, 16, 8],
                      "dropout_prob": 0.1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]

    def init_params(self, rng):
        kc, km, ko = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        in_dim = self.num_fields * self.embedding_size
        params["mlp"] = mlp_init(km, [in_dim] + self.mlp_hidden, "xavier_normal")
        params["out_w"] = xavier_normal(ko, (self.mlp_hidden[-1], 1))
        params["out_b"] = jnp.zeros(1)
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)
        h = mlp_apply(params["mlp"], emb.reshape(emb.shape[0], -1),
                      act="relu", dropout=self.dropout_prob, rng=rng)
        deep = jnp.dot(h, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]
        return linear + deep

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
