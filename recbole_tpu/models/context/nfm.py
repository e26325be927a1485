"""NFM: neural factorization machine.

Parity target: reference NFM (recbole/model/context_aware_recommender/nfm.py)
— bi-interaction pooling 0.5*((sum v)^2 - sum v^2) (a (B, D) vector) fed into
an MLP, plus the linear term.
"""

import jax
import jax.numpy as jnp

from ..layers import bn_apply, mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("NFM")
class NFM(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [64, 64, 64],
                      "dropout_prob": 0.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]

    def init_params(self, rng):
        kc, km, ko = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        # bn=True + standalone BN on the FM vector match reference
        # nfm.py:36-37
        params["mlp"] = mlp_init(km, [self.embedding_size] + self.mlp_hidden,
                                 "xavier_normal", bn=True)
        params["fm_bn_g"] = jnp.ones(self.embedding_size)
        params["fm_bn_b"] = jnp.zeros(self.embedding_size)
        params["out_w"] = xavier_normal(ko, (self.mlp_hidden[-1], 1))
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)
        bi = 0.5 * (jnp.square(jnp.sum(emb, 1)) - jnp.sum(jnp.square(emb), 1))
        w = batch.get("_weight")
        bi = bn_apply(bi, params["fm_bn_g"], params["fm_bn_b"], w=w)
        h = mlp_apply(params["mlp"], bi, act="sigmoid",
                      dropout=self.dropout_prob, rng=rng, bn_w=w)
        deep = jnp.dot(h, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0]
        return linear + deep

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
