"""DCN: Deep & Cross Network.

Parity target: reference DCN (recbole/model/context_aware_recommender/dcn.py)
— explicit feature crossing x_{l+1} = x0 * (w_l . x_l) + b_l + x_l in parallel
with an MLP tower; concat -> linear -> sigmoid + BCE (+ L2 on cross weights).
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss, reg_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("DCN")
class DCN(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [256, 256, 256],
                      "cross_layer_num": 6, "reg_weight": 2, "dropout_prob": 0.2}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.cross_layer_num = config["cross_layer_num"]
        self.reg_weight = config["reg_weight"]
        self.dropout_prob = config["dropout_prob"]
        self.in_dim = self.num_fields * self.embedding_size

    def init_params(self, rng):
        ks = jax.random.split(rng, 3 + self.cross_layer_num)
        params = self.init_context_params(ks[0])
        # bn=True matches reference dcn.py:61
        params["mlp"] = mlp_init(ks[1], [self.in_dim] + self.mlp_hidden,
                                 "xavier_normal", bn=True)
        params["cross_w"] = [xavier_normal(ks[2 + i], (self.in_dim,))
                             for i in range(self.cross_layer_num)]
        params["cross_b"] = [jnp.zeros(self.in_dim)
                             for _ in range(self.cross_layer_num)]
        params["out_w"] = xavier_normal(
            ks[-1], (self.in_dim + self.mlp_hidden[-1], 1))
        params["out_b"] = jnp.zeros(1)
        return params

    def _logits(self, params, batch, rng=None):
        x0 = self.embed_input(params, batch).reshape(
            self.batch_len(batch), -1)
        x = x0
        for w, b in zip(params["cross_w"], params["cross_b"]):
            xw = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = x0 * xw[:, None] + b + x
        deep = mlp_apply(params["mlp"], x0, act="relu",
                         dropout=self.dropout_prob, rng=rng,
                         bn_w=batch.get("_weight"))
        joint = jnp.concatenate([x, deep], axis=-1)
        return jnp.dot(joint, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    def calculate_loss(self, params, batch, rng=None):
        loss = bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))
        l2 = reg_loss(params["cross_w"])
        return loss + self.reg_weight * l2

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
