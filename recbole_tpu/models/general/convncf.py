"""ConvNCF: outer-product interaction map + CNN.

Parity target: reference ConvNCF
(recbole/model/general_recommender/convncf.py) — user/item embedding outer
product (D x D map), strided conv stack (CNNLayers, layers.py:828), sum-pooled
channels through a linear head; summed-softplus BPR loss (ConvNCFBPRLoss)
plus two-group L2 regularization.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_normal
from ...utils.enums import InputType
from .. import register_model


@register_model("ConvNCF")
class ConvNCF(GeneralRecommender):
    input_type = InputType.PAIRWISE
    full_sort_fallback = True
    default_config = {"embedding_size": 64, "cnn_channels": [1, 32, 32, 32, 32],
                      "cnn_kernels": [4, 4, 2, 2], "cnn_strides": [4, 4, 2, 2],
                      "dropout_prob": 0.2, "reg_weights": [0.1, 0.1],
                      "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.channels = list(config["cnn_channels"])
        self.kernels = list(config["cnn_kernels"])
        self.strides = list(config["cnn_strides"])
        self.regs = list(config["reg_weights"])

    def init_params(self, rng):
        ks = jax.random.split(rng, 3 + len(self.kernels))
        params = {
            "user_embedding": xavier_normal(
                ks[0], (self.n_users, self.embedding_size)),
            "item_embedding": xavier_normal(
                ks[1], (self.n_items, self.embedding_size)),
            "conv": [],
            "predict_w": xavier_normal(ks[2], (self.channels[-1], 1)),
            "predict_b": jnp.zeros(()),
        }
        for i, (k, s) in enumerate(zip(self.kernels, self.strides)):
            cin, cout = self.channels[i], self.channels[i + 1]
            params["conv"].append({
                "w": xavier_normal(ks[3 + i], (cout, cin, k, k)),
                "b": jnp.zeros((cout,)),
            })
        return params

    def _score(self, params, user, item):
        u = params["user_embedding"][user]                      # (B, D)
        v = params["item_embedding"][item]
        x = (u[:, :, None] * v[:, None, :])[:, None, :, :]      # (B, 1, D, D)
        for layer, s in zip(params["conv"], self.strides):
            x = jax.lax.conv_general_dilated(
                x, layer["w"], window_strides=(s, s), padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            x = jax.nn.relu(x + layer["b"][None, :, None, None])
        pooled = jnp.sum(x, axis=(2, 3))                        # (B, C)
        return jnp.dot(pooled, params["predict_w"])[:, 0] + params["predict_b"]

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        pos = self._score(params, user, batch[self.ITEM_ID])
        neg = self._score(params, user, batch[self.NEG_ITEM_ID])
        w = batch.get("_weight")
        w = jnp.ones_like(pos) if w is None else w
        # summed (not mean) softplus BPR, parity: ConvNCFBPRLoss
        loss = jnp.sum(jnp.logaddexp(0.0, -(pos - neg)) * w)
        r1, r2 = self.regs[:2]
        reg = r1 * (jnp.linalg.norm(params["user_embedding"])
                    + jnp.linalg.norm(params["item_embedding"]))
        for layer in params["conv"]:
            reg = reg + r2 * jnp.linalg.norm(layer["w"].reshape(-1))
        reg = reg + r2 * jnp.linalg.norm(params["predict_w"])
        return loss + reg

    def predict(self, params, batch):
        return self._score(params, batch[self.USER_ID], batch[self.ITEM_ID])

    def score_items(self, params, batch, items):
        B, C = items.shape
        user = jnp.repeat(batch[self.USER_ID], C, axis=0)
        return self._score(params, user, items.reshape(-1)).reshape(B, C)
