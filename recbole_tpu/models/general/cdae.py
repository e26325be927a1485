"""CDAE: collaborative denoising autoencoder.

Parity target: reference CDAE (recbole/model/general_recommender/cdae.py) —
per-user: h = act(W^T corrupt(y_u) + V_u + b); out = W' h + b'; BCE or MSE;
L1/L2 regularization. User-batch training like MultiVAE.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_normal, embedding_init, activation, dropout_apply
from ..losses import fro_norm
from ...utils.enums import InputType
from .. import register_model


@register_model("CDAE")
class CDAE(GeneralRecommender):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"loss_type": "BCE", "hid_activation": "relu",
                      "out_activation": "sigmoid", "corruption_ratio": 0.5,
                      "embedding_size": 64, "reg_weight_1": 0.0,
                      "reg_weight_2": 0.01, "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.loss_type = config["loss_type"]
        self.hid_act = config["hid_activation"]
        self.corruption = config["corruption_ratio"]
        self.reg_1 = config["reg_weight_1"]
        self.reg_2 = config["reg_weight_2"]
        self.init_history(dataset)

    def init_params(self, rng):
        ks = jax.random.split(rng, 3)
        D = self.embedding_size
        return {
            "enc_w": xavier_normal(ks[0], (self.n_items, D)),
            "enc_b": jnp.zeros(D),
            "user_embedding": embedding_init(ks[1], self.n_users, D),
            "dec_w": xavier_normal(ks[2], (D, self.n_items)),
            "dec_b": jnp.zeros(self.n_items),
        }


    def _forward(self, params, user, x):
        h = jnp.dot(x, params["enc_w"], preferred_element_type=jnp.float32) \
            + params["user_embedding"][user] + params["enc_b"]
        h = activation(self.hid_act)(h)
        return jnp.dot(h, params["dec_w"],
                       preferred_element_type=jnp.float32) + params["dec_b"]

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        x_in = x
        if rng is not None and self.corruption > 0:
            rng, dk = jax.random.split(rng)
            x_in = dropout_apply(dk, x, self.corruption)
        logits = self._forward(params, user, x_in)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        if self.loss_type == "MSE":
            per = jnp.sum((jax.nn.sigmoid(logits) - x) ** 2, -1)
        else:
            per = jnp.sum(jnp.maximum(logits, 0) - logits * x
                          + jnp.log1p(jnp.exp(-jnp.abs(logits))), -1)
        # sum reduction + L1/L2 NORMS of h_user (user embedding) and h_item
        # (the input projection) — parity: reference cdae.py:97-115
        loss = jnp.sum(per * w)
        h_user, h_item = params["user_embedding"], params["enc_w"]
        reg = self.reg_1 * (jnp.sum(jnp.abs(h_user))
                            + jnp.sum(jnp.abs(h_item))) \
            + self.reg_2 * (fro_norm(h_user) + fro_norm(h_item))
        return loss + reg

    def predict(self, params, batch):
        user = batch[self.USER_ID]
        logits = self._forward(params, user, self._rating_matrix(user))
        return jnp.take_along_axis(logits, batch[self.ITEM_ID][:, None], 1)[:, 0]

    def full_sort_predict(self, params, batch):
        user = batch[self.USER_ID]
        return self._forward(params, user, self._rating_matrix(user))
