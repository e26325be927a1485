"""FISM: factored item similarity model.

Parity target: reference FISM (recbole/model/general_recommender/fism.py) —
score(u, i) = b_u + b_i + |R_u \\ {i}|^-alpha * sum_{j in R_u \\ {i}} <p_j, q_i>,
pointwise BCE. History rows are the device-resident train history matrix.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init
from ..losses import bce_loss, fro_norm as _fro
from ...utils.enums import InputType
from .. import register_model


@register_model("FISM")
class FISM(GeneralRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_src_embedding", "item_dst_embedding")
    input_type = InputType.POINTWISE
    default_config = {"embedding_size": 64, "split_to": 0,
                      "reg_weights": [1e-2, 1e-2], "alpha": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.reg_weights = config["reg_weights"]
        self.alpha = config["alpha"]
        hist, hlen = dataset.history_item_matrix()
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def init_params(self, rng):
        kp, kq = jax.random.split(rng)
        D = self.embedding_size
        return {
            "item_src_embedding": normal_init(kp, (self.n_items, D)),
            "item_dst_embedding": normal_init(kq, (self.n_items, D)),
            "user_bias": jnp.zeros(self.n_users),
            "item_bias": jnp.zeros(self.n_items),
        }

    def _user_repr(self, params, user, exclude_item=None):
        h = self.hist[user]                                    # (B, H)
        valid = (jnp.arange(h.shape[1])[None, :]
                 < self.hlen[user][:, None])
        if exclude_item is not None:
            valid = valid & (h != exclude_item[:, None])
        src = params["item_src_embedding"][h]
        cnt = jnp.sum(valid, -1).astype(jnp.float32)
        repr_ = jnp.sum(src * valid[:, :, None], 1)
        coeff = jnp.power(jnp.maximum(cnt, 1.0), -self.alpha)  # alpha=0 -> 1
        return repr_ * coeff[:, None]

    def _logits(self, params, user, item):
        ur = self._user_repr(params, user, exclude_item=item)
        q = params["item_dst_embedding"][item]
        return (jnp.sum(ur * q, -1) + params["user_bias"][user]
                + params["item_bias"][item])

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        loss = bce_loss(logits, batch[self.LABEL], batch.get("_weight"))
        # Frobenius NORMS of the full tables (parity: reference reg_loss
        # uses weight.norm(2), fism.py:84-95)
        reg = (self.reg_weights[0] * _fro(params["item_src_embedding"])
               + self.reg_weights[1] * _fro(params["item_dst_embedding"]))
        return loss + reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def full_sort_predict(self, params, batch):
        user = batch[self.USER_ID]
        ur = self._user_repr(params, user)                     # no exclusion
        scores = jnp.dot(ur, params["item_dst_embedding"].T,
                         preferred_element_type=jnp.float32)
        return scores + params["user_bias"][user][:, None] \
            + params["item_bias"][None, :]
