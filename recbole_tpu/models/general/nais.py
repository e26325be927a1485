"""NAIS: neural attentive item similarity.

Parity target: reference NAIS (recbole/model/general_recommender/nais.py) —
FISM with an attention network over history items ('prod' or 'concat'
variants), smoothed softmax with exponent beta.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init, xavier_uniform
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("NAIS")
class NAIS(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"algorithm": "prod", "embedding_size": 64,
                      "weight_size": 64, "split_to": 0,
                      "reg_weights": [1e-7, 1e-7, 1e-5], "alpha": 0,
                      "beta": 0.5, "pretrain_path": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.weight_size = config["weight_size"]
        self.algorithm = config["algorithm"]
        self.reg_weights = config["reg_weights"]
        self.beta = config["beta"]
        if self.algorithm not in ("prod", "concat"):
            raise ValueError("algorithm must be 'prod' or 'concat'")
        hist, hlen = dataset.history_item_matrix()
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D, W = self.embedding_size, self.weight_size
        in_dim = D if self.algorithm == "prod" else 2 * D
        return {
            "item_src_embedding": normal_init(ks[0], (self.n_items, D)),
            "item_dst_embedding": normal_init(ks[1], (self.n_items, D)),
            "item_bias": jnp.zeros(self.n_items),
            "attn_w": xavier_uniform(ks[2], (in_dim, W)),
            "attn_b": jnp.zeros(W),
            "attn_h": xavier_uniform(ks[3], (W,)),
        }

    def _attn_scores(self, params, hist_emb, target_emb, valid):
        """hist_emb: (B, H, D); target_emb: (B, D) -> smoothed softmax (B, H)."""
        if self.algorithm == "prod":
            x = hist_emb * target_emb[:, None, :]
        else:
            x = jnp.concatenate(
                [hist_emb, jnp.broadcast_to(target_emb[:, None, :],
                                            hist_emb.shape)], -1)
        a = jax.nn.relu(jnp.einsum("bhd,dw->bhw", x, params["attn_w"],
                                   preferred_element_type=jnp.float32)
                        + params["attn_b"])
        logits = jnp.einsum("bhw,w->bh", a, params["attn_h"],
                            preferred_element_type=jnp.float32)
        e = jnp.exp(logits) * valid
        denom = jnp.power(jnp.maximum(jnp.sum(e, -1, keepdims=True), 1e-12),
                          self.beta)
        return e / denom

    def _logits(self, params, user, item):
        h = self.hist[user]
        valid = ((jnp.arange(h.shape[1])[None, :] < self.hlen[user][:, None])
                 & (h != item[:, None])).astype(jnp.float32)
        hist_emb = params["item_src_embedding"][h]
        q = params["item_dst_embedding"][item]
        attn = self._attn_scores(params, hist_emb, q, valid)
        sim = jnp.einsum("bhd,bd->bh", hist_emb, q,
                         preferred_element_type=jnp.float32)
        return jnp.sum(attn * sim, -1) + params["item_bias"][item]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        loss = bce_loss(logits, batch[self.LABEL], batch.get("_weight"))
        reg = (self.reg_weights[0] * jnp.sum(params["item_src_embedding"] ** 2)
               + self.reg_weights[1] * jnp.sum(params["item_dst_embedding"] ** 2)
               + self.reg_weights[2] * jnp.sum(params["attn_w"] ** 2))
        return loss + reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))
