"""AFM: attentional factorization machine.

Parity target: reference AFM (recbole/model/context_aware_recommender/afm.py)
— attention over all field pairs' element-wise products, weighted sum
projected to a scalar, plus the linear term; L2 on the attention weights.
"""

import jax
import jax.numpy as jnp

from ..layers import xavier_normal
from ..losses import bce_loss, fro_norm
from .. import register_model
from .context_base import ContextRecommender


@register_model("AFM")
class AFM(ContextRecommender):
    default_config = {"embedding_size": 10, "attention_size": 25,
                      "dropout_prob": 0.3, "reg_weight": 2}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.attention_size = config["attention_size"]
        self.dropout_prob = config["dropout_prob"]
        self.reg_weight = config["reg_weight"]
        F = self.num_fields
        ii, jj = jnp.triu_indices(F, k=1)
        self.pair_i, self.pair_j = ii, jj

    def init_params(self, rng):
        kc, ka, kh, kp = jax.random.split(rng, 4)
        params = self.init_context_params(kc)
        params["attn_w"] = xavier_normal(ka, (self.embedding_size,
                                              self.attention_size))
        params["attn_h"] = xavier_normal(kh, (self.attention_size,))
        params["p"] = xavier_normal(kp, (self.embedding_size,))
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)  # fused gather
        pairs = emb[:, self.pair_i, :] * emb[:, self.pair_j, :]  # (B, P, D)
        # AttLayer: RELU(x @ w), no bias (reference layers.py:200-222)
        att = jax.nn.relu(jnp.dot(pairs, params["attn_w"],
                                  preferred_element_type=jnp.float32))
        scores = jax.nn.softmax(
            jnp.dot(att, params["attn_h"],
                    preferred_element_type=jnp.float32), axis=1)  # (B, P)
        pooled = jnp.sum(pairs * scores[:, :, None], axis=1)    # (B, D)
        if rng is not None and self.dropout_prob > 0:
            # dropout on the pooled interaction (reference afm.py:94)
            rng, dk = jax.random.split(rng)
            from ..layers import dropout_apply
            pooled = dropout_apply(dk, pooled, self.dropout_prob)
        inter = jnp.dot(pooled, params["p"], preferred_element_type=jnp.float32)
        return linear + inter

    def calculate_loss(self, params, batch, rng=None):
        loss = bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))
        # Frobenius NORM of the attention weight (parity: reference
        # afm.py:109-113, torch.norm(attlayer.w.weight, p=2))
        return loss + self.reg_weight * fro_norm(params["attn_w"])

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
