"""PNN: product-based neural network.

Parity target: reference PNN (recbole/model/context_aware_recommender/pnn.py)
— linear signal z (flattened embeddings) plus inner- and/or outer-product
signals over field pairs, through an MLP; L2 reg on product weights.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss, reg_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("PNN")
class PNN(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [128, 256, 128],
                      "dropout_prob": 0.0, "reg_weight": 0,
                      "use_inner": True, "use_outer": False}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]
        self.reg_weight = config["reg_weight"]
        self.use_inner = config["use_inner"]
        self.use_outer = config["use_outer"]
        F = self.num_fields
        ii, jj = jnp.triu_indices(F, k=1)
        self.pair_i, self.pair_j = ii, jj
        self.num_pairs = len(ii)
        in_dim = F * self.embedding_size
        if self.use_inner:
            in_dim += self.num_pairs
        if self.use_outer:
            in_dim += self.num_pairs
        self.in_dim = in_dim

    def init_params(self, rng):
        kc, km, ko = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        params["mlp"] = mlp_init(km, [self.in_dim] + self.mlp_hidden,
                                 "xavier_normal")
        params["out_w"] = xavier_normal(ko, (self.mlp_hidden[-1], 1))
        params["out_b"] = jnp.zeros(1)
        return params

    def _logits(self, params, batch, rng=None):
        emb = self.embed_input(params, batch)
        B = emb.shape[0]
        parts = [emb.reshape(B, -1)]
        ei = emb[:, self.pair_i, :]
        ej = emb[:, self.pair_j, :]
        if self.use_inner:
            parts.append(jnp.sum(ei * ej, axis=-1))
        if self.use_outer:
            # reference approximates the outer product by the product of the
            # summed pair embeddings
            parts.append(jnp.sum((ei + ej), axis=-1) ** 2)
        x = jnp.concatenate(parts, axis=-1)
        h = mlp_apply(params["mlp"], x, act="relu",
                      dropout=self.dropout_prob, rng=rng)
        return jnp.dot(h, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    def calculate_loss(self, params, batch, rng=None):
        loss = bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))
        if self.reg_weight:
            # per-tensor Frobenius norms of the MLP weights (parity:
            # reference pnn.py:64-75)
            loss = loss + self.reg_weight * reg_loss(
                [l["w"] for l in params["mlp"]])
        return loss

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
