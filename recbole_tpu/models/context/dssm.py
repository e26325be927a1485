"""DSSM: deep structured semantic model (double tower).

Parity target: reference DSSM (recbole/model/context_aware_recommender/dssm.py)
— user-side and item-side field embeddings through separate MLP towers,
cosine similarity as the logit.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply
from ..losses import bce_loss
from ...utils.enums import FeatureSource
from .. import register_model
from .context_base import ContextRecommender


@register_model("DSSM")
class DSSM(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [256, 256, 256],
                      "dropout_prob": 0.3, "double_tower": True}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]
        # split token/float field indices into user-side vs item-side
        user_srcs = (FeatureSource.USER, FeatureSource.USER_ID)
        self.user_tok = [i for i, (f, _, _) in enumerate(self.token_fields)
                         if dataset.field2source[f] in user_srcs]
        self.item_tok = [i for i in range(len(self.token_fields))
                         if i not in self.user_tok]
        self.user_flt = [i for i, (f, _) in enumerate(self.float_fields)
                         if dataset.field2source[f] in user_srcs]
        self.item_flt = [i for i in range(len(self.float_fields))
                         if i not in self.user_flt]
        n_tok, n_flt = len(self.token_fields), len(self.float_fields)
        self.user_idx = self.user_tok + [n_tok + i for i in self.user_flt]
        self.item_idx = self.item_tok + [n_tok + i for i in self.item_flt] + \
            list(range(n_tok + n_flt, self.num_fields))  # seq fields -> item side
        if not self.user_idx or not self.item_idx:
            raise ValueError("DSSM needs fields on both the user and item side")

    def init_params(self, rng):
        kc, ku, ki = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        params["user_mlp"] = mlp_init(
            ku, [len(self.user_idx) * self.embedding_size] + self.mlp_hidden,
            "xavier_normal")
        params["item_mlp"] = mlp_init(
            ki, [len(self.item_idx) * self.embedding_size] + self.mlp_hidden,
            "xavier_normal")
        return params

    def _logits(self, params, batch, rng=None):
        emb = self.embed_input(params, batch)                  # (B, F, D)
        B = emb.shape[0]
        u = emb[:, jnp.asarray(self.user_idx), :].reshape(B, -1)
        i = emb[:, jnp.asarray(self.item_idx), :].reshape(B, -1)
        ru, ri = (None, None)
        if rng is not None:
            ru, ri = jax.random.split(rng)
        uh = mlp_apply(params["user_mlp"], u, act="tanh",
                       dropout=self.dropout_prob, rng=ru)
        ih = mlp_apply(params["item_mlp"], i, act="tanh",
                       dropout=self.dropout_prob, rng=ri)
        cos = jnp.sum(uh * ih, -1) / (
            jnp.linalg.norm(uh, axis=-1) * jnp.linalg.norm(ih, axis=-1) + 1e-8)
        return cos

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
