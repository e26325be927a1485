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
        # reference double-tower keeps ONLY USER/USER_ID-source fields on
        # the user side and ITEM/ITEM_ID-source on the item side;
        # INTERACTION-source fields (e.g. timestamp) are dropped entirely
        # (abstract_recommender.py:176-184)
        user_srcs = (FeatureSource.USER, FeatureSource.USER_ID)
        item_srcs = (FeatureSource.ITEM, FeatureSource.ITEM_ID)
        def side(fields, name_at):
            u, it = [], []
            for i, tup in enumerate(fields):
                src = dataset.field2source[tup[0]]
                if src in user_srcs:
                    u.append(i)
                elif src in item_srcs:
                    it.append(i)
            return u, it
        self.user_tok, self.item_tok = side(self.token_fields, 0)
        self.user_flt, self.item_flt = side(self.float_fields, 0)
        u_seq, i_seq = side(self.token_seq_fields, 0)
        n_tok, n_flt = len(self.token_fields), len(self.float_fields)
        self.user_idx = (self.user_tok + [n_tok + i for i in self.user_flt]
                         + [n_tok + n_flt + i for i in u_seq])
        self.item_idx = (self.item_tok + [n_tok + i for i in self.item_flt]
                         + [n_tok + n_flt + i for i in i_seq])
        if not self.user_idx or not self.item_idx:
            raise ValueError("DSSM needs fields on both the user and item side")

    def init_params(self, rng):
        kc, ku, ki = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        # bn=True towers (reference dssm.py:41-42)
        params["user_mlp"] = mlp_init(
            ku, [len(self.user_idx) * self.embedding_size] + self.mlp_hidden,
            "xavier_normal", bn=True)
        params["item_mlp"] = mlp_init(
            ki, [len(self.item_idx) * self.embedding_size] + self.mlp_hidden,
            "xavier_normal", bn=True)
        return params

    def _logits(self, params, batch, rng=None):
        emb = self.embed_input(params, batch)                  # (B, F, D)
        B = emb.shape[0]
        u = emb[:, jnp.asarray(self.user_idx), :].reshape(B, -1)
        i = emb[:, jnp.asarray(self.item_idx), :].reshape(B, -1)
        ru, ri = (None, None)
        if rng is not None:
            ru, ri = jax.random.split(rng)
        bw = batch.get("_weight")
        uh = mlp_apply(params["user_mlp"], u, act="tanh",
                       dropout=self.dropout_prob, rng=ru, bn_w=bw)
        ih = mlp_apply(params["item_mlp"], i, act="tanh",
                       dropout=self.dropout_prob, rng=ri, bn_w=bw)
        cos = jnp.sum(uh * ih, -1) / (
            jnp.linalg.norm(uh, axis=-1) * jnp.linalg.norm(ih, axis=-1) + 1e-8)
        return cos

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
