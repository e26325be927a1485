"""SHAN: sequential hierarchical attention network.

Parity target: reference SHAN (recbole/model/sequential_recommender/shan.py)
— long-term attention over the full history queried by the user embedding,
then short-term attention over [long-term repr; last short_item_length items].
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform
from ..losses import fro_norm
from ...utils.enums import InputType
from .. import register_model


@register_model("SHAN")
class SHAN(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "short_item_length": 2,
                      "loss_type": "CE", "reg_weight": [0.01, 0.0001],
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.short_len = config["short_item_length"]
        self.reg_weight = config["reg_weight"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        D = self.embedding_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "user_embedding": embedding_init(ks[1], self.n_users, D),
            "long_w": xavier_uniform(ks[2], (D, D)),
            "long_b": jnp.zeros(D),
            "short_w": xavier_uniform(ks[3], (D, D)),
            "short_b": jnp.zeros(D),
        }

    @staticmethod
    def _attend(x, valid, w, b, query):
        """x: (B, T, D); query: (B, D) -> attention-pooled (B, D)."""
        keys = jax.nn.relu(jnp.einsum("btd,dk->btk", x, w,
                                      preferred_element_type=jnp.float32) + b)
        scores = jnp.einsum("btk,bk->bt", keys, query,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(valid, scores, -1e9)
        alpha = jax.nn.softmax(scores, -1)
        return jnp.sum(x * alpha[:, :, None], 1)

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        emb = self.embed_seq(params, seq)
        valid = jnp.arange(L)[None, :] < seq_len[:, None]
        u = params["user_embedding"][batch[self.USER_ID]]
        long_rep = self._attend(emb, valid, params["long_w"],
                                params["long_b"], u)
        # short window = last short_len items
        offs = jnp.arange(self.short_len)
        idx = jnp.clip(seq_len[:, None] - self.short_len + offs[None, :],
                       0, L - 1)
        s_valid = (seq_len[:, None] - self.short_len + offs[None, :]) >= 0
        short_embs = jnp.take_along_axis(emb, idx[:, :, None].astype(jnp.int32), 1)
        cat = jnp.concatenate([long_rep[:, None, :], short_embs], 1)
        c_valid = jnp.concatenate(
            [jnp.ones((seq.shape[0], 1), bool), s_valid], 1)
        return self._attend(cat, c_valid, params["short_w"],
                            params["short_b"], u)

    def calculate_loss(self, params, batch, rng=None):
        loss = super().calculate_loss(params, batch, rng)
        # parity: reference shan.py:82-90 — reg_1 on the two attention
        # weights' Frobenius norms, reg_2 on the BATCH user / pos-item
        # representations (no batch normalization); padded scan rows are
        # masked out via _weight
        w = batch.get("_weight")
        u_e = params["user_embedding"][batch[self.USER_ID]]
        pos_e = params["item_embedding"][batch[self.POS_ITEM_ID]]
        if w is not None:
            u_e = u_e * w[:, None]
            pos_e = pos_e * w[:, None]
        reg = (self.reg_weight[0] * (fro_norm(params["long_w"])
                                     + fro_norm(params["short_w"]))
               + self.reg_weight[1] * (fro_norm(u_e) + fro_norm(pos_e)))
        return loss + reg
