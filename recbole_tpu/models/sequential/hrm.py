"""HRM: hierarchical representation model.

Parity target: reference HRM (recbole/model/sequential_recommender/hrm.py)
— layer 1 pools the last `high_order` item embeddings, layer 2 pools that with
the user embedding (max or average at each layer).
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("HRM")
class HRM(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "high_order": 2, "loss_type": "CE",
                      "dropout_prob": 0.2, "pooling_type_layer_1": "max",
                      "pooling_type_layer_2": "max",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.high_order = config["high_order"]
        self.dropout_prob = config["dropout_prob"]
        self.pool1 = config["pooling_type_layer_1"]
        self.pool2 = config["pooling_type_layer_2"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        D = self.embedding_size
        return {"user_embedding": embedding_init(ku, self.n_users, D),
                "item_embedding": embedding_init(ki, self.n_items, D)}

    def _pool(self, x, how, valid=None):
        if how == "max":
            if valid is not None:
                x = jnp.where(valid[..., None], x, -1e9)
            return jnp.max(x, axis=1)
        if valid is not None:
            x = x * valid[..., None]
            return jnp.sum(x, 1) / jnp.maximum(
                jnp.sum(valid, 1, keepdims=True), 1)
        return jnp.mean(x, axis=1)

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        u = params["user_embedding"][batch[self.USER_ID]]
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            u = dropout_apply(dk, u, self.dropout_prob)
        if self.pool1 == "max":
            # last `high_order` positions of the inversed sequence; short
            # sequences include the reference's ZERO pad rows in the max
            # (hrm.py:97-106) — mask to 0, not -inf
            offs = jnp.arange(self.high_order)
            idx = jnp.clip(seq_len[:, None] - self.high_order + offs[None, :],
                           0, L - 1)
            wvalid = (seq_len[:, None] - self.high_order
                      + offs[None, :]) >= 0
            wemb = self.embed_seq(params, jnp.take_along_axis(seq, idx, 1)) \
                * wvalid[..., None]
            hybrid1 = jnp.max(wemb, axis=1)
        else:
            # reference avg (hrm.py:107-113): FULL-sequence sum divided by
            # min(len, high_order)
            denom = jnp.minimum(seq_len, self.high_order).astype(jnp.float32)
            hybrid1 = jnp.sum(self.embed_seq(params, seq), 1) \
                / jnp.maximum(denom, 1.0)[:, None]
        stack = jnp.stack([u, hybrid1], axis=1)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            stack = dropout_apply(dk, stack, self.dropout_prob)
        return self._pool(stack, self.pool2)
