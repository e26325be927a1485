"""GRU4Rec: session-based recurrent recommendation.

Parity target: reference GRU4Rec (recbole/model/sequential_recommender/gru4rec.py)
— item embedding (+dropout) -> multi-layer GRU -> dense projection; last-position
hidden state scores items. Loss CE over all items (default) or BPR with one
sampled negative.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_uniform, \
    dropout_apply, dot_c
from ..losses import bpr_loss, ce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("GRU4Rec")
class GRU4Rec(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "hidden_size": 128, "num_layers": 1,
                      "dropout_prob": 0.3, "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_layers"]
        self.dropout_prob = config["dropout_prob"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ke, kg, kd = jax.random.split(rng, 3)
        return {
            "item_embedding": embedding_init(ke, self.n_items, self.embedding_size,
                                             "xavier_normal"),
            "gru": gru_init(kg, self.embedding_size, self.hidden_size,
                            self.num_layers),
            "dense_w": xavier_uniform(kd, (self.hidden_size, self.embedding_size)),
            "dense_b": jnp.zeros(self.embedding_size),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        x = self.embed_seq(params, seq)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.dropout_prob)
        h = gru_apply(params["gru"], x, compute_dtype=self.cdt)
        h = dot_c(h, params["dense_w"], self.cdt) + params["dense_b"]
        return self.gather_last(h, seq_len)                    # (B, D)

    def calculate_loss(self, params, batch, rng=None):
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            pos_score = jnp.sum(out * params["item_embedding"][pos], -1)
            neg_score = jnp.sum(out * params["item_embedding"][neg], -1)
            return bpr_loss(pos_score, neg_score, w)
        logits = dot_c(out, params["item_embedding"].T, self.cdt)
        return ce_loss(logits, pos, w)

    def predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.sum(out * params["item_embedding"][batch[self.ITEM_ID]], -1)

    def score_items(self, params, batch, items):
        out = self.forward(params, batch)                      # (B, D)
        cand = params["item_embedding"][items]                 # (B, C, D)
        return jnp.einsum("bd,bcd->bc", out, cand,
                          preferred_element_type=jnp.float32)

    def full_sort_predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.dot(out, params["item_embedding"].T,
                       preferred_element_type=jnp.float32)

    def full_sort_query(self, params, batch):
        """Opt-in for the fused bf16/Pallas eval path (scores are exactly
        forward() . item_embedding^T, matching full_sort_predict above)."""
        return self.forward(params, batch), params["item_embedding"]
