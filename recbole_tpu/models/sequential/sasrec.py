"""SASRec: self-attentive sequential recommendation.

Parity target: reference SASRec (recbole/model/sequential_recommender/sasrec.py)
— item + position embeddings, LayerNorm+dropout, causal Transformer encoder
(layers.py:499), last-position output scores items; CE or BPR loss.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import (embedding_init, transformer_init, transformer_apply,
                      causal_attention_mask, layer_norm, dropout_apply,
                      normal_init)
from ..losses import bpr_loss, ce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("SASRec")
class SASRec(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"n_layers": 2, "n_heads": 2, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.5,
                      "attn_dropout_prob": 0.5, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.hidden_size = config["hidden_size"]
        self.inner_size = config["inner_size"]
        self.hidden_dropout_prob = config["hidden_dropout_prob"]
        self.attn_dropout_prob = config["attn_dropout_prob"]
        self.hidden_act = config["hidden_act"]
        self.initializer_range = config["initializer_range"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ki, kp, kt = jax.random.split(rng, 3)
        std = self.initializer_range
        item_emb = normal_init(ki, (self.n_items, self.hidden_size), std)
        return {
            "item_embedding": item_emb.at[0].set(0.0),
            "position_embedding": normal_init(
                kp, (self.max_seq_length, self.hidden_size), std),
            "encoder": transformer_init(kt, self.n_layers, self.n_heads,
                                        self.hidden_size, self.inner_size),
            "ln_g": jnp.ones(self.hidden_size),
            "ln_b": jnp.zeros(self.hidden_size),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        x = self.embed_seq(params, seq) \
            + params["position_embedding"][None, :L, :]
        x = layer_norm(x, params["ln_g"], params["ln_b"])
        if rng is not None and self.hidden_dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.hidden_dropout_prob)
        key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]) \
            .astype(jnp.int32)
        h = transformer_apply(params["encoder"], x, None, self.n_heads,
                              act=self.hidden_act,
                              dropout=self.hidden_dropout_prob if rng is not None else 0.0,
                              attn_dropout=self.attn_dropout_prob if rng is not None else 0.0,
                              rng=rng, compute_dtype=self.cdt,
                              mask_spec=(key_valid, True),
                              fused=self.config["fused_attention"])
        return self.gather_last(h, seq_len)

    def calculate_loss(self, params, batch, rng=None):
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            pos_score = jnp.sum(out * params["item_embedding"][pos], -1)
            neg_score = jnp.sum(out * params["item_embedding"][neg], -1)
            return bpr_loss(pos_score, neg_score, w)
        from ..layers import dot_c
        logits = dot_c(out, params["item_embedding"].T, self.cdt)
        return ce_loss(logits, pos, w)

    def predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.sum(out * params["item_embedding"][batch[self.ITEM_ID]], -1)

    def score_items(self, params, batch, items):
        out = self.forward(params, batch)
        cand = params["item_embedding"][items]
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
