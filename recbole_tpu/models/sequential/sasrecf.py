"""SASRecF: SASRec with item features fused into the attention input.

Parity target: reference SASRecF
(recbole/model/sequential_recommender/sasrecf.py) — item embedding concatenated
with pooled feature embeddings, adapted by a linear layer to hidden size, then
the causal Transformer encoder; scores against the item embedding table.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import (transformer_init, transformer_apply,
                      causal_attention_mask, layer_norm, dropout_apply,
                      normal_init, xavier_normal)
from ...utils.enums import InputType
from .. import register_model
from .feat_embed import ItemFeatEmbedder


@register_model("SASRecF")
class SASRecF(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"n_layers": 2, "n_heads": 2, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.5,
                      "attn_dropout_prob": 0.5, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "selected_features": None, "pooling_mode": "sum",
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
        self.embedder = ItemFeatEmbedder(
            dataset, config["selected_features"], config["pooling_mode"],
            include_item_id=True)

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        D = self.hidden_size
        F = self.embedder.num_fields
        # frozen N(0,1) feature tables (reference keeps them out of the
        # optimizer/state_dict — see ItemFeatEmbedder.init)
        params = {"_const": self.embedder.init(ks[0], D,
                                       frozen_item_id=False)}
        params["item_embedding"] = normal_init(
            ks[1], (self.n_items, D), self.initializer_range).at[0].set(0.0)
        params["position_embedding"] = normal_init(
            ks[2], (self.max_seq_length, D), self.initializer_range)
        params["concat_w"] = xavier_normal(ks[3], (F * D, D))
        params["concat_b"] = jnp.zeros((D,))
        params["encoder"] = transformer_init(ks[4], self.n_layers,
                                             self.n_heads, D, self.inner_size)
        params["ln_g"] = jnp.ones(D)
        params["ln_b"] = jnp.zeros(D)
        return params

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        fused = self.embedder.embed_flat(params, seq)          # (B, L, F*D)
        x = jnp.dot(fused, params["concat_w"],
                    preferred_element_type=jnp.float32) + params["concat_b"]
        x = x + params["position_embedding"][None, :L, :]
        x = layer_norm(x, params["ln_g"], params["ln_b"])
        if rng is not None and self.hidden_dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.hidden_dropout_prob)
        key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]) \
            .astype(jnp.int32)
        h = transformer_apply(
            params["encoder"], x, None, self.n_heads, act=self.hidden_act,
            dropout=self.hidden_dropout_prob if rng is not None else 0.0,
            attn_dropout=self.attn_dropout_prob if rng is not None else 0.0,
            rng=rng, mask_spec=(key_valid, True),
            fused=self.config["fused_attention"])
        return self.gather_last(h, seq_len)
