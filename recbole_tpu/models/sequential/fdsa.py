"""FDSA: feature-level deeper self-attention.

Parity target: reference FDSA (recbole/model/sequential_recommender/fdsa.py)
— two causal Transformer branches: one over item embeddings, one over a
vanilla-attention fusion of the per-position feature embeddings
(VanillaAttention, layers.py:312); last hidden states concatenated through a
linear layer; scores against the item embedding table.
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


@register_model("FDSA")
class FDSA(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"n_layers": 2, "n_heads": 2, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.5,
                      "attn_dropout_prob": 0.5, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "selected_features": None, "pooling_mode": "mean",
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
            include_item_id=False)
        if self.embedder.num_fields == 0:
            raise ValueError(
                "FDSA needs item side features: add the .item file's "
                "columns to load_col (e.g. load_col: {inter: [...], "
                "item: '*'}) and/or set selected_features")

    def init_params(self, rng):
        ks = jax.random.split(rng, 8)
        D = self.hidden_size
        # frozen N(0,1) feature tables (reference keeps them out of the
        # optimizer/state_dict — see ItemFeatEmbedder.init)
        params = {"_const": self.embedder.init(ks[0], D,
                                       frozen_item_id=False)}
        params["item_embedding"] = normal_init(
            ks[1], (self.n_items, D), self.initializer_range).at[0].set(0.0)
        params["position_embedding"] = normal_init(
            ks[2], (self.max_seq_length, D), self.initializer_range)
        params["item_encoder"] = transformer_init(
            ks[3], self.n_layers, self.n_heads, D, self.inner_size)
        params["feat_encoder"] = transformer_init(
            ks[4], self.n_layers, self.n_heads, D, self.inner_size)
        # vanilla attention over feature fields
        params["va_w1"] = xavier_normal(ks[5], (D, D))
        params["va_b1"] = jnp.zeros((D,))
        params["va_w2"] = xavier_normal(ks[6], (D, 1))
        params["concat_w"] = xavier_normal(ks[7], (2 * D, D))
        params["concat_b"] = jnp.zeros((D,))
        params["ln_g"] = jnp.ones(D)
        params["ln_b"] = jnp.zeros(D)
        return params

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        pos = params["position_embedding"][None, :L, :]

        item_x = self.embed_seq(params, seq) + pos
        item_x = layer_norm(item_x, params["ln_g"], params["ln_b"])

        feats = self.embedder.embed(params, seq)               # (B, L, F, D)
        energy = jnp.dot(jax.nn.relu(
            jnp.dot(feats, params["va_w1"]) + params["va_b1"]),
            params["va_w2"])[..., 0]                           # (B, L, F)
        weight = jax.nn.softmax(energy, axis=-1)
        feat_x = jnp.sum(feats * weight[..., None], axis=-2) + pos
        feat_x = layer_norm(feat_x, params["ln_g"], params["ln_b"])

        if rng is not None and self.hidden_dropout_prob > 0:
            rng, k1, k2 = jax.random.split(rng, 3)
            item_x = dropout_apply(k1, item_x, self.hidden_dropout_prob)
            feat_x = dropout_apply(k2, feat_x, self.hidden_dropout_prob)

        key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]) \
            .astype(jnp.int32)
        dp = self.hidden_dropout_prob if rng is not None else 0.0
        adp = self.attn_dropout_prob if rng is not None else 0.0
        fused = self.config["fused_attention"]
        item_h = transformer_apply(params["item_encoder"], item_x, None,
                                   self.n_heads, act=self.hidden_act,
                                   dropout=dp, attn_dropout=adp, rng=rng,
                                   mask_spec=(key_valid, True), fused=fused)
        feat_h = transformer_apply(params["feat_encoder"], feat_x, None,
                                   self.n_heads, act=self.hidden_act,
                                   dropout=dp, attn_dropout=adp, rng=rng,
                                   mask_spec=(key_valid, True), fused=fused)
        both = jnp.concatenate([self.gather_last(item_h, seq_len),
                                self.gather_last(feat_h, seq_len)], axis=-1)
        out = jnp.dot(both, params["concat_w"],
                      preferred_element_type=jnp.float32) + params["concat_b"]
        # shared LayerNorm + dropout after the concat layer (fdsa.py:174-178)
        out = layer_norm(out, params["ln_g"], params["ln_b"])
        if rng is not None and self.hidden_dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            out = dropout_apply(dk, out, self.hidden_dropout_prob)
        return out
