"""GRU4RecF: GRU4Rec with parallel item/feature RNN encoders.

Parity target: reference GRU4RecF
(recbole/model/sequential_recommender/gru4recf.py) — two GRUs (item stream,
pooled item-feature stream), outputs concatenated through a dense layer to the
embedding size; scores against the item embedding table.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_normal, \
    dropout_apply
from ...utils.enums import InputType
from .. import register_model
from .feat_embed import ItemFeatEmbedder


@register_model("GRU4RecF")
class GRU4RecF(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "hidden_size": 128,
                      "num_layers": 1, "dropout_prob": 0.3,
                      "selected_features": None, "pooling_mode": "sum",
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_layers"]
        self.dropout_prob = config["dropout_prob"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)
        self.embedder = ItemFeatEmbedder(
            dataset, config["selected_features"], config["pooling_mode"],
            include_item_id=False)
        if self.embedder.num_fields == 0:
            raise ValueError(
                "GRU4RecF needs item side features: add the .item file's "
                "columns to load_col (e.g. load_col: {inter: [...], "
                "item: '*'}) and/or set selected_features")

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        D, H = self.embedding_size, self.hidden_size
        F = max(self.embedder.num_fields, 1)
        # frozen N(0,1) feature tables (reference keeps them out of the
        # optimizer/state_dict — see ItemFeatEmbedder.init)
        params = {"_const": self.embedder.init(ks[0], D)}
        params["item_embedding"] = embedding_init(ks[1], self.n_items, D)
        params["item_gru"] = gru_init(ks[2], D, H, self.num_layers)
        params["feat_gru"] = gru_init(ks[3], F * D, H, self.num_layers)
        params["dense_w"] = xavier_normal(ks[4], (2 * H, D))
        params["dense_b"] = jnp.zeros((D,))
        return params

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        x = self.embed_seq(params, seq)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.dropout_prob)
        item_out = gru_apply(params["item_gru"], x)
        feat = self.embedder.embed_flat(params, seq)       # (B, L, F*D)
        feat_out = gru_apply(params["feat_gru"], feat)
        out = jnp.dot(jnp.concatenate([item_out, feat_out], -1),
                      params["dense_w"],
                      preferred_element_type=jnp.float32) + params["dense_b"]
        return self.gather_last(out, seq_len)
