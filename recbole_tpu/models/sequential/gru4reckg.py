"""GRU4RecKG: GRU4Rec with a parallel KG-entity-embedding RNN.

Parity target: reference GRU4RecKG
(recbole/model/sequential_recommender/gru4reckg.py) — two GRUs over the item
stream: one on learned item embeddings, one on (optionally frozen) pretrained
entity embeddings of the same items (preload_weight 'ent_id', rows 0..n_items
= linked entities); outputs concatenated through a dense layer. Falls back to
random entity embeddings with a warning when no preload weights are given.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_normal, \
    dropout_apply
from ...utils.enums import InputType
from ...utils.logger import get_logger
from .. import register_model


@register_model("GRU4RecKG")
class GRU4RecKG(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding", "entity_embedding")
    default_config = {"embedding_size": 64, "hidden_size": 128,
                      "num_layers": 1, "dropout_prob": 0.1,
                      "freeze_kg": True, "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_layers"]
        self.dropout_prob = config["dropout_prob"]
        self.freeze_kg = config["freeze_kg"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)
        self.pretrained_entity = None
        try:
            w = dataset.get_preload_weight("ent_id")
            if w.shape[1] != self.embedding_size:
                raise ValueError(
                    f"preloaded ent_id dim {w.shape[1]} != embedding_size "
                    f"{self.embedding_size}")
            self.pretrained_entity = jnp.asarray(w[:self.n_items])
        except ValueError as e:
            if "dim" in str(e):
                raise
            get_logger().warning(
                "GRU4RecKG: no preloaded entity embeddings (preload_weight "
                "ent_id); initializing randomly")

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        D, H = self.embedding_size, self.hidden_size
        ent = (self.pretrained_entity if self.pretrained_entity is not None
               else embedding_init(ks[1], self.n_items, D))
        if ent.shape[0] < self.n_items:
            ent = jnp.concatenate(
                [ent, jnp.zeros((self.n_items - ent.shape[0], D))], axis=0)
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "entity_embedding": ent,
            "item_gru": gru_init(ks[2], D, H, self.num_layers),
            "entity_gru": gru_init(ks[3], D, H, self.num_layers),
            "dense_w": xavier_normal(ks[4], (2 * H, D)),
            "dense_b": jnp.zeros((D,)),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        x = self.embed_seq(params, seq)
        ent_table = params["entity_embedding"]
        if self.freeze_kg:
            ent_table = jax.lax.stop_gradient(ent_table)
        e = ent_table[seq]
        if rng is not None and self.dropout_prob > 0:
            rng, k1, k2 = jax.random.split(rng, 3)
            x = dropout_apply(k1, x, self.dropout_prob)
            e = dropout_apply(k2, e, self.dropout_prob)
        item_out = gru_apply(params["item_gru"], x)
        ent_out = gru_apply(params["entity_gru"], e)
        out = jnp.dot(jnp.concatenate([item_out, ent_out], -1),
                      params["dense_w"],
                      preferred_element_type=jnp.float32) + params["dense_b"]
        return self.gather_last(out, seq_len)
