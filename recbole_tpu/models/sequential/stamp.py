"""STAMP: short-term attention/memory priority model.

Parity target: reference STAMP (recbole/model/sequential_recommender/stamp.py)
— attention over the sequence with the last click and the mean memory as
queries; two tanh towers multiplied, dotted with item embeddings.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform
from ..losses import bpr_loss, ce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("STAMP")
class STAMP(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 7)
        D = self.embedding_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "w1": xavier_uniform(ks[1], (D, D)),
            "w2": xavier_uniform(ks[2], (D, D)),
            "w3": xavier_uniform(ks[3], (D, D)),
            "w0": xavier_uniform(ks[4], (D, 1)),
            "ba": jnp.zeros(D),
            "mlp_a": xavier_uniform(ks[5], (D, D)),
            "mlp_a_b": jnp.zeros(D),
            "mlp_b": xavier_uniform(ks[6], (D, D)),
            "mlp_b_b": jnp.zeros(D),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        emb = self.embed_seq(params, seq)                    # (B, L, D)
        valid = (jnp.arange(seq.shape[1])[None, :]
                 < seq_len[:, None]).astype(jnp.float32)
        last = self.gather_last(emb, seq_len)                  # (B, D)
        ms = jnp.sum(emb * valid[:, :, None], 1) / jnp.maximum(
            seq_len[:, None], 1)                               # (B, D)
        q = (jnp.einsum("bld,dk->blk", emb, params["w1"])
             + jnp.dot(last, params["w2"])[:, None, :]
             + jnp.dot(ms, params["w3"])[:, None, :] + params["ba"])
        alpha = jnp.einsum("blk,ko->blo", jax.nn.sigmoid(q),
                           params["w0"])[:, :, 0] * valid      # (B, L)
        ma = jnp.sum(emb * alpha[:, :, None], 1) + ms
        hs = jnp.tanh(jnp.dot(ma, params["mlp_a"],
                              preferred_element_type=jnp.float32)
                      + params["mlp_a_b"])
        ht = jnp.tanh(jnp.dot(last, params["mlp_b"],
                              preferred_element_type=jnp.float32)
                      + params["mlp_b_b"])
        return hs * ht

    def calculate_loss(self, params, batch, rng=None):
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            return bpr_loss(jnp.sum(out * params["item_embedding"][pos], -1),
                            jnp.sum(out * params["item_embedding"][neg], -1), w)
        logits = jnp.dot(out, params["item_embedding"].T,
                         preferred_element_type=jnp.float32)
        return ce_loss(logits, pos, w)

    def predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.sum(out * params["item_embedding"][batch[self.ITEM_ID]], -1)

    def score_items(self, params, batch, items):
        out = self.forward(params, batch)
        return jnp.einsum("bd,bcd->bc", out, params["item_embedding"][items],
                          preferred_element_type=jnp.float32)

    def full_sort_predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.dot(out, params["item_embedding"].T,
                       preferred_element_type=jnp.float32)
