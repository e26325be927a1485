"""NARM: neural attentive session-based recommendation.

Parity target: reference NARM (recbole/model/sequential_recommender/narm.py)
— GRU encoder; global representation = attention over hidden states queried by
the last hidden; session repr = [local; global] through a bilinear B matrix
dotted with item embeddings.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_uniform, \
    dropout_apply
from ..losses import bpr_loss, ce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("NARM")
class NARM(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "hidden_size": 128, "n_layers": 1,
                      "dropout_probs": [0.25, 0.5], "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.n_layers = config["n_layers"]
        self.dropout_probs = list(config["dropout_probs"])
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        D, H = self.embedding_size, self.hidden_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "gru": gru_init(ks[1], D, H, self.n_layers),
            "a1": xavier_uniform(ks[2], (H, H)),
            "a2": xavier_uniform(ks[3], (H, H)),
            "v": xavier_uniform(ks[4], (H, 1)),
            "b": xavier_uniform(jax.random.fold_in(ks[4], 1), (2 * H, D)),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        x = self.embed_seq(params, seq)
        if rng is not None and self.dropout_probs[0] > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.dropout_probs[0])
        h = gru_apply(params["gru"], x)                        # (B, L, H)
        ht = self.gather_last(h, seq_len)                      # local
        valid = (jnp.arange(seq.shape[1])[None, :]
                 < seq_len[:, None]).astype(jnp.float32)
        q = jnp.einsum("blh,hk->blk", h, params["a1"]) \
            + jnp.dot(ht, params["a2"])[:, None, :]
        alpha = jnp.einsum("blk,ko->blo", jax.nn.sigmoid(q),
                           params["v"])[:, :, 0] * valid
        cl = jnp.sum(h * alpha[:, :, None], 1)                 # local
        # order matches reference narm.py:91: [c_local, c_global]
        c = jnp.concatenate([cl, ht], -1)
        if rng is not None and self.dropout_probs[1] > 0:
            rng, dk = jax.random.split(rng)
            c = dropout_apply(dk, c, self.dropout_probs[1])
        return jnp.dot(c, params["b"], preferred_element_type=jnp.float32)

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
