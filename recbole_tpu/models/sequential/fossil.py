"""FOSSIL: fusing similarity models with Markov chains.

Parity target: reference FOSSIL (recbole/model/sequential_recommender/fossil.py)
— FISM-style similarity over the whole history (weighted by inverse length^alpha)
plus high-order Markov terms over the last `order_len` items with learned
global + per-user weights.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init
from ..losses import fro_norm
from ...utils.enums import InputType
from .. import register_model


@register_model("FOSSIL")
class FOSSIL(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "loss_type": "CE",
                      "reg_weight": 0.0, "order_len": 3, "alpha": 0.6,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.reg_weight = config["reg_weight"]
        self.order_len = config["order_len"]
        self.alpha = config["alpha"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D = self.embedding_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "user_lambda": jnp.zeros((self.n_users, self.order_len)),
            "global_lambda": jnp.zeros((self.order_len,)),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        emb = self.embed_seq(params, seq)
        valid = (jnp.arange(L)[None, :] < seq_len[:, None]).astype(jnp.float32)
        # FISM part: inverse-length^alpha weighted sum of history
        decay = jnp.power(jnp.maximum(seq_len.astype(jnp.float32), 1.0),
                          -self.alpha)[:, None]
        fism = jnp.sum(emb * valid[:, :, None], 1) * decay
        # high-order Markov part over last order_len items
        offs = jnp.arange(self.order_len)
        idx = jnp.clip(seq_len[:, None] - self.order_len + offs[None, :],
                       0, L - 1)
        w_ok = ((seq_len[:, None] - self.order_len + offs[None, :]) >= 0) \
            .astype(jnp.float32)
        last_embs = jnp.take_along_axis(
            emb, idx[:, :, None].astype(jnp.int32), 1)         # (B, O, D)
        lam = params["global_lambda"][None, :] \
            + params["user_lambda"][batch[self.USER_ID]]
        markov = jnp.sum(last_embs * (lam * w_ok)[:, :, None], 1)
        return fism + markov

    def calculate_loss(self, params, batch, rng=None):
        loss = super().calculate_loss(params, batch, rng)
        # Frobenius norms of the BATCH reps (parity: reference fossil.py:89-94,
        # reg_loss(user_lambda, pos_items_emb, seq_output)); padded scan rows
        # are masked out via _weight. forward() is recomputed — XLA CSEs the
        # duplicate against the super() call under jit.
        w = batch.get("_weight")
        lam = params["user_lambda"][batch[self.USER_ID]]
        pos_e = params["item_embedding"][batch[self.POS_ITEM_ID]]
        seq_out = self.forward(params, batch, rng)
        if w is not None:
            lam = lam * w[:, None]
            pos_e = pos_e * w[:, None]
            seq_out = seq_out * w[:, None]
        reg = self.reg_weight * (fro_norm(lam) + fro_norm(pos_e)
                                 + fro_norm(seq_out))
        return loss + reg
