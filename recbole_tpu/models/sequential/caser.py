"""Caser: convolutional sequence embedding.

Parity target: reference Caser (recbole/model/sequential_recommender/caser.py)
— the last L items as an L x D "image": nh horizontal conv filters per height
1..L (max-pooled over time) + nv vertical filters (weighted sums over time),
concatenated with the user embedding through fc layers. The reference pads
sequences to the FULL max length and convolves all of it; we do the same.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform, dropout_apply
from ..losses import reg_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("Caser")
class Caser(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding", "user_embedding")
    default_config = {"embedding_size": 64, "dropout_prob": 0.4,
                      "reg_weight": 1e-4, "nv": 8, "nh": 16,
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.dropout_prob = config["dropout_prob"]
        self.reg_weight = config["reg_weight"]
        self.nv = config["nv"]
        self.nh = config["nh"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)
        self.heights = list(range(1, self.max_seq_length + 1))

    def init_params(self, rng):
        ks = jax.random.split(rng, 5 + len(self.heights))
        D, L = self.embedding_size, self.max_seq_length
        fc1_in = self.nh * len(self.heights) + self.nv * D
        params = {
            "user_embedding": embedding_init(ks[0], self.n_users, D),
            "item_embedding": embedding_init(ks[1], self.n_items, D),
            "conv_v": xavier_uniform(ks[2], (L, self.nv)),
            "conv_v_b": jnp.zeros(self.nv),
            "conv_h": [xavier_uniform(ks[5 + i], (h, D, self.nh))
                       for i, h in enumerate(self.heights)],
            "conv_h_b": [jnp.zeros(self.nh) for _ in self.heights],
            "fc1_w": xavier_uniform(ks[3], (fc1_in, D)),
            "fc1_b": jnp.zeros(D),
            "fc2_w": xavier_uniform(ks[4], (2 * D, D)),
            "fc2_b": jnp.zeros(D),
        }
        return params

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        E = self.embed_seq(params, seq)                      # (B, L, D)
        # vertical: weighted sums over the time axis
        out_v = jnp.einsum("bld,lv->bvd", E, params["conv_v"],
                           preferred_element_type=jnp.float32) \
            + params["conv_v_b"][None, :, None]                # conv bias
        out_v = out_v.reshape(E.shape[0], -1)                  # (B, nv*D)
        # horizontal: full-width filters of every height, max-pooled over
        # time — real XLA convolutions (an explicit sliding-window stack
        # materializes sum_h (L-h+1)*h*D floats ~ 11.6GB/step at batch 2048
        # and measured SLOWER than the reference's cuDNN path)
        outs_h = []
        for h, w, hb in zip(self.heights, params["conv_h"],
                            params["conv_h_b"]):
            act = jax.nn.relu(jax.lax.conv_general_dilated(
                E, w, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32) + hb)      # (B, T, nh)
            outs_h.append(jnp.max(act, axis=1))                # (B, nh)
        out_h = jnp.concatenate(outs_h, -1)
        x = jnp.concatenate([out_v, out_h], -1)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.dropout_prob)
        z = jax.nn.relu(jnp.dot(x, params["fc1_w"],
                                preferred_element_type=jnp.float32)
                        + params["fc1_b"])
        u = params["user_embedding"][batch[self.USER_ID]]
        out = jax.nn.relu(jnp.dot(jnp.concatenate([z, u], -1), params["fc2_w"],
                                  preferred_element_type=jnp.float32)
                          + params["fc2_b"])
        return out

    def calculate_loss(self, params, batch, rng=None):
        loss = super().calculate_loss(params, batch, rng)
        # Frobenius NORMS of the five tables (parity: reference RegLoss call,
        # caser.py:160-163). The reference's reg_loss_conv_h (caser.py:132-140)
        # multiplies a running zero and contributes nothing, so conv_h is
        # unregularized there too.
        reg = self.reg_weight * reg_loss([
            params["user_embedding"], params["item_embedding"],
            params["conv_v"], params["fc1_w"], params["fc2_w"]])
        return loss + reg
