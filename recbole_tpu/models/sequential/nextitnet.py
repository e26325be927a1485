"""NextItNet: dilated causal CNN for next-item recommendation.

Parity target: reference NextItNet
(recbole/model/sequential_recommender/nextitnet.py) — stacked residual blocks
of two dilated causal 1-D convolutions with layer norms; dilations cycle
through config['dilations'] per block.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform, layer_norm
from ..losses import fro_norm, reg_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("NextItNet")
class NextItNet(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "kernel_size": 3, "block_num": 5,
                      "dilations": [1, 4], "reg_weight": 1e-5,
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.kernel_size = config["kernel_size"]
        self.block_num = config["block_num"]
        self.dilations = list(config["dilations"]) * self.block_num
        self.reg_weight = config["reg_weight"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 2 + 2 * len(self.dilations))
        D = self.embedding_size
        convs = []
        for i in range(len(self.dilations)):
            convs.append({
                "w1": xavier_uniform(ks[2 + 2 * i],
                                     (self.kernel_size, D, D)),
                "b1": jnp.zeros(D),
                "w2": xavier_uniform(ks[3 + 2 * i],
                                     (self.kernel_size, D, D)),
                "b2": jnp.zeros(D),
                "ln1_g": jnp.ones(D), "ln1_b": jnp.zeros(D),
                "ln2_g": jnp.ones(D), "ln2_b": jnp.zeros(D),
            })
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "blocks": convs,
            "out_w": xavier_uniform(ks[1], (D, D)),
            "out_b": jnp.zeros(D),
        }

    @staticmethod
    def _causal_conv(x, w, b, dilation):
        """x: (B, L, D); w: (K, D, D). Left-pad so output t sees only <= t."""
        K = w.shape[0]
        pad = (K - 1) * dilation
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        out = jax.lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding="VALID",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        return out + b

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        x = self.embed_seq(params, seq)
        for blk, dil in zip(params["blocks"], self.dilations):
            h = self._causal_conv(x, blk["w1"], blk["b1"], dil)
            h = jax.nn.relu(layer_norm(h, blk["ln1_g"], blk["ln1_b"],
                                       eps=1e-8))
            h = self._causal_conv(h, blk["w2"], blk["b2"], 2 * dil)
            h = jax.nn.relu(layer_norm(h, blk["ln2_g"], blk["ln2_b"],
                                       eps=1e-8))
            x = x + h
        # parity: reference nextitnet.py:87-93 reads the LAST sequence
        # position (sequences are right-padded; the causal stack carries the
        # true items through the zero pad rows), and the final projection has
        # no activation
        last = x[:, -1, :]
        return jnp.dot(last, params["out_w"],
                       preferred_element_type=jnp.float32) + params["out_b"]

    def calculate_loss(self, params, batch, rng=None):
        loss = super().calculate_loss(params, batch, rng)
        # parity: reference nextitnet.py:95-123 — RegLoss over [item table,
        # final layer] plus per-tensor norms of every residual-block param
        # named *weight: the conv kernels AND the LayerNorm gains (torch
        # names LayerNorm's scale 'weight', so the name filter includes it)
        reg = self.reg_weight * (
            reg_loss([params["item_embedding"], params["out_w"]])
            + sum(fro_norm(b["w1"]) + fro_norm(b["w2"])
                  + fro_norm(b["ln1_g"]) + fro_norm(b["ln2_g"])
                  for b in params["blocks"]))
        return loss + reg
